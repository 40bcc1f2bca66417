"""Grid R-CNN grid head
(ref: mmdet/models/roi_heads/mask_heads/grid_head.py:10-359).

Predicts per-grid-point heatmaps with first/second-order neighbor fusion,
then localizes boxes by heatmap-peak voting (Grid R-CNN Plus half-size
sub-region targets).

TPU-native departures:
- NHWC; grouped transposed convs are expressed as lhs-dilated convs with
  ``feature_group_count`` (exact transposed-conv math, XLA-friendly).
- target "circle painting" is evaluated analytically on the static
  sub-region grid instead of a per-pixel python loop.
- peak extraction/voting in get_bboxes is fully batched/static.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ....registry import HEADS, LOSSES, build_from_cfg
from ...layers import ConvModule, GroupNorm, Module


class GroupedDeconv2d(Module):
    """Transposed conv (k, s, p, groups) as an lhs-dilated conv."""

    def __init__(self, in_channels, out_channels, kernel_size, stride=2,
                 padding=1, groups=1, init_std=0.001, bias_value=0.0):
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.k = kernel_size
        self.s = stride
        self.p = padding
        self.g = groups
        self.init_std = init_std
        self.bias_value = bias_value

    def init(self, key):
        w = jax.random.normal(
            key, (self.k, self.k, self.in_channels // self.g,
                  self.out_channels)) * self.init_std
        return {'weight': w,
                'bias': jnp.full((self.out_channels,), self.bias_value,
                                 jnp.float32)}

    def __call__(self, params, x):
        w = jnp.flip(params['weight'].astype(x.dtype), (0, 1))
        pad = self.k - 1 - self.p
        y = jax.lax.conv_general_dilated(
            x, w, window_strides=(1, 1), padding=[(pad, pad), (pad, pad)],
            lhs_dilation=(self.s, self.s),
            dimension_numbers=jax.lax.conv_dimension_numbers(
                x.shape, w.shape, ('NHWC', 'HWIO', 'NHWC')),
            feature_group_count=self.g)
        return y + params['bias'].astype(y.dtype)


class DWTrans(Module):
    """5x5 depthwise + 1x1 transition (ref: grid_head.py:114-135)."""

    def __init__(self, channels):
        from ...layers import Conv2d
        self.dw = Conv2d(channels, channels, 5, padding=2, groups=channels,
                         weight_init='kaiming_fan_out')
        self.pw = Conv2d(channels, channels, 1, weight_init='kaiming_fan_out')

    def init(self, key):
        k1, k2 = jax.random.split(key)
        return {'0': self.dw.init(k1), '1': self.pw.init(k2)}

    def __call__(self, params, x):
        return self.pw(params['1'], self.dw(params['0'], x))


@HEADS.register_module()
class GridHead(Module):
    def __init__(self, grid_points=9, num_convs=8, roi_feat_size=14,
                 in_channels=256, conv_kernel_size=3,
                 point_feat_channels=64, deconv_kernel_size=4,
                 class_agnostic=False, loss_grid=None, conv_cfg=None,
                 norm_cfg=None):
        self.grid_points = grid_points
        self.num_convs = num_convs
        self.roi_feat_size = roi_feat_size
        self.in_channels = in_channels
        self.conv_kernel_size = conv_kernel_size
        self.point_feat_channels = point_feat_channels
        self.conv_out_channels = point_feat_channels * grid_points
        self.class_agnostic = class_agnostic
        self.norm_cfg = norm_cfg or dict(type='GN', num_groups=36)
        self.grid_size = int(np.sqrt(grid_points))
        assert self.grid_size ** 2 == grid_points
        self.whole_map_size = roi_feat_size * 4
        self.sub_regions = self.calc_sub_regions()

        self.convs = []
        for i in range(num_convs):
            cin = in_channels if i == 0 else self.conv_out_channels
            stride = 2 if i == 0 else 1
            self.convs.append(ConvModule(
                cin, self.conv_out_channels, conv_kernel_size,
                stride=stride, padding=(conv_kernel_size - 1) // 2,
                norm_cfg=self.norm_cfg, act_cfg='relu', bias=True,
                weight_init='kaiming_fan_out'))
        self.deconv1 = GroupedDeconv2d(
            self.conv_out_channels, self.conv_out_channels,
            deconv_kernel_size, stride=2,
            padding=(deconv_kernel_size - 2) // 2, groups=grid_points)
        self.norm1 = GroupNorm(grid_points, self.conv_out_channels)
        self.deconv2 = GroupedDeconv2d(
            self.conv_out_channels, grid_points, deconv_kernel_size,
            stride=2, padding=(deconv_kernel_size - 2) // 2,
            groups=grid_points,
            bias_value=-math.log(0.99 / 0.01))

        # 4-neighborhood (ref: grid_head.py:89-104). NOTE the reference
        # indexes i as column, j as row.
        self.neighbor_points = []
        gs = self.grid_size
        for i in range(gs):
            for j in range(gs):
                neighbors = []
                if i > 0:
                    neighbors.append((i - 1) * gs + j)
                if j > 0:
                    neighbors.append(i * gs + j - 1)
                if j < gs - 1:
                    neighbors.append(i * gs + j + 1)
                if i < gs - 1:
                    neighbors.append((i + 1) * gs + j)
                self.neighbor_points.append(tuple(neighbors))
        self.forder_trans = [[DWTrans(point_feat_channels) for _ in pts]
                             for pts in self.neighbor_points]
        self.sorder_trans = [[DWTrans(point_feat_channels) for _ in pts]
                             for pts in self.neighbor_points]
        self.loss_grid = build_from_cfg(loss_grid or dict(
            type='CrossEntropyLoss', use_sigmoid=True, loss_weight=15),
            LOSSES)

    def init(self, key):
        n_trans = 2 * sum(len(p) for p in self.neighbor_points)
        keys = jax.random.split(key, self.num_convs + 3 + n_trans + 1)
        it = iter(keys)
        p = {'convs': {str(i): m.init(next(it))
                       for i, m in enumerate(self.convs)},
             'deconv1': self.deconv1.init(next(it)),
             'norm1': self.norm1.init(next(it)),
             'deconv2': self.deconv2.init(next(it)),
             'forder_trans': {}, 'sorder_trans': {}}
        for i, mods in enumerate(self.forder_trans):
            p['forder_trans'][str(i)] = {str(j): m.init(next(it))
                                         for j, m in enumerate(mods)}
        for i, mods in enumerate(self.sorder_trans):
            p['sorder_trans'][str(i)] = {str(j): m.init(next(it))
                                         for j, m in enumerate(mods)}
        return p

    def __call__(self, params, x, training=True):
        """x: (R, roi, roi, Cin) -> dict(fused, unfused) heatmaps
        (R, half, half, grid_points)."""
        assert x.shape[1] == x.shape[2] == self.roi_feat_size
        for i, m in enumerate(self.convs):
            x = m(params['convs'][str(i)], x)
        c = self.point_feat_channels
        xs = [x[..., i * c:(i + 1) * c] for i in range(self.grid_points)]
        x_fo = []
        for i, points in enumerate(self.neighbor_points):
            acc = xs[i]
            for j, pidx in enumerate(points):
                acc = acc + self.forder_trans[i][j](
                    params['forder_trans'][str(i)][str(j)], xs[pidx])
            x_fo.append(acc)
        x_so = []
        for i, points in enumerate(self.neighbor_points):
            acc = xs[i]
            for j, pidx in enumerate(points):
                acc = acc + self.sorder_trans[i][j](
                    params['sorder_trans'][str(i)][str(j)], x_fo[pidx])
            x_so.append(acc)

        def decode(feat):
            y = self.deconv1(params['deconv1'], feat)
            y = jax.nn.relu(self.norm1(params['norm1'], y))
            return self.deconv2(params['deconv2'], y)

        fused = decode(jnp.concatenate(x_so, -1))
        unfused = decode(x) if training else fused
        return dict(fused=fused, unfused=unfused)

    def calc_sub_regions(self):
        """(ref: grid_head.py:189-218)."""
        half_size = self.whole_map_size // 4 * 2
        sub_regions = []
        for i in range(self.grid_points):
            x_idx = i // self.grid_size
            y_idx = i % self.grid_size
            if x_idx == 0:
                sub_x1 = 0
            elif x_idx == self.grid_size - 1:
                sub_x1 = half_size
            else:
                sub_x1 = max(int((x_idx / (self.grid_size - 1) - 0.25)
                                 * self.whole_map_size), 0)
            if y_idx == 0:
                sub_y1 = 0
            elif y_idx == self.grid_size - 1:
                sub_y1 = half_size
            else:
                sub_y1 = max(int((y_idx / (self.grid_size - 1) - 0.25)
                                 * self.whole_map_size), 0)
            sub_regions.append(
                (sub_x1, sub_y1, sub_x1 + half_size, sub_y1 + half_size))
        return sub_regions

    def get_targets(self, pos_bboxes, pos_gt_bboxes, pos_radius=1):
        """Static heatmap targets (ref: grid_head.py:220-286).

        Args:
            pos_bboxes / pos_gt_bboxes: (R, 4) (sampled positives, any
                invalid rows produce all-zero targets via the small-box
                guard).
        Returns:
            (R, half, half, grid_points) float targets.
        """
        half = self.whole_map_size // 4 * 2
        ms = self.whole_map_size
        x1 = pos_bboxes[:, 0] - (pos_bboxes[:, 2] - pos_bboxes[:, 0]) / 2
        y1 = pos_bboxes[:, 1] - (pos_bboxes[:, 3] - pos_bboxes[:, 1]) / 2
        x2 = pos_bboxes[:, 2] + (pos_bboxes[:, 2] - pos_bboxes[:, 0]) / 2
        y2 = pos_bboxes[:, 3] + (pos_bboxes[:, 3] - pos_bboxes[:, 1]) / 2
        ws = x2 - x1
        hs = y2 - y1
        ok = (ws > self.grid_size) & (hs > self.grid_size)

        targets = []
        for j in range(self.grid_points):
            fx = 1 - (j // self.grid_size) / (self.grid_size - 1)
            fy = 1 - (j % self.grid_size) / (self.grid_size - 1)
            gx = fx * pos_gt_bboxes[:, 0] + (1 - fx) * pos_gt_bboxes[:, 2]
            gy = fy * pos_gt_bboxes[:, 1] + (1 - fy) * pos_gt_bboxes[:, 3]
            # int() truncation in the reference == floor for >= 0
            cx = jnp.floor((gx - x1) / jnp.maximum(ws, 1e-6) * ms)
            cy = jnp.floor((gy - y1) / jnp.maximum(hs, 1e-6) * ms)
            sub_x1, sub_y1 = self.sub_regions[j][:2]
            xi = jnp.arange(half, dtype=jnp.float32) + sub_x1
            yi = jnp.arange(half, dtype=jnp.float32) + sub_y1
            d2 = ((xi[None, None, :] - cx[:, None, None]) ** 2
                  + (yi[None, :, None] - cy[:, None, None]) ** 2)
            inside = ((xi[None, None, :] >= 0) & (xi[None, None, :] < ms)
                      & (yi[None, :, None] >= 0) & (yi[None, :, None] < ms))
            tgt = (d2 <= pos_radius ** 2) & inside & ok[:, None, None]
            targets.append(tgt.astype(jnp.float32))
        return jnp.stack(targets, -1)

    def loss(self, grid_pred, grid_targets, valid=None):
        """(ref: grid_head.py:288-292). ``valid``: (R,) slot mask."""
        r = grid_targets.shape[0]
        flat_t = grid_targets.reshape(r, -1)
        w = None
        avg = None
        if valid is not None:
            w = jnp.broadcast_to(valid[:, None].astype(jnp.float32),
                                 flat_t.shape)
            avg = jnp.maximum(valid.sum(), 1) * flat_t.shape[1]
        loss_fused = self.loss_grid(
            grid_pred['fused'].reshape(r, -1), flat_t, w, avg_factor=avg)
        loss_unfused = self.loss_grid(
            grid_pred['unfused'].reshape(r, -1), flat_t, w, avg_factor=avg)
        return dict(loss_grid=loss_fused + loss_unfused)

    def get_bboxes(self, det_bboxes, grid_pred, img_shape):
        """Heatmap-peak voting refinement (ref: grid_head.py:294-359).

        Args:
            det_bboxes: (R, 5); grid_pred: (R, half, half, grid_points)
            fused logits; img_shape: (2,) (h, w).
        Returns:
            refined (R, 5).
        """
        R = det_bboxes.shape[0]
        half = self.whole_map_size // 4 * 2
        probs = jax.nn.sigmoid(grid_pred.astype(jnp.float32))
        flat = probs.transpose(0, 3, 1, 2).reshape(R, self.grid_points, -1)
        scores = flat.max(-1)                               # (R, P)
        pos = flat.argmax(-1)
        xs = (pos % half).astype(jnp.float32)
        ys = (pos // half).astype(jnp.float32)
        sub_x1 = jnp.asarray([r[0] for r in self.sub_regions], jnp.float32)
        sub_y1 = jnp.asarray([r[1] for r in self.sub_regions], jnp.float32)
        xs = xs + sub_x1[None]
        ys = ys + sub_y1[None]

        widths = det_bboxes[:, 2] - det_bboxes[:, 0]
        heights = det_bboxes[:, 3] - det_bboxes[:, 1]
        ex1 = det_bboxes[:, 0] - widths / 2
        ey1 = det_bboxes[:, 1] - heights / 2
        abs_xs = (xs + 0.5) / self.whole_map_size * (widths * 2)[:, None] \
            + ex1[:, None]
        abs_ys = (ys + 0.5) / self.whole_map_size * (heights * 2)[:, None] \
            + ey1[:, None]

        gs = self.grid_size
        x1i = np.arange(gs)
        y1i = np.arange(gs) * gs
        x2i = self.grid_points - gs + np.arange(gs)
        y2i = (np.arange(gs) + 1) * gs - 1

        def vote(vals, inds):
            s = scores[:, inds]
            return (vals[:, inds] * s).sum(1) / jnp.maximum(
                s.sum(1), 1e-6)

        bx1 = jnp.clip(vote(abs_xs, x1i), 0, img_shape[1])
        by1 = jnp.clip(vote(abs_ys, y1i), 0, img_shape[0])
        bx2 = jnp.clip(vote(abs_xs, x2i), 0, img_shape[1])
        by2 = jnp.clip(vote(abs_ys, y2i), 0, img_shape[0])
        return jnp.stack([bx1, by1, bx2, by2, det_bboxes[:, 4]], -1)
