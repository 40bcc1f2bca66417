"""Deformable RoI pooling (DPooling)
(ref: mmdet/ops/dcn/deform_pool.py:82-260 and the CUDA kernel
src/cuda/deform_pool_cuda_kernel.cu:72-140).

Exact kernel semantics in jnp: rounded roi bounds shifted -0.5, bins
sampled on a ``sample_per_part`` sub-grid with out-of-image samples
dropped from the average, per-part (dx, dy) offsets scaled by
``trans_std * roi size``, and channel groups via ``group_size``.

The Pack variants predict offsets (and a modulation mask) from a first
no-offset pooling pass through small FC stacks, as in the reference.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..layers import Linear, Module


def deform_roi_pooling(data, rois, offset, spatial_scale, out_size,
                       out_channels, no_trans, group_size=1, part_size=None,
                       sample_per_part=4, trans_std=.0):
    """NHWC deformable RoI pooling.

    Args:
        data: (B, H, W, C).
        rois: (R, 5) [batch_idx, x1, y1, x2, y2].
        offset: (R, 2, part, part) or None.
    Returns:
        (R, oh, ow, out_channels)
    """
    oh, ow = (out_size, out_size) if isinstance(out_size, int) else out_size
    part = oh if part_size is None else part_size
    b, h, w, c = data.shape
    n = rois.shape[0]
    sp = sample_per_part

    batch_idx = rois[:, 0].astype(jnp.int32)
    x1 = jnp.round(rois[:, 1]) * spatial_scale - 0.5
    y1 = jnp.round(rois[:, 2]) * spatial_scale - 0.5
    x2 = (jnp.round(rois[:, 3]) + 1.0) * spatial_scale - 0.5
    y2 = (jnp.round(rois[:, 4]) + 1.0) * spatial_scale - 0.5
    roi_w = jnp.maximum(x2 - x1, 0.1)
    roi_h = jnp.maximum(y2 - y1, 0.1)
    bin_w = roi_w / ow
    bin_h = roi_h / oh
    sub_w = bin_w / sp
    sub_h = bin_h / sp

    ph = jnp.arange(oh)
    pw = jnp.arange(ow)
    part_h = jnp.floor(ph / oh * part).astype(jnp.int32)        # (oh,)
    part_w = jnp.floor(pw / ow * part).astype(jnp.int32)
    if no_trans or offset is None:
        tx = jnp.zeros((n, oh, ow))
        ty = jnp.zeros((n, oh, ow))
    else:
        tx = offset[:, 0][:, part_h][:, :, part_w] * trans_std  # (R, oh, ow)
        ty = offset[:, 1][:, part_h][:, :, part_w] * trans_std

    # bin start + per-sample coordinates: (R, oh, ow, sp)
    wstart = pw[None, None, :] * bin_w[:, None, None] \
        + x1[:, None, None] + tx * roi_w[:, None, None]
    hstart = ph[None, :, None] * bin_h[:, None, None] \
        + y1[:, None, None] + ty * roi_h[:, None, None]
    ws = wstart[..., None] + jnp.arange(sp) * sub_w[:, None, None, None]
    hs = hstart[..., None] + jnp.arange(sp) * sub_h[:, None, None, None]

    valid_w = (ws >= -0.5) & (ws <= w - 0.5)                    # (R,oh,ow,sp)
    valid_h = (hs >= -0.5) & (hs <= h - 0.5)
    wc = jnp.clip(ws, 0.0, w - 1.0)
    hc = jnp.clip(hs, 0.0, h - 1.0)

    x0 = jnp.floor(wc).astype(jnp.int32)
    y0 = jnp.floor(hc).astype(jnp.int32)
    x1i = jnp.minimum(x0 + 1, w - 1)
    y1i = jnp.minimum(y0 + 1, h - 1)
    wx1 = wc - x0
    wy1 = hc - y0

    # gather per roi: feat (R, H, W, C)
    feat = data[batch_idx]

    def gather(feat_r, yy, xx):
        # yy (oh,ow,sp), xx (oh,ow,sp) -> (oh,ow,sp,sp,C) via outer product
        return feat_r[yy[:, :, :, None], xx[:, :, None, :]]

    v00 = jax.vmap(gather)(feat, y0, x0)
    v01 = jax.vmap(gather)(feat, y0, x1i)
    v10 = jax.vmap(gather)(feat, y1i, x0)
    v11 = jax.vmap(gather)(feat, y1i, x1i)
    wy1e = wy1[:, :, :, :, None, None]
    wx1e = wx1[:, :, :, None, :, None]
    val = (v00 * (1 - wy1e) * (1 - wx1e) + v01 * (1 - wy1e) * wx1e
           + v10 * wy1e * (1 - wx1e) + v11 * wy1e * wx1e)
    mask = (valid_h[:, :, :, :, None] & valid_w[:, :, :, None, :])
    maskf = mask[..., None].astype(val.dtype)
    s = (val * maskf).sum(axis=(3, 4))
    cnt = maskf.sum(axis=(3, 4))
    out = jnp.where(cnt > 0, s / jnp.maximum(cnt, 1.0), 0.0)

    if group_size > 1:
        # channel c of output bin (ph, pw) reads input channel
        # (c*gs + gh)*gs + gw (position-sensitive grouping)
        gh = jnp.clip((ph * group_size) // oh, 0, group_size - 1)
        gw = jnp.clip((pw * group_size) // ow, 0, group_size - 1)
        co = jnp.arange(out_channels)
        chan = (co[None, None, :] * group_size
                + gh[:, None, None]) * group_size + gw[None, :, None]
        out = jnp.take_along_axis(
            out, jnp.broadcast_to(chan[None], (n, oh, ow, out_channels)),
            axis=-1)
    return out


class DeformRoIPooling(Module):
    def __init__(self, spatial_scale, out_size, out_channels, no_trans,
                 group_size=1, part_size=None, sample_per_part=4,
                 trans_std=.0):
        self.spatial_scale = spatial_scale
        self.out_size = (out_size, out_size) if isinstance(out_size, int) \
            else out_size
        self.out_channels = out_channels
        self.no_trans = no_trans
        self.group_size = group_size
        self.part_size = self.out_size[0] if part_size is None else part_size
        self.sample_per_part = sample_per_part
        self.trans_std = trans_std

    def init(self, key):
        return {}

    def pool(self, data, rois, offset, no_trans=None):
        return deform_roi_pooling(
            data, rois, offset, self.spatial_scale, self.out_size,
            self.out_channels,
            self.no_trans if no_trans is None else no_trans,
            self.group_size, self.part_size, self.sample_per_part,
            self.trans_std)

    def __call__(self, params, data, rois, offset=None):
        return self.pool(data, rois, offset)


class DeformRoIPoolingPack(DeformRoIPooling):
    """(ref: deform_pool.py:113-175)."""

    def __init__(self, spatial_scale, out_size, out_channels, no_trans,
                 group_size=1, part_size=None, sample_per_part=4,
                 trans_std=.0, num_offset_fcs=3, deform_fc_channels=1024):
        super().__init__(spatial_scale, out_size, out_channels, no_trans,
                         group_size, part_size, sample_per_part, trans_std)
        self.num_offset_fcs = num_offset_fcs
        self.deform_fc_channels = deform_fc_channels
        self.offset_fc = []
        if not no_trans:
            ic = self.out_size[0] * self.out_size[1] * out_channels
            for i in range(num_offset_fcs):
                oc = (deform_fc_channels if i < num_offset_fcs - 1
                      else self.out_size[0] * self.out_size[1] * 2)
                self.offset_fc.append(Linear(ic, oc))
                ic = oc

    def init(self, key):
        if self.no_trans:
            return {}
        keys = jax.random.split(key, len(self.offset_fc))
        p = {'offset_fc': {str(2 * i): m.init(k)
                           for i, (m, k) in enumerate(zip(self.offset_fc,
                                                          keys))}}
        # last fc zero-init (ref: deform_pool.py:146-147)
        last = str(2 * (len(self.offset_fc) - 1))
        p['offset_fc'][last] = jax.tree_util.tree_map(
            jnp.zeros_like, p['offset_fc'][last])
        return p

    def _run_fcs(self, params, mods, x, group):
        for i, m in enumerate(mods):
            x = m(params[group][str(2 * i)], x)
            if i < len(mods) - 1:
                x = jax.nn.relu(x)
        return x

    def __call__(self, params, data, rois):
        if self.no_trans:
            return self.pool(data, rois, None)
        n = rois.shape[0]
        x = self.pool(data, rois, None, no_trans=True)
        off = self._run_fcs(params, self.offset_fc,
                            x.transpose(0, 3, 1, 2).reshape(n, -1),
                            'offset_fc')
        off = off.reshape(n, 2, self.out_size[0], self.out_size[1])
        return self.pool(data, rois, off)


class ModulatedDeformRoIPoolingPack(DeformRoIPoolingPack):
    """(ref: deform_pool.py:177-260): adds a sigmoid mask FC stack whose
    output multiplies the pooled features."""

    def __init__(self, spatial_scale, out_size, out_channels, no_trans,
                 group_size=1, part_size=None, sample_per_part=4,
                 trans_std=.0, num_offset_fcs=3, num_mask_fcs=2,
                 deform_fc_channels=1024):
        super().__init__(spatial_scale, out_size, out_channels, no_trans,
                         group_size, part_size, sample_per_part, trans_std,
                         num_offset_fcs, deform_fc_channels)
        self.mask_fc = []
        if not no_trans:
            ic = self.out_size[0] * self.out_size[1] * out_channels
            for i in range(num_mask_fcs):
                oc = (deform_fc_channels if i < num_mask_fcs - 1
                      else self.out_size[0] * self.out_size[1])
                self.mask_fc.append(Linear(ic, oc))
                ic = oc

    def init(self, key):
        if self.no_trans:
            return {}
        k1, k2 = jax.random.split(key)
        p = super().init(k1)
        keys = jax.random.split(k2, len(self.mask_fc))
        p['mask_fc'] = {str(2 * i): m.init(k)
                       for i, (m, k) in enumerate(zip(self.mask_fc, keys))}
        last = str(2 * (len(self.mask_fc) - 1))
        p['mask_fc'][last] = jax.tree_util.tree_map(
            jnp.zeros_like, p['mask_fc'][last])
        return p

    def __call__(self, params, data, rois):
        if self.no_trans:
            return self.pool(data, rois, None)
        n = rois.shape[0]
        x = self.pool(data, rois, None, no_trans=True)
        flat = x.transpose(0, 3, 1, 2).reshape(n, -1)
        off = self._run_fcs(params, self.offset_fc, flat, 'offset_fc')
        off = off.reshape(n, 2, self.out_size[0], self.out_size[1])
        out = self.pool(data, rois, off)
        mask = jax.nn.sigmoid(
            self._run_fcs(params, self.mask_fc, flat, 'mask_fc'))
        mask = mask.reshape(n, self.out_size[0], self.out_size[1], 1)
        return out * mask
