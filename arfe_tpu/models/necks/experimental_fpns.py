"""ARFE's experimental FPN research variants
(ref: mmdet/models/necks/{fpn_bu,fpn_newtd,fpn_denoise,fpn_denoise_bu,
fpn_ipt,fpn_ipt_whole,fpn_feat_sel,fpn_multi,fpn_multi_rf,fpn_rf,fpn_dam,
fpn_bourdary_attention_map,fpn_cross,fpn_recomb,fpn_relation,fpn_cbam,
fpn_dual_spatial,deform_fpn,attff,attff2,attsep,multi_sec}.py).

Each is a faithful functional rewrite of the corresponding reference
module, including its quirks (1x1 convs with padding=1 that enlarge maps,
per-image min-max normalizations, cosine distance maps). Shapes stay
static; per-image loops become batched ops.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ...registry import NECKS
from ..layers import (Conv2d, ConvModule, Module, adaptive_avg_pool2d,
                      adaptive_max_pool2d, max_pool2d, resize_nearest)
from .fpn import FPN


def _bilinear(x, size):
    if (x.shape[1], x.shape[2]) == tuple(size):
        return x
    return jax.image.resize(
        x, (x.shape[0], size[0], size[1], x.shape[3]), method='bilinear')


def _gmax(x):
    """adaptive_max_pool2d(x, 1) -> (B, 1, 1, C)."""
    return x.max(axis=(1, 2), keepdims=True)


def _gavg(x):
    return x.mean(axis=(1, 2), keepdims=True)


def _minmax_norm(x, eps=0.0, axis=None):
    """Per-image (or global if axis=None over whole array) min-max."""
    if axis is None:
        mx, mn = x.max(), x.min()
    else:
        mx = x.max(axis=axis, keepdims=True)
        mn = x.min(axis=axis, keepdims=True)
    return (x - mn) / (mx - mn + eps)


# ---------------------------------------------------------------------------
# FPN-skeleton variants
# ---------------------------------------------------------------------------


@NECKS.register_module()
class FPNBU(FPN):
    """FPN with an extra bottom-up lateral pass (ref: fpn_bu.py:11-191)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        n = self.backbone_end_level - self.start_level
        nnl = None if self.no_norm_on_lateral else None
        self.bu_convs = [ConvModule(self.out_channels, self.out_channels, 3,
                                    act_cfg=None, weight_init='xavier')
                         for _ in range(n - 1)]
        self.compress_convs = [ConvModule(self.out_channels * 2,
                                          self.out_channels, 1,
                                          act_cfg=None,
                                          weight_init='xavier')
                               for _ in range(n - 1)]

    def extra_module_groups(self):
        return {'bu_convs': self.bu_convs,
                'compress_convs': self.compress_convs}

    def _pre_topdown(self, params, laterals, inputs):
        for i in range(len(laterals) - 1):
            tmp = resize_nearest(
                self.bu_convs[i](params['bu_convs'][str(i)], laterals[i]),
                laterals[i + 1].shape[1:3])
            laterals[i + 1] = self.compress_convs[i](
                params['compress_convs'][str(i)],
                jnp.concatenate([tmp, laterals[i + 1]], -1))
        return laterals


@NECKS.register_module()
class FPNNEWTD(FPN):
    """FPN whose top-down upsampling is a learned channel-to-space
    rearrangement (ref: fpn_newtd.py:60-183)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        n = self.backbone_end_level - self.start_level
        self.extra_channel_convs = [
            ConvModule(self.out_channels, self.out_channels * 4, 1,
                       act_cfg=None, weight_init='xavier')
            for _ in range(n - 1)]

    def extra_module_groups(self):
        return {'extra_channel_convs': self.extra_channel_convs}

    def _topdown(self, params, laterals, inputs):
        for i in range(len(laterals) - 1, 0, -1):
            b, h, w, c = laterals[i].shape
            tmp = self.extra_channel_convs[i - 1](
                params['extra_channel_convs'][str(i - 1)], laterals[i])
            # channel 4c+k -> position (2y + k//2, 2x + k%2), channel c
            q = tmp.reshape(b, h, w, c, 2, 2)
            add = q.transpose(0, 1, 4, 2, 5, 3).reshape(b, 2 * h, 2 * w, c)
            laterals[i - 1] = laterals[i - 1] + resize_nearest(
                add, laterals[i - 1].shape[1:3])
        return laterals


def _denoise_ipt_map(inputs, pool='max'):
    """Importance map from the mid-level statistics
    (ref: fpn_denoise.py forward head)."""
    mid = len(inputs) // 2
    ih, iw = inputs[mid].shape[1:3]
    sta = adaptive_avg_pool2d(inputs[0], (ih, iw))       # (B, ih, iw, C)
    ch_att = _gavg(sta)
    ipt = (sta * ch_att).sum(-1)                          # (B, ih, iw)
    b = ipt.shape[0]
    flat = ipt.reshape(b, ih * iw)
    outer = flat[:, :, None] * flat[:, None, :]           # (B, P, P)
    red = outer.max(-1) if pool == 'max' else outer.mean(-1)
    m = red.reshape(b, ih, iw, 1)
    return _minmax_norm(m)                                # global min-max


@NECKS.register_module()
class FPNDENOISE(FPN):
    """Inputs gated by a self-correlation importance map
    (ref: fpn_denoise.py)."""

    def _laterals(self, params, inputs):
        ipt = _denoise_ipt_map(inputs, pool='max')
        lp = params['lateral_convs']
        return [m(lp[str(i)],
                  inputs[i + self.start_level] * _bilinear(
                      ipt, inputs[i + self.start_level].shape[1:3]))
                for i, m in enumerate(self.lateral_convs)]


@NECKS.register_module()
class FPNDENOISEBU(FPNBU):
    """FPNBU whose bottom-up pass is gated by the denoise importance map
    (ref: fpn_denoise_bu.py)."""

    def _pre_topdown(self, params, laterals, inputs):
        ipt = _denoise_ipt_map(inputs, pool='avg')
        for i in range(len(laterals) - 1):
            gate = _bilinear(ipt, laterals[i].shape[1:3])
            tmp = resize_nearest(
                self.bu_convs[i](params['bu_convs'][str(i)],
                                 laterals[i] * gate),
                laterals[i + 1].shape[1:3])
            laterals[i + 1] = self.compress_convs[i](
                params['compress_convs'][str(i)],
                jnp.concatenate([tmp, laterals[i + 1]], -1))
        return laterals


class _IptBranch:
    """Dilated importance branch shared by FPNIPT / FPNIPTWHOLE
    (ref: fpn_ipt.py:108-140)."""

    def build(self, in_ch):
        self.dilated_compress_convs = [
            ConvModule(in_ch, 32, 1, padding=1, act_cfg=None,
                       weight_init='xavier') for _ in range(3)]
        self.dilated_convs = [
            ConvModule(32, 32, 3, padding=1, dilation=d, act_cfg=None,
                       weight_init='xavier') for d in (1, 2, 3)]
        self.ipt_compress_conv = ConvModule(32, 1, 1, padding=1,
                                            act_cfg=None,
                                            weight_init='xavier')


@NECKS.register_module()
class FPNIPT(FPN, _IptBranch):
    """Bottom-up pass on raw inputs gated by a dilated importance branch
    (ref: fpn_ipt.py)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        ic = self.in_channels
        n = self.backbone_end_level - self.start_level
        self.bu_convs = [ConvModule(ic[i], ic[i + 1], 3, act_cfg=None,
                                    weight_init='xavier')
                         for i in range(n - 1)]
        self.compress_convs = [ConvModule(ic[i + 1] * 2, ic[i + 1], 1,
                                          act_cfg=None,
                                          weight_init='xavier')
                               for i in range(n - 1)]
        self.build(ic[0])

    def extra_module_groups(self):
        return {'bu_convs': self.bu_convs,
                'compress_convs': self.compress_convs,
                'dilated_compress_convs': self.dilated_compress_convs,
                'dilated_convs': self.dilated_convs,
                'ipt_compress_conv': [self.ipt_compress_conv]}

    def _ipt(self, params, src, size):
        m = None
        for i in range(3):
            t = resize_nearest(self.dilated_compress_convs[i](
                params['dilated_compress_convs'][str(i)], src), size)
            t = resize_nearest(self.dilated_convs[i](
                params['dilated_convs'][str(i)], t), size)
            m = t if m is None else m + t
        m = self.ipt_compress_conv(params['ipt_compress_conv']['0'],
                                   jax.nn.relu(m))
        return _minmax_norm(m)

    def __call__(self, params, inputs):
        ipt = self._ipt(params, inputs[0], inputs[0].shape[1:3])
        xs = list(inputs)
        for i in range(len(xs) - 1):
            gate = _bilinear(ipt, xs[i + 1].shape[1:3])
            tmp = resize_nearest(
                self.bu_convs[i](params['bu_convs'][str(i)], xs[i]),
                xs[i + 1].shape[1:3]) * gate
            xs[i + 1] = self.compress_convs[i](
                params['compress_convs'][str(i)],
                jnp.concatenate([tmp, xs[i + 1]], -1))
        return super().__call__(params, tuple(xs))


@NECKS.register_module()
class FPNIPTWHOLE(FPN, _IptBranch):
    """Bottom-up on inputs + importance gating inside the top-down path
    (ref: fpn_ipt_whole.py)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        ic = self.in_channels
        n = self.backbone_end_level - self.start_level
        self.bu_convs = [ConvModule(ic[i], ic[i + 1], 3, act_cfg=None,
                                    weight_init='xavier')
                         for i in range(n - 1)]
        self.build(self.out_channels)

    def extra_module_groups(self):
        return {'bu_convs': self.bu_convs,
                'dilated_compress_convs': self.dilated_compress_convs,
                'dilated_convs': self.dilated_convs,
                'ipt_compress_conv': [self.ipt_compress_conv]}

    def __call__(self, params, inputs):
        xs = list(inputs)
        for i in range(len(xs) - 1):
            xs[i + 1] = xs[i + 1] + resize_nearest(
                self.bu_convs[i](params['bu_convs'][str(i)], xs[i]),
                xs[i + 1].shape[1:3])
        laterals = self._laterals(params, tuple(xs))
        use_size = laterals[len(laterals) // 2].shape[1:3]
        ipt = None
        for i in range(3):
            t = resize_nearest(self.dilated_compress_convs[i](
                params['dilated_compress_convs'][str(i)], laterals[0]),
                use_size)
            t = resize_nearest(self.dilated_convs[i](
                params['dilated_convs'][str(i)], t), use_size)
            ipt = t if ipt is None else ipt + t
        ipt = self.ipt_compress_conv(params['ipt_compress_conv']['0'],
                                     jax.nn.relu(ipt))
        ipt = _minmax_norm(ipt)
        for i in range(len(laterals) - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + resize_nearest(
                laterals[i], laterals[i - 1].shape[1:3])
            laterals[i - 1] = laterals[i - 1] + laterals[i - 1] * \
                resize_nearest(ipt, laterals[i - 1].shape[1:3])
        return self._build_outputs(params, laterals, tuple(xs))


@NECKS.register_module()
class FPNFEATSEL(FPN):
    """Neighbor-level feature selection without a top-down pass
    (ref: fpn_feat_sel.py)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        n = self.backbone_end_level - self.start_level
        self.compress_convs = [ConvModule(self.out_channels, 1, 1,
                                          padding=1, act_cfg=None,
                                          weight_init='xavier')
                               for _ in range(n)]

    def extra_module_groups(self):
        return {'compress_convs': self.compress_convs}

    def __call__(self, params, inputs):
        laterals = self._laterals(params, inputs)
        used = len(laterals)
        compresses = [jax.nn.relu(resize_nearest(
            self.compress_convs[i](params['compress_convs'][str(i)],
                                   laterals[i]),
            laterals[i].shape[1:3])) for i in range(used)]
        ch_ws = [( _gmax(laterals[i]) + _gavg(laterals[i])) * 0.5
                 for i in range(used)]
        new = []
        for i in range(used):
            cur = laterals[i] + jax.nn.relu(laterals[i] * compresses[i]) \
                + ch_ws[i]
            size = laterals[i].shape[1:3]
            if i > 0:
                tmp = laterals[i - 1] + jax.nn.relu(
                    laterals[i - 1] * compresses[i - 1])
                cur = cur + resize_nearest(tmp, size) + ch_ws[i - 1]
            if i < used - 1:
                tmp = laterals[i + 1] + jax.nn.relu(
                    laterals[i + 1] * compresses[i + 1])
                cur = cur + resize_nearest(tmp, size) + ch_ws[i + 1]
            new.append(cur)
        return self._build_outputs(params, new, inputs)


@NECKS.register_module()
class FPNMULTI(FPN):
    """Tri-level concat compression before the top-down pass
    (ref: fpn_multi.py; NOTE the 1x1 compress convs carry the reference's
    padding=1, so merged maps grow by 2px per side)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.in_compress_convs = []
        for i in range(self.start_level, self.backbone_end_level):
            mult = 3 if self.start_level < i < self.backbone_end_level - 1 \
                else 2
            self.in_compress_convs.append(ConvModule(
                self.out_channels * mult, self.out_channels, 1, padding=1,
                act_cfg=None, weight_init='xavier'))

    def extra_module_groups(self):
        return {'in_compress_convs': self.in_compress_convs}

    def __call__(self, params, inputs):
        laterals = self._laterals(params, inputs)
        used = len(laterals)
        new = []
        for i in range(used):
            size = laterals[i].shape[1:3]
            parts = []
            if i > 0:
                parts.append(resize_nearest(laterals[i - 1], size))
            parts.append(laterals[i])
            if i < used - 1:
                parts.append(resize_nearest(laterals[i + 1], size))
            t = jnp.concatenate(parts, -1)
            new.append(jax.nn.relu(self.in_compress_convs[i](
                params['in_compress_convs'][str(i)], t))
                + (_gavg(laterals[i]) + _gmax(laterals[i])) * 0.5)
        new = self._topdown(params, new, inputs)
        return self._build_outputs(params, new, inputs)


@NECKS.register_module()
class FPNRF(FPN):
    """Self-correlation receptive-field enrichment on the high levels
    (ref: fpn_rf.py)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.com_convs = [ConvModule(self.out_channels, 1, 1,
                                     act_cfg=None, weight_init='xavier')
                          for _ in range(2, self.backbone_end_level)]

    def extra_module_groups(self):
        return {'com_convs': self.com_convs}

    def _pre_topdown(self, params, laterals, inputs):
        for i, m in enumerate(self.com_convs):
            lat = laterals[i + 2]
            b, h, w, c = lat.shape
            rm = jax.nn.relu(m(params['com_convs'][str(i)], lat))
            flat = rm.reshape(b, h * w)
            rm2 = flat[:, :, None] * flat[:, None, :]        # (B, P, P)
            mx = rm2.max(-1, keepdims=True) + 1e-7
            rm2 = rm2 / mx
            ones = jnp.where(rm2 > 0, 1.0, rm2).sum(-1) + 1e-7
            th = (rm2.sum(-1) / ones)[:, :, None]
            rm2 = jnp.where(rm2 < th, 0.0, rm2)
            ones = jnp.where(rm2 > 0, 1.0, rm2).sum(-1) + 1e-7
            mean_map = lat.mean(-1).reshape(b, 1, h * w)
            add = jax.nn.relu(rm2 * mean_map)
            add = (add.sum(-1) / ones).reshape(b, h, w, 1)
            laterals[i + 2] = lat + add
        return laterals


@NECKS.register_module()
class FPNMultiRF(FPN):
    """Objectness (pre) + classification (post) correlation maps
    (ref: fpn_multi_rf.py)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.en_convs = [ConvModule(self.out_channels, 1, 3, padding=1,
                                    act_cfg=None, weight_init='xavier')
                         for _ in range(2)]
        self.com_convs = [ConvModule(self.in_channels[0], 1, 1,
                                     act_cfg=None, weight_init='xavier')
                          for _ in range(2)]

    def extra_module_groups(self):
        return {'en_convs': self.en_convs, 'com_convs': self.com_convs}

    @staticmethod
    def _corr_map(m1, m2, h, w):
        b = m1.shape[0]
        v1 = m1.reshape(b, -1, 1)
        v2 = m2.reshape(b, 1, -1)
        m = (v1 * v2).sum(-1) / (h * w)
        return m.reshape(b, h, w, 1)

    def __call__(self, params, inputs):
        laterals = self._laterals(params, inputs)
        b, h, w, _ = inputs[2].shape
        inp = adaptive_avg_pool2d(inputs[0], (h, w))
        o1 = jax.nn.relu(self.com_convs[0](params['com_convs']['0'], inp))
        o2 = jax.nn.relu(self.com_convs[1](params['com_convs']['1'], inp))
        obj_map = self._corr_map(o1, o2, h, w)
        laterals = self._topdown(params, laterals, inputs)
        c1 = jax.nn.relu(self.en_convs[0](params['en_convs']['0'],
                                          laterals[2]))
        c2 = jax.nn.relu(self.en_convs[1](params['en_convs']['1'],
                                          laterals[2]))
        cls_map = self._corr_map(c1, c2, h, w)
        for i in range(len(laterals)):
            size = laterals[i].shape[1:3]
            laterals[i] = laterals[i] + resize_nearest(obj_map, size) \
                + resize_nearest(cls_map, size)
        return self._build_outputs(params, laterals, inputs)


@NECKS.register_module()
class FPNDAM(FPN):
    """Distance-attention top-down merging (ref: fpn_dam.py)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.reduce_convs = [ConvModule(self.out_channels, 1, 3, padding=1,
                                        act_cfg=None, weight_init='xavier')
                             for _ in range(self.num_ins - 1)]

    def extra_module_groups(self):
        return {'reduce_convs': self.reduce_convs}

    def _topdown(self, params, laterals, inputs):
        for i in range(len(laterals) - 1, 0, -1):
            lat = laterals[i - 1]
            b, h, w, c = lat.shape
            basic = jax.nn.relu(self.reduce_convs[i - 1](
                params['reduce_convs'][str(i - 1)], lat))    # (B,h,w,1)
            row_avg = lat.mean(axis=2)[..., 0]               # (B, h) ch 0
            col_avg = lat.mean(axis=1)[..., 0]               # (B, w) ch 0
            avg_map = row_avg[:, :, None] * col_avg[:, None, :]
            avg_map = _minmax_norm(avg_map.reshape(b, h, w, 1),
                                   eps=1e-7, axis=(1, 2, 3))
            basic = _minmax_norm(basic, eps=1e-7, axis=(1, 2, 3))
            dist = jnp.cos((avg_map - basic) * (math.pi / 2))
            att = dist * resize_nearest(laterals[i], (h, w))
            laterals[i - 1] = lat + att
        return laterals


@NECKS.register_module()
class FPNBAM(FPN):
    """Boundary attention from level-2 gradients (ref:
    fpn_bourdary_attention_map.py)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.bam_conv = ConvModule(self.out_channels, self.out_channels, 3,
                                   padding=1, act_cfg=None,
                                   weight_init='xavier')

    def extra_module_groups(self):
        return {'bam_conv': [self.bam_conv]}

    def _post_topdown(self, params, laterals, inputs):
        lat2 = laterals[2]
        ho = jnp.zeros_like(lat2).at[:, 1:].set(
            jnp.abs(lat2[:, 1:] - lat2[:, :-1]))
        ve = jnp.zeros_like(lat2).at[:, :, 1:].set(
            jnp.abs(lat2[:, :, 1:] - lat2[:, :, :-1]))
        bam = jax.nn.sigmoid(jnp.abs(self.bam_conv(
            params['bam_conv']['0'], ho + ve))) * 2.0 - 1.0
        for i in range(3):
            size = laterals[i].shape[1:3]
            laterals[i] = laterals[i] + laterals[i] * resize_nearest(bam,
                                                                     size)
        return laterals


@NECKS.register_module()
class FPNCBAM(FPN):
    """CBAM attention on every lateral (ref: fpn_cbam.py; CBAM ref:
    backbones/layers/cbam.py:17-95)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.cbam_convs = [CbamModule(self.out_channels)
                           for _ in range(self.backbone_end_level
                                          - self.start_level)]

    def extra_module_groups(self):
        return {'cbam_convs': self.cbam_convs}

    def _pre_topdown(self, params, laterals, inputs):
        return [m(params['cbam_convs'][str(i)], x)
                for i, (m, x) in enumerate(zip(self.cbam_convs, laterals))]


@NECKS.register_module()
class FPNDualSpatial(FPN):
    """Dual spatial-attention gates on the top-down sum
    (ref: fpn_dual_spatial.py)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        n = self.backbone_end_level - self.start_level
        self.reduce_convs = [ConvModule(self.out_channels, 1, 3, padding=1,
                                        act_cfg=None, weight_init='xavier')
                             for _ in range(n)]
        self.reduce_convs2 = [ConvModule(self.out_channels, 1, 3, padding=1,
                                         act_cfg=None,
                                         weight_init='xavier')
                              for _ in range(n)]

    def extra_module_groups(self):
        return {'reduce_convs': self.reduce_convs,
                'reduce_convs2': self.reduce_convs2}

    def _topdown(self, params, laterals, inputs):
        for i in range(len(laterals) - 1, 0, -1):
            lat = laterals[i - 1]
            basic = jnp.tanh(self.reduce_convs[i - 1](
                params['reduce_convs'][str(i - 1)], lat))
            com = jnp.tanh(self.reduce_convs2[i - 1](
                params['reduce_convs2'][str(i - 1)], lat))
            laterals[i - 1] = lat + resize_nearest(
                laterals[i], lat.shape[1:3]) * (basic + com)
        return laterals


@NECKS.register_module()
class DeformFPN(FPN):
    """FPN whose laterals are 3x3 deformable convs with self-predicted
    offsets (ref: deform_fpn.py; NOTE the reference module as written is
    non-executable — its offset conv expects 4 input channels and its
    ConvModule takes no deformable_groups — so this implements the evident
    intent: offsets from a 1x1 conv on the input, DCN lateral, relu)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.offset_convs = []
        self.deform_laterals = []
        for i in range(self.start_level, self.backbone_end_level):
            self.offset_convs.append(Conv2d(
                self.in_channels[i], 4 * 3 * 3 * 2, 1, bias=False,
                weight_init='normal', init_std=0.01))
            self.deform_laterals.append(Conv2d(
                self.in_channels[i], self.out_channels, 3, padding=1,
                bias=False, weight_init='xavier'))

    def extra_module_groups(self):
        return {'offset_convs': self.offset_convs,
                'deform_laterals': self.deform_laterals}

    def _laterals(self, params, inputs):
        from ...ops.deform_conv import deform_conv2d
        outs = []
        for i in range(len(self.deform_laterals)):
            x = inputs[i + self.start_level]
            off = self.offset_convs[i](params['offset_convs'][str(i)], x)
            outs.append(jax.nn.relu(deform_conv2d(
                x, off, params['deform_laterals'][str(i)]['weight'],
                padding=1, deform_groups=4)))
        return outs


# ---------------------------------------------------------------------------
# standalone (non-FPN-shaped) variants
# ---------------------------------------------------------------------------


class CbamModule(Module):
    """CBAM channel + spatial attention (ref:
    backbones/layers/cbam.py:17-95; vendored timm layer)."""

    def __init__(self, channels, spatial_kernel_size=7, reduction=16):
        red = max(channels // reduction, 1)
        self.fc1 = Conv2d(channels, red, 1, bias=False,
                          weight_init='torch_default')
        self.fc2 = Conv2d(red, channels, 1, bias=False,
                          weight_init='torch_default')
        self.spatial_conv = ConvModule(2, 1, 3, padding=1, act_cfg='relu',
                                       weight_init='torch_default')

    def init(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        return {'channel': {'fc1': self.fc1.init(k1),
                            'fc2': self.fc2.init(k2)},
                'spatial': {'conv': self.spatial_conv.init(k3)}}

    def __call__(self, params, x):
        cp = params['channel']

        def mlp(v):
            return self.fc2(cp['fc2'], jax.nn.relu(self.fc1(cp['fc1'], v)))

        attn = mlp(_gavg(x)) + mlp(_gmax(x))
        x = x * jax.nn.sigmoid(attn)
        sp = jnp.concatenate([x.mean(-1, keepdims=True),
                              x.max(-1, keepdims=True)], -1)
        sattn = self.spatial_conv(params['spatial']['conv'], sp)
        return x * jax.nn.relu(jax.nn.sigmoid(sattn))


@NECKS.register_module()
class FPNCROSS(Module):
    """Cross-scale statistics residuals (ref: fpn_cross.py:10-138)."""

    def __init__(self, in_channels, num_levels, conv_cfg=None,
                 norm_cfg=None):
        self.in_channels = in_channels
        self.num_levels = num_levels
        mid = int(num_levels * 0.5)
        self.mid = mid
        # the reference omits act_cfg here -> mmcv's default ReLU applies
        self.high_basic_conv = ConvModule(in_channels, num_levels - mid, 3,
                                          padding=1, act_cfg='relu',
                                          weight_init='xavier')
        self.low_basic_conv = ConvModule(in_channels, mid, 3, padding=1,
                                         act_cfg='relu',
                                         weight_init='xavier')

    def init(self, key):
        k1, k2 = jax.random.split(key)
        return {'high_basic_conv': self.high_basic_conv.init(k1),
                'low_basic_conv': self.low_basic_conv.init(k2)}

    @staticmethod
    def _group(params_conv, conv, feats):
        b, h, w, c = feats.shape
        basic = conv(params_conv, feats)                     # (B,h,w,L)
        basic = _minmax_norm(basic, eps=1e-7, axis=(1, 2))
        avg = feats.mean(-1, keepdims=True)                  # (B,h,w,1)
        la = avg.mean(axis=1, keepdims=True)                 # (B,1,w,1)
        ho = avg.mean(axis=2, keepdims=True)                 # (B,h,1,1)
        avg_map = ho * la
        return jnp.cos((basic - avg_map) * (math.pi / 2))    # (B,h,w,L)

    def __call__(self, params, inputs):
        assert len(inputs) == self.num_levels
        mid = self.mid
        low_level = (mid - 1) // 2
        high_level = (self.num_levels + mid) // 2
        high_size = inputs[high_level].shape[1:3]
        low_size = inputs[low_level].shape[1:3]

        high_feats = sum(
            resize_nearest(inputs[i], high_size)
            for i in range(mid, self.num_levels)) / (self.num_levels - mid)
        high_dist = self._group(params['high_basic_conv'],
                                self.high_basic_conv, high_feats)
        low_feats = sum(
            (adaptive_max_pool2d(inputs[i], low_size) if i < low_level
             else resize_nearest(inputs[i], low_size))
            for i in range(mid)) / mid
        low_dist = self._group(params['low_basic_conv'],
                               self.low_basic_conv, low_feats)

        outs = []
        for i in range(self.num_levels):
            size = inputs[i].shape[1:3]
            if i >= mid:
                res = high_feats + high_feats * high_dist[..., i - mid:
                                                          i - mid + 1]
                res = resize_nearest(res, size) if i < high_level \
                    else adaptive_max_pool2d(res, size)
            else:
                res = low_feats + low_feats * low_dist[..., i:i + 1]
                res = resize_nearest(res, size) if i < low_level \
                    else adaptive_max_pool2d(res, size)
            outs.append(inputs[i] + res)
        return tuple(outs)


@NECKS.register_module()
class FPNRECOMB(Module):
    """Learned softmax recombination weights across levels
    (ref: fpn_recomb.py)."""

    def __init__(self, in_channels, num_levels, num_convs=1,
                 refine_level=2, conv_cfg=None, norm_cfg=None):
        self.in_channels = in_channels
        self.num_levels = num_levels
        self.num_convs = num_convs
        self.refine_level = refine_level
        self.mid_convs = [ConvModule(in_channels, in_channels, 3,
                                     padding=1, act_cfg=None,
                                     weight_init='xavier')
                          for _ in range(num_convs)]
        self.compress_conv = ConvModule(in_channels,
                                        num_levels * num_levels, 3,
                                        padding=1, act_cfg=None,
                                        weight_init='xavier')

    def init(self, key):
        keys = jax.random.split(key, self.num_convs + 1)
        return {'mid_convs': {str(i): m.init(keys[i])
                              for i, m in enumerate(self.mid_convs)},
                'compress_conv': self.compress_conv.init(keys[-1])}

    def __call__(self, params, inputs):
        assert len(inputs) == self.num_levels
        size = inputs[self.refine_level].shape[1:3]
        feats = [adaptive_max_pool2d(x, size) if i < self.refine_level
                 else resize_nearest(x, size)
                 for i, x in enumerate(inputs)]
        bsf = sum(feats) / len(feats)
        for i, m in enumerate(self.mid_convs):
            bsf = m(params['mid_convs'][str(i)], bsf)
        bsf = jax.nn.relu(self.compress_conv(params['compress_conv'], bsf))
        bsf = _gavg(bsf).reshape(-1, self.num_levels, self.num_levels)
        ws = jax.nn.softmax(bsf, axis=1)
        outs = []
        for i in range(self.num_levels):
            size = inputs[i].shape[1:3]
            tmp = inputs[i]
            for j in range(self.num_levels):
                if j != i:
                    tmp = tmp + resize_nearest(inputs[j], size) \
                        * ws[:, j, i][:, None, None, None]
            outs.append(tmp)
        return tuple(outs)


@NECKS.register_module()
class FPNRelation(Module):
    """Pixel-wise objectness/classification relation residuals
    (ref: fpn_relation.py)."""

    def __init__(self, in_channels, num_levels, conv_cfg=None,
                 norm_cfg=None):
        self.in_channels = in_channels
        self.num_levels = num_levels
        # reference omits act_cfg -> mmcv default ReLU
        self.en_convs = [ConvModule(in_channels, 1, 3, padding=1,
                                    act_cfg='relu', weight_init='xavier')
                         for _ in range(2)]
        self.com_convs = [ConvModule(in_channels, 1, 1, act_cfg='relu',
                                     weight_init='xavier')
                          for _ in range(2)]

    def init(self, key):
        keys = jax.random.split(key, 4)
        return {'en_convs': {'0': self.en_convs[0].init(keys[0]),
                             '1': self.en_convs[1].init(keys[1])},
                'com_convs': {'0': self.com_convs[0].init(keys[2]),
                              '1': self.com_convs[1].init(keys[3])}}

    @staticmethod
    def _rel(m1, m2, h, w):
        b = m1.shape[0]
        v1 = m1.reshape(b, -1, 1)
        v2 = m2.reshape(b, 1, -1)
        m = (v1 * v2).sum(-1) / (h * w)
        return m.reshape(b, h, w, 1)

    def __call__(self, params, inputs):
        assert len(inputs) == self.num_levels
        b, h, w, c = inputs[2].shape
        inp = adaptive_avg_pool2d(inputs[0], (h, w))
        o1 = jax.nn.relu(self.com_convs[0](params['com_convs']['0'], inp))
        o2 = jax.nn.relu(self.com_convs[1](params['com_convs']['1'], inp))
        obj = self._rel(o1, o2, h, w)
        c1 = jax.nn.relu(self.en_convs[0](params['en_convs']['0'],
                                          inputs[2]))
        c2 = jax.nn.relu(self.en_convs[1](params['en_convs']['1'],
                                          inputs[2]))
        cls = self._rel(c1, c2, h, w)
        return tuple(
            x + resize_nearest(obj, x.shape[1:3])
            + resize_nearest(cls, x.shape[1:3]) for x in inputs)


@NECKS.register_module()
class ATTFF(Module):
    """Attention feature fusion with cosine distance maps
    (ref: attff.py)."""

    def __init__(self, in_channels, out_channels, num_outs, norm_cfg=None,
                 activation=None, relu_before_extra_convs=False,
                 no_norm_on_lateral=False):
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.num_outs = num_outs
        self.pre_convs = []
        self.sep_convs = []
        self.lateral_convs = []
        self.fpn_convs = []
        for i in range(num_outs):
            cin = in_channels[i] if i < len(in_channels) else \
                in_channels[-1]
            self.pre_convs.append(ConvModule(cin, out_channels, 3,
                                             padding=1, act_cfg=None,
                                             weight_init='xavier'))
            self.sep_convs.append(ConvModule(out_channels, 1, 1,
                                             act_cfg=None,
                                             weight_init='xavier'))
            self.lateral_convs.append(ConvModule(cin, out_channels, 1,
                                                 act_cfg=None,
                                                 weight_init='xavier'))
            self.fpn_convs.append(ConvModule(out_channels, out_channels, 3,
                                             padding=1, act_cfg=None,
                                             weight_init='xavier'))

    def init(self, key):
        keys = jax.random.split(key, 4 * self.num_outs)
        it = iter(keys)
        return {g: {str(i): m.init(next(it))
                    for i, m in enumerate(getattr(self, g))}
                for g in ('pre_convs', 'sep_convs', 'lateral_convs',
                          'fpn_convs')}

    def _extend(self, inputs):
        xs = list(inputs)
        for _ in range(self.num_outs - len(inputs)):
            xs.append(max_pool2d(xs[-1], 1, stride=2))
        return xs

    def _fuse(self, params, laterals, att_maps):
        for i in range(self.num_outs - 1, -1, -1):
            size = laterals[i].shape[1:3]
            if i == self.num_outs - 1:
                laterals[i] = laterals[i] + _gmax(laterals[i])
            else:
                dist = jnp.cos(
                    (att_maps[i] - resize_nearest(att_maps[i + 1], size))
                    * (math.pi / 2))
                laterals[i] = laterals[i] + resize_nearest(
                    laterals[i + 1], size) * (1.0 - dist) \
                    + _gmax(laterals[i])
        return [self.fpn_convs[i](params['fpn_convs'][str(i)], laterals[i])
                for i in range(self.num_outs)]

    def __call__(self, params, inputs):
        xs = self._extend(inputs)
        laterals = [self.lateral_convs[i](params['lateral_convs'][str(i)],
                                          xs[i])
                    for i in range(self.num_outs)]
        att = [self.sep_convs[i](
            params['sep_convs'][str(i)],
            self.pre_convs[i](params['pre_convs'][str(i)], xs[i]))
            for i in range(self.num_outs)]
        # per-image min-max with the reference's +1.0 denominator
        att = [(a - a.min(axis=(1, 2, 3), keepdims=True))
               / (a.max(axis=(1, 2, 3), keepdims=True)
                  - a.min(axis=(1, 2, 3), keepdims=True) + 1.0)
               for a in att]
        return tuple(self._fuse(params, laterals, att))


@NECKS.register_module()
class ATTFF2(ATTFF):
    """ATTFF variant whose attention maps are channel sums of the laterals
    (ref: attff2.py)."""

    def __init__(self, in_channels, out_channels, num_outs, **kw):
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.num_outs = num_outs
        self.lateral_convs = []
        self.fpn_convs = []
        for i in range(num_outs):
            cin = in_channels[i] if i < len(in_channels) else \
                in_channels[-1]
            self.lateral_convs.append(ConvModule(cin, out_channels, 1,
                                                 act_cfg=None,
                                                 weight_init='xavier'))
            self.fpn_convs.append(ConvModule(out_channels, out_channels, 3,
                                             padding=1, act_cfg=None,
                                             weight_init='xavier'))

    def init(self, key):
        keys = jax.random.split(key, 2 * self.num_outs)
        it = iter(keys)
        return {g: {str(i): m.init(next(it))
                    for i, m in enumerate(getattr(self, g))}
                for g in ('lateral_convs', 'fpn_convs')}

    def __call__(self, params, inputs):
        xs = self._extend(inputs)
        att_map = [self.lateral_convs[i](params['lateral_convs'][str(i)],
                                         xs[i])
                   for i in range(self.num_outs)]
        att = [a.sum(-1, keepdims=True) for a in att_map]
        att = [(a - a.min(axis=(1, 2, 3), keepdims=True))
               / (a.max(axis=(1, 2, 3), keepdims=True)
                  - a.min(axis=(1, 2, 3), keepdims=True) + 1.0)
               for a in att]
        laterals = list(att_map)
        return tuple(self._fuse(params, laterals, att))


@NECKS.register_module()
class ATTSEP(Module):
    """High/low pooled features gated by tanh maps (ref: attsep.py)."""

    def __init__(self, in_channels, num_levels, conv_cfg=None,
                 norm_cfg=None):
        self.in_channels = in_channels
        self.num_levels = num_levels
        # reference omits act_cfg -> mmcv default ReLU (so the tanh gate
        # is tanh(relu(.)) in [0, 1))
        self.com_convs = [ConvModule(in_channels, 1, 1, act_cfg='relu',
                                     weight_init='xavier')
                          for _ in range(num_levels)]

    def init(self, key):
        keys = jax.random.split(key, self.num_levels)
        return {'com_convs': {str(i): m.init(keys[i])
                              for i, m in enumerate(self.com_convs)}}

    def __call__(self, params, inputs):
        assert len(inputs) == self.num_levels
        size2 = inputs[2].shape[1:3]
        high = inputs[2] + resize_nearest(inputs[3], size2) \
            + resize_nearest(inputs[4], size2)
        low = adaptive_max_pool2d(inputs[1], size2) \
            + adaptive_max_pool2d(inputs[0], size2)
        outs = []
        for i in range(self.num_levels):
            gate = jnp.tanh(self.com_convs[i](params['com_convs'][str(i)],
                                              inputs[i]))
            if i < self.num_levels // 2:
                res = resize_nearest(high, inputs[i].shape[1:3])
            else:
                res = adaptive_max_pool2d(low, inputs[i].shape[1:3])
            outs.append(inputs[i] + gate * res)
        return tuple(outs)


@NECKS.register_module()
class MULTISEC(Module):
    """Two rounds of tri-level concat compression (ref: multi_sec.py)."""

    def __init__(self, in_channels, num_levels, conv_cfg=None,
                 norm_cfg=None, act_cfg=None):
        self.in_channels = in_channels
        self.num_levels = num_levels
        def make():
            return [ConvModule(
                in_channels * (3 if 0 < i < num_levels - 1 else 2),
                in_channels, 1, act_cfg=None, weight_init='xavier')
                for i in range(num_levels)]
        self.fir_convs = make()
        self.sec_convs = make()

    def init(self, key):
        keys = jax.random.split(key, 2 * self.num_levels)
        return {'fir_convs': {str(i): m.init(keys[i])
                              for i, m in enumerate(self.fir_convs)},
                'sec_convs': {str(i): m.init(keys[self.num_levels + i])
                              for i, m in enumerate(self.sec_convs)}}

    def _round(self, params, convs, feats, add_ch=None):
        outs = []
        for i in range(self.num_levels):
            size = feats[i].shape[1:3]
            parts = []
            if i > 0:
                parts.append(resize_nearest(feats[i - 1], size))
            parts.append(feats[i])
            if i < self.num_levels - 1:
                parts.append(resize_nearest(feats[i + 1], size))
            t = jnp.concatenate(parts, -1)
            out = jax.nn.relu(convs[i](params[str(i)], t))
            if add_ch is not None:
                out = out + add_ch[i]
            outs.append(out)
        return outs

    def __call__(self, params, inputs):
        assert len(inputs) == self.num_levels
        fir = self._round(params['fir_convs'], self.fir_convs,
                          list(inputs))
        ch = [(_gavg(x) + _gmax(x)) * 0.5 for x in inputs]
        sec = self._round(params['sec_convs'], self.sec_convs, fir,
                          add_ch=ch)
        return tuple(sec)
