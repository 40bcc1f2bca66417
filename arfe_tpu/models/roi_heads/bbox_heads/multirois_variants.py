"""AR-RFF bbox-head ablation variants
(ref: mmdet/models/roi_heads/bbox_heads/multirois_bbox_head_{pool,convs,
offset,dual_ws,deform}.py and attrois_bbox_head.py).

Each consumes the AR-RFF triple-RoI channel-concatenated features
([ori, lw, lh], 3C channels) except AttRoIsBBoxHead (plain C). The
reference modules' ConvModules omit act_cfg, so mmcv's default ReLU is
baked in (plus the reference's redundant extra F.relu calls, which are
idempotent and therefore dropped).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ....registry import HEADS
from ...layers import (Conv2d, ConvModule, Linear, adaptive_avg_pool2d,
                       resize_nearest)
from .bbox_head import ConvFCBBoxHead


def _rois_kwargs(kwargs, fc_out_channels=1024):
    """The MultiRoIs* aliases pin the branch layout
    (ref: e.g. multirois_bbox_head_pool.py tail classes)."""
    kwargs.update(num_shared_convs=0, num_shared_fcs=2, num_cls_convs=0,
                  num_cls_fcs=0, num_reg_convs=0, num_reg_fcs=0,
                  fc_out_channels=fc_out_channels)
    return kwargs


@HEADS.register_module()
class MultiBBoxHeadPool(ConvFCBBoxHead):
    """Pyramid-pooling fusion of the triple-RoI features
    (ref: multirois_bbox_head_pool.py:12-260)."""

    num_roi_groups = 3

    def _init_layers(self):
        c = self.in_channels
        self.com_convs = [
            ConvModule(c * 3, c, 1, act_cfg='relu', weight_init='xavier'),
            ConvModule(c * 2, c, 1, act_cfg='relu', weight_init='xavier')]
        self.neck_convs = [
            ConvModule(c, c // 4, 1, act_cfg='relu', weight_init='xavier'),
            ConvModule(c, c // 4, 1, act_cfg='relu', weight_init='xavier'),
            ConvModule(c, c // 2, 1, act_cfg='relu', weight_init='xavier')]
        self.final_conv = ConvModule(c, c, 3, padding=1, act_cfg='relu',
                                     weight_init='xavier')
        super()._init_layers()

    def init(self, key):
        keys = jax.random.split(key, 7)
        p = super().init(keys[-1])
        p['com_convs'] = {str(i): m.init(keys[i])
                          for i, m in enumerate(self.com_convs)}
        p['neck_convs'] = {str(i): m.init(keys[2 + i])
                           for i, m in enumerate(self.neck_convs)}
        p['final_conv'] = self.final_conv.init(keys[5])
        return p

    def fuse(self, params, x):
        size = x.shape[1:3]
        y = self.com_convs[0](params['com_convs']['0'], x)
        pools = []
        for i, s in enumerate((1, 2, 3)):
            pv = adaptive_avg_pool2d(y, (s, s))
            pv = self.neck_convs[i](params['neck_convs'][str(i)], pv)
            pools.append(resize_nearest(pv, size))
        y = jnp.concatenate([y] + pools, -1)
        y = self.com_convs[1](params['com_convs']['1'], y)
        return self.final_conv(params['final_conv'], y)

    def __call__(self, params, x):
        return super().__call__(params, self.fuse(params, x))


@HEADS.register_module()
class MultiRoIsBBoxHeadPool(MultiBBoxHeadPool):
    def __init__(self, fc_out_channels=1024, *args, **kwargs):
        super().__init__(*args, **_rois_kwargs(kwargs, fc_out_channels))


@HEADS.register_module()
class MultiBBoxHeadConvs(ConvFCBBoxHead):
    """Asymmetric (1x3/3x1) conv fusion
    (ref: multirois_bbox_head_convs.py:12-259; the asymmetric kernels keep
    the reference's padding=1-on-both-dims growth, resized back)."""

    num_roi_groups = 3

    def _init_layers(self):
        c = self.in_channels
        self.com_conv = ConvModule(c * 2, c, 3, padding=1, act_cfg='relu',
                                   weight_init='xavier')
        self.first_convs = [
            ConvModule(c, c, (1, 3), padding=1, act_cfg='relu',
                       weight_init='xavier'),
            ConvModule(c, c, (3, 1), padding=1, act_cfg='relu',
                       weight_init='xavier')]
        self.second_convs = [
            ConvModule(c, c, (3, 1), padding=1, act_cfg='relu',
                       weight_init='xavier'),
            ConvModule(c, c, (1, 3), padding=1, act_cfg='relu',
                       weight_init='xavier')]
        self.final_conv = ConvModule(c, c, 3, padding=1, act_cfg='relu',
                                     weight_init='xavier')
        super()._init_layers()

    def init(self, key):
        keys = jax.random.split(key, 7)
        p = super().init(keys[-1])
        p['com_conv'] = self.com_conv.init(keys[0])
        p['first_convs'] = {str(i): m.init(keys[1 + i])
                            for i, m in enumerate(self.first_convs)}
        p['second_convs'] = {str(i): m.init(keys[3 + i])
                             for i, m in enumerate(self.second_convs)}
        p['final_conv'] = self.final_conv.init(keys[5])
        return p

    def fuse(self, params, x):
        c = self.in_channels
        ori = x[..., :c]
        add = x[..., c:]
        com = self.com_conv(params['com_conv'], add)
        fir = self.first_convs[0](params['first_convs']['0'], com)
        fir = self.first_convs[1](params['first_convs']['1'], fir)
        sec = self.second_convs[0](params['second_convs']['0'], com)
        sec = self.second_convs[1](params['second_convs']['1'], sec)
        y = ori + resize_nearest(fir + sec, ori.shape[1:3])
        return self.final_conv(params['final_conv'], y)

    def __call__(self, params, x):
        return super().__call__(params, self.fuse(params, x))


@HEADS.register_module()
class MultiRoIsBBoxHeadConvs(MultiBBoxHeadConvs):
    def __init__(self, fc_out_channels=1024, *args, **kwargs):
        super().__init__(*args, **_rois_kwargs(kwargs, fc_out_channels))


@HEADS.register_module()
class MultiBBoxHeadOffset(ConvFCBBoxHead):
    """Fused + original dual path: the regression deltas are
    fc_reg(fused) + fc_reg(fused - original)
    (ref: multirois_bbox_head_offset.py:12-246)."""

    num_roi_groups = 3

    def _init_layers(self):
        c = self.in_channels
        self.wh_conv = ConvModule(c, c, 3, padding=1, act_cfg='relu',
                                  weight_init='xavier')
        self.hh_conv = ConvModule(c, c, 3, padding=1, act_cfg='relu',
                                  weight_init='xavier')
        self.final_conv = ConvModule(c, c, 3, padding=1, act_cfg='relu',
                                     weight_init='xavier')
        super()._init_layers()
        # offset branch mirrors the reg branch layout
        self.offset_convs, self.offset_fcs, _ = self._branch(
            self.num_reg_convs, self.num_reg_fcs, self.shared_out)

    def init(self, key):
        keys = jax.random.split(key, 6)
        p = super().init(keys[-1])
        p['wh_conv'] = self.wh_conv.init(keys[0])
        p['hh_conv'] = self.hh_conv.init(keys[1])
        p['final_conv'] = self.final_conv.init(keys[2])
        for name, mods, k in (('offset_convs', self.offset_convs, keys[3]),
                              ('offset_fcs', self.offset_fcs, keys[4])):
            if mods:
                p[name] = {str(i): m.init(kk) for i, (m, kk) in enumerate(
                    zip(mods, jax.random.split(k, max(len(mods), 2))))}
        return p

    def __call__(self, params, x):
        c = self.in_channels
        ori = x[..., :c]
        lwh = self.wh_conv(params['wh_conv'], x[..., c:2 * c])
        lhh = self.hh_conv(params['hh_conv'], x[..., 2 * c:])
        fused = ori + (lwh + lhh) * ori
        fused = self.final_conv(params['final_conv'], fused)
        x_out = self._forward_shared(params, fused)
        x_ori = self._forward_shared(params, ori)
        x_cls = self._forward_branch(params, x_out, self.cls_convs,
                                     self.cls_fcs, 'cls_convs', 'cls_fcs')
        x_reg = self._forward_branch(params, x_out, self.reg_convs,
                                     self.reg_fcs, 'reg_convs', 'reg_fcs')
        x_off = self._forward_branch(params, x_out - x_ori,
                                     self.offset_convs, self.offset_fcs,
                                     'offset_convs', 'offset_fcs')
        cls_score = self.fc_cls(params['fc_cls'], x_cls) if self.with_cls \
            else None
        bbox_pred = (self.fc_reg(params['fc_reg'], x_reg)
                     + self.fc_reg(params['fc_reg'], x_off)) \
            if self.with_reg else None
        return cls_score, bbox_pred


@HEADS.register_module()
class MultiRoIsBBoxHeadOffset(MultiBBoxHeadOffset):
    def __init__(self, fc_out_channels=1024, *args, **kwargs):
        super().__init__(*args, **_rois_kwargs(kwargs, fc_out_channels))


@HEADS.register_module()
class MultiBBoxHeadDualWS(ConvFCBBoxHead):
    """Fused/original regression blended by learned 2-way softmax weights
    (ref: multirois_bbox_head_dual_ws.py:12-264)."""

    num_roi_groups = 3

    def _init_layers(self):
        c = self.in_channels
        self.wh_conv = ConvModule(c, c, 3, padding=1, act_cfg='relu',
                                  weight_init='xavier')
        self.hh_conv = ConvModule(c, c, 3, padding=1, act_cfg='relu',
                                  weight_init='xavier')
        self.compress_conv = ConvModule(c, 1, 1, act_cfg='relu',
                                        weight_init='xavier')
        self.pp_fc = Linear(self.roi_feat_area, 2)
        self.final_conv = ConvModule(c, c, 3, padding=1, act_cfg='relu',
                                     weight_init='xavier')
        super()._init_layers()

    def init(self, key):
        keys = jax.random.split(key, 6)
        p = super().init(keys[-1])
        p['wh_conv'] = self.wh_conv.init(keys[0])
        p['hh_conv'] = self.hh_conv.init(keys[1])
        p['compress_conv'] = self.compress_conv.init(keys[2])
        p['pp_fc'] = self.pp_fc.init(keys[3])
        p['final_conv'] = self.final_conv.init(keys[4])
        return p

    def __call__(self, params, x):
        c = self.in_channels
        ori = x[..., :c]
        lwh = self.wh_conv(params['wh_conv'], x[..., c:2 * c])
        lhh = self.hh_conv(params['hh_conv'], x[..., 2 * c:])
        fused = ori + (lwh + lhh) * ori
        fused = self.final_conv(params['final_conv'], fused)
        ws = self.compress_conv(params['compress_conv'], fused - ori)
        ws = jax.nn.softmax(self.pp_fc(params['pp_fc'],
                                       ws.reshape(ws.shape[0], -1)), -1)
        x_out = self._forward_shared(params, fused)
        x_ori = self._forward_shared(params, ori)
        x_cls = self._forward_branch(params, x_out, self.cls_convs,
                                     self.cls_fcs, 'cls_convs', 'cls_fcs')
        x_reg = self._forward_branch(params, x_out, self.reg_convs,
                                     self.reg_fcs, 'reg_convs', 'reg_fcs')
        x_off = self._forward_branch(params, x_ori, self.reg_convs,
                                     self.reg_fcs, 'reg_convs', 'reg_fcs')
        cls_score = self.fc_cls(params['fc_cls'], x_cls) if self.with_cls \
            else None
        bbox_pred = (self.fc_reg(params['fc_reg'], x_reg) * ws[:, :1]
                     + self.fc_reg(params['fc_reg'], x_off) * ws[:, 1:]) \
            if self.with_reg else None
        return cls_score, bbox_pred


@HEADS.register_module()
class MultiRoIsBBoxHeadDualWS(MultiBBoxHeadDualWS):
    def __init__(self, fc_out_channels=1024, *args, **kwargs):
        super().__init__(*args, **_rois_kwargs(kwargs, fc_out_channels))


@HEADS.register_module()
class MultiBBoxHeadDeform(ConvFCBBoxHead):
    """Deformable refinement of the fused features
    (ref: multirois_bbox_head_deform.py:40-286; NOTE the reference's
    FeatureAlign is constructed with in_channels=C but applied to the
    4-channel offset map, which cannot execute — this implements the
    evident intent with a 4-channel deform conv)."""

    num_roi_groups = 3

    def _init_layers(self):
        c = self.in_channels
        self.feature_convs = [
            ConvModule(c, c, 3, padding=1, act_cfg='relu',
                       weight_init='xavier'),
            ConvModule(c, c, 3, padding=1, act_cfg='relu',
                       weight_init='xavier'),
            ConvModule(4, 1, 3, padding=1, act_cfg='relu',
                       weight_init='xavier'),
            ConvModule(c, c, 3, padding=1, act_cfg='relu',
                       weight_init='xavier')]
        self.com_conv = ConvModule(c, 4, 1, act_cfg='relu',
                                   weight_init='xavier')
        self.align_offset = Conv2d(4, 4 * 9 * 2, 1, bias=False,
                                   weight_init='normal', init_std=0.1)
        self.align_weight_shape = (3, 3, 4, 4)
        super()._init_layers()

    def init(self, key):
        keys = jax.random.split(key, 8)
        p = super().init(keys[-1])
        p['feature_convs'] = {str(i): m.init(keys[i])
                              for i, m in enumerate(self.feature_convs)}
        p['com_conv'] = self.com_conv.init(keys[4])
        p['align_offset'] = self.align_offset.init(keys[5])
        p['align_weight'] = jax.random.normal(
            keys[6], self.align_weight_shape) * 0.01
        return p

    def fuse(self, params, x):
        from ....ops.deform_conv import deform_conv2d
        c = self.in_channels
        ori = x[..., :c]
        lwh = self.feature_convs[0](params['feature_convs']['0'],
                                    x[..., c:2 * c])
        lhh = self.feature_convs[1](params['feature_convs']['1'],
                                    x[..., 2 * c:])
        fused = ori + (lwh + lhh) * ori
        off = self.com_conv(params['com_conv'], fused)      # (R, h, w, 4)
        offsets = self.align_offset(params['align_offset'], jnp.exp(off))
        off = jax.nn.relu(deform_conv2d(
            off, offsets, params['align_weight'], padding=1,
            deform_groups=4))
        fused = fused + self.feature_convs[2](
            params['feature_convs']['2'], off)
        return self.feature_convs[3](params['feature_convs']['3'], fused)

    def __call__(self, params, x):
        return super().__call__(params, self.fuse(params, x))


@HEADS.register_module()
class MultiRoIsBBoxHeadDeform(MultiBBoxHeadDeform):
    def __init__(self, fc_out_channels=1024, *args, **kwargs):
        super().__init__(*args, **_rois_kwargs(kwargs, fc_out_channels))


@HEADS.register_module()
class AttRoIsBBoxHead(ConvFCBBoxHead):
    """Cross-RoI attention refinement: each RoI's spatial signature attends
    over all RoIs in the batch (ref: attrois_bbox_head.py:12-269)."""

    num_roi_groups = 1

    def _init_layers(self):
        super()._init_layers()
        # the reference uses conv_out_channels here, which equals the roi
        # feature channels in its configs; keyed on in_channels for clarity
        self.channel_reduction = ConvModule(
            self.in_channels, 1, 1, act_cfg='relu', weight_init='xavier')
        self.fc1 = Linear(self.roi_feat_area, self.roi_feat_area)

    def init(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        p = super().init(k3)
        p['channel_reduction'] = self.channel_reduction.init(k1)
        p['fc1'] = self.fc1.init(k2)
        return p

    def __call__(self, params, x):
        r, h, w, _ = x.shape
        rdt = self.channel_reduction(params['channel_reduction'],
                                     x).reshape(r, -1)       # (R, hw)
        rtf = jax.nn.softmax(self.fc1(params['fc1'], rdt), -1)
        att = jax.nn.softmax(rtf @ rdt.T, -1)                # (R, R)
        ref = att @ rdt                                      # (R, hw)
        x = x + ref.reshape(r, h, w, 1)
        return super().__call__(params, x)
