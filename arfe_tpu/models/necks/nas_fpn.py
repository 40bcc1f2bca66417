"""NAS-FPN neck (ref: mmdet/models/necks/nas_fpn.py:8-146).

The searched 7-merge-cell topology repeated ``stack_times``.
"""
from __future__ import annotations

import jax

from ...ops.merge_cells import GlobalPoolingCell, SumCell
from ...registry import NECKS
from ..layers import ConvModule, Module, max_pool2d


@NECKS.register_module()
class NASFPN(Module):
    def __init__(self, in_channels, out_channels, num_outs, stack_times,
                 start_level=0, end_level=-1, add_extra_convs=False,
                 norm_cfg=None):
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.num_ins = len(in_channels)
        self.num_outs = num_outs
        self.stack_times = stack_times
        if end_level == -1:
            self.backbone_end_level = self.num_ins
        else:
            self.backbone_end_level = end_level
        self.start_level = start_level
        self.lateral_convs = [
            ConvModule(in_channels[i], out_channels, 1, norm_cfg=norm_cfg,
                       act_cfg=None, weight_init='xavier')
            for i in range(start_level, self.backbone_end_level)]
        extra_levels = num_outs - self.backbone_end_level + start_level
        self.extra_downsamples = [
            ConvModule(out_channels, out_channels, 1, norm_cfg=norm_cfg,
                       act_cfg=None, weight_init='xavier')
            for _ in range(extra_levels)]
        self.fpn_stages = []
        for _ in range(stack_times):
            stage = {
                'gp_64_4': GlobalPoolingCell(out_channels, out_channels,
                                             out_norm_cfg=norm_cfg),
                'sum_44_4': SumCell(out_channels, out_channels,
                                    out_norm_cfg=norm_cfg),
                'sum_43_3': SumCell(out_channels, out_channels,
                                    out_norm_cfg=norm_cfg),
                'sum_34_4': SumCell(out_channels, out_channels,
                                    out_norm_cfg=norm_cfg),
                'gp_43_5': GlobalPoolingCell(with_out_conv=False),
                'sum_55_5': SumCell(out_channels, out_channels,
                                    out_norm_cfg=norm_cfg),
                'gp_54_7': GlobalPoolingCell(with_out_conv=False),
                'sum_77_7': SumCell(out_channels, out_channels,
                                    out_norm_cfg=norm_cfg),
                'gp_75_6': GlobalPoolingCell(out_channels, out_channels,
                                             out_norm_cfg=norm_cfg),
            }
            self.fpn_stages.append(stage)

    def init(self, key):
        n = len(self.lateral_convs) + len(self.extra_downsamples) \
            + 9 * self.stack_times
        keys = jax.random.split(key, n)
        it = iter(keys)
        p = {'lateral_convs': {str(i): m.init(next(it))
                               for i, m in enumerate(self.lateral_convs)},
             'extra_downsamples': {
                 str(i): {'0': m.init(next(it))}
                 for i, m in enumerate(self.extra_downsamples)},
             'fpn_stages': {}}
        for s, stage in enumerate(self.fpn_stages):
            p['fpn_stages'][str(s)] = {k: cell.init(next(it))
                                       for k, cell in stage.items()}
        return p

    def __call__(self, params, inputs):
        feats = [m(params['lateral_convs'][str(i)],
                   inputs[i + self.start_level])
                 for i, m in enumerate(self.lateral_convs)]
        for i, m in enumerate(self.extra_downsamples):
            y = m(params['extra_downsamples'][str(i)]['0'], feats[-1])
            feats.append(max_pool2d(y, 2, 2))
        p3, p4, p5, p6, p7 = feats
        for s, stage in enumerate(self.fpn_stages):
            sp = params['fpn_stages'][str(s)]

            def size(t):
                return (t.shape[1], t.shape[2])

            p4_1 = stage['gp_64_4'](sp['gp_64_4'], p6, p4, out_size=size(p4))
            p4_2 = stage['sum_44_4'](sp['sum_44_4'], p4_1, p4,
                                     out_size=size(p4))
            p3 = stage['sum_43_3'](sp['sum_43_3'], p4_2, p3,
                                   out_size=size(p3))
            p4 = stage['sum_34_4'](sp['sum_34_4'], p3, p4_2,
                                   out_size=size(p4))
            p5_tmp = stage['gp_43_5'](sp['gp_43_5'], p4, p3,
                                      out_size=size(p5))
            p5 = stage['sum_55_5'](sp['sum_55_5'], p5, p5_tmp,
                                   out_size=size(p5))
            p7_tmp = stage['gp_54_7'](sp['gp_54_7'], p5, p4_2,
                                      out_size=size(p7))
            p7 = stage['sum_77_7'](sp['sum_77_7'], p7, p7_tmp,
                                   out_size=size(p7))
            p6 = stage['gp_75_6'](sp['gp_75_6'], p7, p5, out_size=size(p6))
        return p3, p4, p5, p6, p7
