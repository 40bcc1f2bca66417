"""Feature Pyramid Network neck (NHWC, functional).

TPU-native counterpart of ref: mmdet/models/necks/fpn.py:11-226. Parameter
tree mirrors the reference state_dict: ``lateral_convs.{i}.conv``,
``fpn_convs.{i}.conv`` (extra stride-2 convs continue the fpn_convs index).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ...registry import NECKS
from ..layers import ConvModule, Module, max_pool2d, resize_nearest


@NECKS.register_module()
class FPN(Module):
    def __init__(self, in_channels, out_channels, num_outs, start_level=0,
                 end_level=-1, add_extra_convs=False,
                 extra_convs_on_inputs=True, relu_before_extra_convs=False,
                 no_norm_on_lateral=False, conv_cfg=None, norm_cfg=None,
                 act_cfg=None, upsample_cfg=None):
        assert isinstance(in_channels, (list, tuple))
        self.in_channels = list(in_channels)
        self.out_channels = out_channels
        self.num_ins = len(in_channels)
        self.num_outs = num_outs
        self.relu_before_extra_convs = relu_before_extra_convs
        self.no_norm_on_lateral = no_norm_on_lateral
        self.upsample_cfg = dict(upsample_cfg or {'mode': 'nearest'})

        if end_level == -1:
            self.backbone_end_level = self.num_ins
            assert num_outs >= self.num_ins - start_level
        else:
            self.backbone_end_level = end_level
            assert end_level <= len(in_channels)
            assert num_outs == end_level - start_level
        self.start_level = start_level
        self.end_level = end_level
        assert isinstance(add_extra_convs, (str, bool))
        if add_extra_convs is True:
            add_extra_convs = 'on_input' if extra_convs_on_inputs \
                else 'on_output'
        self.add_extra_convs = add_extra_convs

        act = None if act_cfg is None else act_cfg.get('type', 'relu').lower()
        self.lateral_convs = []
        self.fpn_convs = []
        for i in range(self.start_level, self.backbone_end_level):
            self.lateral_convs.append(ConvModule(
                in_channels[i], out_channels, 1,
                norm_cfg=None if no_norm_on_lateral else norm_cfg,
                act_cfg=act, weight_init='xavier'))
            self.fpn_convs.append(ConvModule(
                out_channels, out_channels, 3, padding=1, norm_cfg=norm_cfg,
                act_cfg=act, weight_init='xavier'))
        extra_levels = num_outs - self.backbone_end_level + self.start_level
        if self.add_extra_convs and extra_levels >= 1:
            for i in range(extra_levels):
                in_ch = (self.in_channels[self.backbone_end_level - 1]
                         if i == 0 and self.add_extra_convs == 'on_input'
                         else out_channels)
                self.fpn_convs.append(ConvModule(
                    in_ch, out_channels, 3, stride=2, padding=1,
                    norm_cfg=norm_cfg, act_cfg=act, weight_init='xavier'))

    # -- subclass hooks (used by the experimental ARFE FPN variants) --

    def extra_module_groups(self):
        """dict of name -> list[Module]; initialized under that name."""
        return {}

    def _pre_topdown(self, params, laterals, inputs):
        return laterals

    def _post_topdown(self, params, laterals, inputs):
        return laterals

    def init(self, key):
        extra = self.extra_module_groups()
        n_extra = sum(len(v) for v in extra.values())
        keys = jax.random.split(key, len(self.lateral_convs)
                                + len(self.fpn_convs) + max(n_extra, 1))
        p = {
            'lateral_convs': {str(i): m.init(keys[i])
                              for i, m in enumerate(self.lateral_convs)},
            'fpn_convs': {str(i): m.init(keys[len(self.lateral_convs) + i])
                          for i, m in enumerate(self.fpn_convs)},
        }
        it = iter(keys[len(self.lateral_convs) + len(self.fpn_convs):])
        for name, mods in extra.items():
            p[name] = {str(i): m.init(next(it))
                       for i, m in enumerate(mods)}
        return p

    def _laterals(self, params, inputs):
        lp = params['lateral_convs']
        return [m(lp[str(i)], inputs[i + self.start_level])
                for i, m in enumerate(self.lateral_convs)]

    def _topdown(self, params, laterals, inputs):
        for i in range(len(laterals) - 1, 0, -1):
            tgt = laterals[i - 1].shape[1:3]
            laterals[i - 1] = laterals[i - 1] + resize_nearest(
                laterals[i], tgt)
        return laterals

    def __call__(self, params, inputs):
        assert len(inputs) == len(self.in_channels)
        laterals = self._laterals(params, inputs)
        laterals = self._pre_topdown(params, laterals, inputs)
        laterals = self._topdown(params, laterals, inputs)
        laterals = self._post_topdown(params, laterals, inputs)
        return self._build_outputs(params, laterals, inputs)

    def _build_outputs(self, params, laterals, inputs):
        fp = params['fpn_convs']
        used = len(laterals)
        outs = [self.fpn_convs[i](fp[str(i)], laterals[i])
                for i in range(used)]
        if self.num_outs > used:
            if not self.add_extra_convs:
                # e.g. Faster R-CNN: P6 = stride-2 subsample of P5
                # (ref: fpn.py:201-204 — max_pool2d(outs[-1], 1, stride=2))
                for _ in range(self.num_outs - used):
                    outs.append(max_pool2d(outs[-1], 1, stride=2))
            else:
                if self.add_extra_convs == 'on_input':
                    extra_source = inputs[self.backbone_end_level - 1]
                elif self.add_extra_convs == 'on_lateral':
                    extra_source = laterals[-1]
                elif self.add_extra_convs == 'on_output':
                    extra_source = outs[-1]
                else:
                    raise NotImplementedError
                outs.append(self.fpn_convs[used](fp[str(used)], extra_source))
                for i in range(used + 1, self.num_outs):
                    src = jax.nn.relu(outs[-1]) \
                        if self.relu_before_extra_convs else outs[-1]
                    outs.append(self.fpn_convs[i](fp[str(i)], src))
        return tuple(outs)
