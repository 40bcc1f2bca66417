"""Shared ResNet stage applied to RoI features (C4-style two-stage models)
(ref: mmdet/models/roi_heads/shared_heads/res_layer.py:12-72).

Runs ResNet stage ``stage`` (default layer4/res5) on per-RoI feature crops:
(R, 14, 14, 1024) -> (R, 7, 7, 2048) for depth 50. Param tree is named
``layer{stage+1}.{block}`` to match the torch state_dict.
"""
from __future__ import annotations

import jax

from ....registry import HEADS
from ...backbones.resnet import ResNet
from ...layers import Module


@HEADS.register_module()
class ResLayer(Module):
    def __init__(self, depth, stage=3, stride=2, dilation=1,
                 style='pytorch', norm_cfg=None, norm_eval=True,
                 with_cp=False, dcn=None, base_channels=64):
        block_cls, stage_blocks = ResNet.arch_settings[depth]
        self.stage = stage
        self.norm_eval = norm_eval
        planes = base_channels * 2 ** stage
        inplanes = base_channels * 2 ** (stage - 1) * block_cls.expansion
        self.out_channels = planes * block_cls.expansion
        blocks = []
        for j in range(stage_blocks[stage]):
            s = stride if j == 0 else 1
            need_ds = j == 0 and (s != 1
                                  or inplanes != planes * block_cls.expansion)
            kw = dict(dcn=dcn) if block_cls.expansion == 4 else {}
            blocks.append(block_cls(inplanes, planes, stride=s,
                                    dilation=dilation, downsample=need_ds,
                                    style=style, **kw))
            inplanes = planes * block_cls.expansion
        self.blocks = blocks

    def init(self, key):
        keys = jax.random.split(key, len(self.blocks))
        return {f'layer{self.stage + 1}': {
            str(j): blk.init(keys[j]) for j, blk in enumerate(self.blocks)}}

    def __call__(self, params, x):
        lp = params[f'layer{self.stage + 1}']
        for j, blk in enumerate(self.blocks):
            x = blk(lp[str(j)], x)
        return x
