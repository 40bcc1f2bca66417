"""HTC mask head (ref:
mmdet/models/roi_heads/mask_heads/htc_mask_head.py:8-43): FCNMaskHead with a
1x1 ``conv_res`` fusing the previous stage's mask features (mask information
flow)."""
from __future__ import annotations

import jax

from ....registry import HEADS
from ...layers import ConvModule
from .fcn_mask_head import FCNMaskHead


@HEADS.register_module()
class HTCMaskHead(FCNMaskHead):
    def __init__(self, with_conv_res=True, *args, **kwargs):
        self.with_conv_res = with_conv_res
        super().__init__(*args, **kwargs)
        if self.with_conv_res:
            self.conv_res = ConvModule(self.conv_out_channels,
                                       self.conv_out_channels, 1,
                                       act_cfg='relu')

    def init(self, key):
        k1, k2 = jax.random.split(key)
        p = super().init(k1)
        if self.with_conv_res:
            p['conv_res'] = self.conv_res.init(k2)
        return p

    def __call__(self, params, x, res_feat=None, return_logits=True,
                 return_feat=True):
        """(ref :26-43). Returns logits and/or the pre-upsample feature."""
        if res_feat is not None:
            assert self.with_conv_res
            x = x + self.conv_res(params['conv_res'], res_feat)
        for i, m in enumerate(self.convs):
            x = m(params['convs'][str(i)], x)
        res_feat = x
        outs = []
        if return_logits:
            y = x
            if self.upsample_method == 'deconv':
                y = jax.nn.relu(self.upsample(params['upsample'], y))
            outs.append(self.conv_logits(params['conv_logits'], y))
        if return_feat:
            outs.append(res_feat)
        return tuple(outs) if len(outs) > 1 else outs[0]
