"""ResNet / ResNetV1d backbones (NHWC, functional).

TPU-native counterpart of ref: mmdet/models/backbones/resnet.py:350-706
(ResNet) and its BasicBlock/Bottleneck (ref: resnet.py:14-250). Parameter
tree mirrors torch state_dict naming (``conv1``, ``bn1``, ``layer{1..4}.{i}``,
``downsample.0/1``) so converted torchvision / mmdet checkpoints load 1:1.

Semantics matched to the reference:
- ``style='pytorch'``: stride-2 on the 3x3 conv2; ``style='caffe'``: stride-2
  on the first 1x1 conv (ref: resnet.py:121-250).
- ``frozen_stages``: parameters of stem + stages <= k get stop_gradient
  (ref: resnet.py:616-633 freezes via requires_grad=False + eval()).
- ``norm_eval=True``: BN always uses running stats — the default BatchNorm
  here (ref: resnet.py:700-706).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ...registry import BACKBONES
from ..layers import BatchNorm, Conv2d, Module, avg_pool2d, max_pool2d, \
    stop_gradient_tree


class BasicBlock(Module):
    expansion = 1

    def __init__(self, inplanes, planes, stride=1, dilation=1,
                 downsample=False, style='pytorch'):
        self.conv1 = Conv2d(inplanes, planes, 3, stride=stride,
                            padding=dilation, dilation=dilation, bias=False,
                            weight_init='kaiming_fan_out')
        self.bn1 = BatchNorm(planes)
        self.conv2 = Conv2d(planes, planes, 3, padding=1, bias=False,
                            weight_init='kaiming_fan_out')
        self.bn2 = BatchNorm(planes)
        self.has_downsample = downsample
        if downsample:
            self.ds_conv = Conv2d(inplanes, planes * self.expansion, 1,
                                  stride=stride, bias=False,
                                  weight_init='kaiming_fan_out')
            self.ds_bn = BatchNorm(planes * self.expansion)

    def init(self, key):
        keys = jax.random.split(key, 3)
        p = {'conv1': self.conv1.init(keys[0]), 'bn1': self.bn1.init(keys[0]),
             'conv2': self.conv2.init(keys[1]), 'bn2': self.bn2.init(keys[1])}
        if self.has_downsample:
            p['downsample'] = {'0': self.ds_conv.init(keys[2]),
                               '1': self.ds_bn.init(keys[2])}
        return p

    def __call__(self, params, x):
        identity = x
        out = jax.nn.relu(self.bn1(params['bn1'],
                                   self.conv1(params['conv1'], x)))
        out = self.bn2(params['bn2'], self.conv2(params['conv2'], out))
        if self.has_downsample:
            identity = self.ds_bn(params['downsample']['1'],
                                  self.ds_conv(params['downsample']['0'], x))
        return jax.nn.relu(out + identity)


def build_plugin(cfg, in_channels):
    """(ref: ops/plugin.py:13-41). Returns (name, module)."""
    from ...ops.attention_ops import ContextBlock, GeneralizedAttention
    from ...ops.non_local import NonLocal2D
    plugin_cfg = {
        'ContextBlock': ('context_block', ContextBlock),
        'GeneralizedAttention': ('gen_attention_block',
                                 GeneralizedAttention),
        'NonLocal2D': ('nonlocal_block', NonLocal2D),
    }
    cfg = dict(cfg)
    layer_type = cfg.pop('type')
    postfix = cfg.pop('postfix', '')
    abbr, cls = plugin_cfg[layer_type]
    return abbr + str(postfix), cls(in_channels, **cfg)


class Bottleneck(Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, dilation=1,
                 downsample=False, style='pytorch', avg_down=False,
                 dcn=None, plugins=None, rfp=None):
        self.rfp = rfp
        if rfp:
            # DetectoRS recursive-feedback conv, zero-init
            # (ref: resnet.py:240-249)
            self.rfp_conv = Conv2d(rfp, planes * self.expansion, 1,
                                   bias=True)
        if style == 'pytorch':
            conv1_stride, conv2_stride = 1, stride
        else:  # caffe
            conv1_stride, conv2_stride = stride, 1
        self.conv1 = Conv2d(inplanes, planes, 1, stride=conv1_stride,
                            bias=False, weight_init='kaiming_fan_out')
        self.bn1 = BatchNorm(planes)
        if dcn is not None:
            # dcn-enabled stage (ref: resnet.py:350-706 dcn plugin hooks)
            from ...ops.deform_conv import DeformConv2d
            self.conv2 = DeformConv2d(
                planes, planes, 3, stride=conv2_stride, padding=dilation,
                dilation=dilation, bias=False,
                deform_groups=dcn.get('deform_groups', 1),
                modulated=dcn.get('type') == 'DCNv2'
                or dcn.get('modulated', False))
        else:
            self.conv2 = Conv2d(planes, planes, 3, stride=conv2_stride,
                                padding=dilation, dilation=dilation,
                                bias=False, weight_init='kaiming_fan_out')
        self.bn2 = BatchNorm(planes)
        self.conv3 = Conv2d(planes, planes * self.expansion, 1, bias=False,
                            weight_init='kaiming_fan_out')
        self.bn3 = BatchNorm(planes * self.expansion)
        self.has_downsample = downsample
        self.stride = stride
        self.avg_down = avg_down
        if downsample:
            ds_stride = 1 if avg_down else stride
            self.ds_conv = Conv2d(inplanes, planes * self.expansion, 1,
                                  stride=ds_stride, bias=False,
                                  weight_init='kaiming_fan_out')
            self.ds_bn = BatchNorm(planes * self.expansion)
        # per-position plugin hooks (ref: resnet.py:159-279)
        self.plugins = {'after_conv1': [], 'after_conv2': [],
                        'after_conv3': []}
        if plugins:
            chans = {'after_conv1': planes, 'after_conv2': planes,
                     'after_conv3': planes * self.expansion}
            for p in plugins:
                pos = p['position']
                self.plugins[pos].append(
                    build_plugin(p['cfg'], chans[pos]))

    def init(self, key):
        n_plug = sum(len(v) for v in self.plugins.values())
        keys = jax.random.split(key, 4 + n_plug)
        p = {'conv1': self.conv1.init(keys[0]), 'bn1': self.bn1.init(keys[0]),
             'conv2': self.conv2.init(keys[1]), 'bn2': self.bn2.init(keys[1]),
             'conv3': self.conv3.init(keys[2]), 'bn3': self.bn3.init(keys[2])}
        if self.has_downsample:
            p['downsample'] = {'0': self.ds_conv.init(keys[3]),
                               '1': self.ds_bn.init(keys[3])}
        i = 4
        for pos in ('after_conv1', 'after_conv2', 'after_conv3'):
            for name, mod in self.plugins[pos]:
                p[name] = mod.init(keys[i])
                i += 1
        if self.rfp:
            p['rfp_conv'] = jax.tree_util.tree_map(
                jnp.zeros_like, self.rfp_conv.init(keys[0]))
        return p

    def _plugin(self, params, pos, x):
        for name, mod in self.plugins[pos]:
            x = mod(params[name], x)
        return x

    def __call__(self, params, x, rfp_feat=None):
        identity = x
        out = jax.nn.relu(self.bn1(params['bn1'],
                                   self.conv1(params['conv1'], x)))
        out = self._plugin(params, 'after_conv1', out)
        out = jax.nn.relu(self.bn2(params['bn2'],
                                   self.conv2(params['conv2'], out)))
        out = self._plugin(params, 'after_conv2', out)
        out = self.bn3(params['bn3'], self.conv3(params['conv3'], out))
        out = self._plugin(params, 'after_conv3', out)
        if self.has_downsample:
            ds_in = x
            if self.avg_down and self.stride > 1:
                ds_in = avg_pool2d(x, self.stride, self.stride)
            identity = self.ds_bn(params['downsample']['1'],
                                  self.ds_conv(params['downsample']['0'],
                                               ds_in))
        out = out + identity
        if self.rfp and rfp_feat is not None:
            # (ref: resnet.py:340-342)
            out = out + self.rfp_conv(params['rfp_conv'], rfp_feat)
        return jax.nn.relu(out)


@BACKBONES.register_module()
class ResNet(Module):
    """ResNet backbone (ref: resnet.py:350-706)."""

    arch_settings = {
        18: (BasicBlock, (2, 2, 2, 2)),
        34: (BasicBlock, (3, 4, 6, 3)),
        50: (Bottleneck, (3, 4, 6, 3)),
        101: (Bottleneck, (3, 4, 23, 3)),
        152: (Bottleneck, (3, 8, 36, 3)),
    }

    def __init__(self, depth, in_channels=3, num_stages=4,
                 strides=(1, 2, 2, 2), dilations=(1, 1, 1, 1),
                 out_indices=(0, 1, 2, 3), style='pytorch', deep_stem=False,
                 avg_down=False, frozen_stages=-1, norm_cfg=None,
                 norm_eval=True, base_channels=64, zero_init_residual=True,
                 dcn=None, stage_with_dcn=(False, False, False, False),
                 gcb=None, stage_with_gcb=(False, False, False, False),
                 gen_attention=None, stage_with_gen_attention=((), (), (), ()),
                 plugins=None, with_cp=False, rfp=None,
                 stage_with_rfp=(False, True, True, True),
                 stem_space_to_depth=False):
        self.rfp = rfp
        self.stage_with_rfp = stage_with_rfp
        if depth not in self.arch_settings:
            raise KeyError(f'invalid depth {depth} for resnet')
        block_cls, stage_blocks = self.arch_settings[depth]
        self.depth = depth
        self.num_stages = num_stages
        self.out_indices = tuple(out_indices)
        self.frozen_stages = frozen_stages
        self.deep_stem = deep_stem
        # MLPerf-style space-to-depth stem: conv1 7x7/s2 on C-channel input
        # runs the MXU at C/128 input utilization; blocking the image 2x2
        # into 4C channels and convolving with the zero-padded reshaped
        # kernel is bit-equivalent and ~4x denser. Inference-time transform
        # of the SAME stored weights (checkpoint-compatible).
        self.stem_space_to_depth = stem_space_to_depth and not deep_stem
        self.style = style
        self.block_cls = block_cls

        if deep_stem:
            mid = base_channels // 2
            self.stem = [
                Conv2d(in_channels, mid, 3, stride=2, padding=1, bias=False,
                       weight_init='kaiming_fan_out'), BatchNorm(mid),
                Conv2d(mid, mid, 3, padding=1, bias=False,
                       weight_init='kaiming_fan_out'), BatchNorm(mid),
                Conv2d(mid, base_channels, 3, padding=1, bias=False,
                       weight_init='kaiming_fan_out'),
                BatchNorm(base_channels),
            ]
        else:
            self.conv1 = Conv2d(in_channels, base_channels, 7, stride=2,
                                padding=3, bias=False,
                                weight_init='kaiming_fan_out')
            self.bn1 = BatchNorm(base_channels)

        self.layers = []
        inplanes = base_channels
        self.out_channels = []
        for i in range(num_stages):
            planes = base_channels * 2 ** i
            stride, dilation = strides[i], dilations[i]
            stage_dcn = dcn if (dcn is not None
                                and stage_with_dcn[i]) else None
            stage_plugins = self._stage_plugins(plugins, i) \
                if plugins is not None else []
            blocks = []
            for j in range(stage_blocks[i]):
                s = stride if j == 0 else 1
                need_ds = j == 0 and (
                    s != 1 or inplanes != planes * block_cls.expansion)
                block_plugins = list(stage_plugins)
                # mmdet-1.x-style gcb / gen_attention shortcuts
                # (ref: the reference's configs use the plugins schema;
                # these args keep 1.x-style ARFE configs loading)
                if gcb is not None and stage_with_gcb[i]:
                    block_plugins.append(dict(
                        cfg=dict(type='ContextBlock', **gcb),
                        position='after_conv3'))
                if gen_attention is not None and \
                        j in stage_with_gen_attention[i]:
                    block_plugins.append(dict(
                        cfg=dict(type='GeneralizedAttention',
                                 **gen_attention),
                        position='after_conv2'))
                stage_rfp = rfp if (rfp and stage_with_rfp[i]) else None
                blocks.append(block_cls(inplanes, planes, stride=s,
                                        dilation=dilation, downsample=need_ds,
                                        style=style, avg_down=avg_down,
                                        dcn=stage_dcn,
                                        plugins=block_plugins or None,
                                        rfp=stage_rfp)
                              if block_cls is Bottleneck else
                              block_cls(inplanes, planes, stride=s,
                                        dilation=dilation, downsample=need_ds,
                                        style=style))
                inplanes = planes * block_cls.expansion
            self.layers.append(blocks)
            self.out_channels.append(planes * block_cls.expansion)

    @staticmethod
    def _stage_plugins(plugins, stage_idx):
        """Filter plugins for one stage (ref: resnet.py:501-560)."""
        out = []
        for p in plugins:
            p = dict(p)
            stages = p.pop('stages', None)
            if stages is None or stages[stage_idx]:
                out.append(p)
        return out

    def init(self, key):
        params = {}
        nstem = len(self.stem) if self.deep_stem else 1
        keys = jax.random.split(key, self.num_stages + nstem)
        if self.deep_stem:
            # torch names the stem as a Sequential: stem.0 conv, stem.1 bn, …
            params['stem'] = {str(i): m.init(keys[i // 2])
                              for i, m in enumerate(self.stem)}
        else:
            params['conv1'] = self.conv1.init(keys[0])
            params['bn1'] = self.bn1.init(keys[0])
        for i, blocks in enumerate(self.layers):
            bkeys = jax.random.split(keys[nstem + i], len(blocks))
            params[f'layer{i + 1}'] = {
                str(j): blk.init(bkeys[j]) for j, blk in enumerate(blocks)}
        return params

    def _maybe_freeze(self, params):
        """Apply stop_gradient to frozen subtrees
        (ref: resnet.py:616-633)."""
        if self.frozen_stages < 0:
            return params
        params = dict(params)
        if self.frozen_stages >= 0:
            if self.deep_stem:
                params['stem'] = stop_gradient_tree(params['stem'])
            else:
                params['conv1'] = stop_gradient_tree(params['conv1'])
                params['bn1'] = stop_gradient_tree(params['bn1'])
        for i in range(1, self.frozen_stages + 1):
            params[f'layer{i}'] = stop_gradient_tree(params[f'layer{i}'])
        return params

    def _s2d_conv1(self, p, x):
        """conv1 as a stride-1 4x4 conv over the 2x2-blocked image.

        The 7x7 kernel is zero-padded to 8x8 (one row/col at top/left, so
        padded tap k maps to spatial offset k-4) and reshaped to
        (4, 4, 4*C, out) with (s_i, s_j, c) channel order matching the
        input blocking; original pad 3 becomes asymmetric block pad
        (2, 1). Bit-equivalent to the standard stem for even H, W."""
        w = p['weight'].astype(x.dtype)             # (7, 7, C, O) HWIO
        c, o = w.shape[2], w.shape[3]
        wp = jnp.pad(w, ((1, 0), (1, 0), (0, 0), (0, 0)))
        wb = wp.reshape(4, 2, 4, 2, c, o).transpose(0, 2, 1, 3, 4, 5)
        wb = wb.reshape(4, 4, 4 * c, o)
        n, h, ww = x.shape[0], x.shape[1], x.shape[2]
        xb = x.reshape(n, h // 2, 2, ww // 2, 2, c)
        xb = xb.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, ww // 2,
                                                    4 * c)
        out = jax.lax.conv_general_dilated(
            xb, wb, window_strides=(1, 1), padding=((2, 1), (2, 1)),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        if 'bias' in p:
            out = out + p['bias'].astype(out.dtype)
        return out

    def __call__(self, params, x):
        params = self._maybe_freeze(params)
        if self.deep_stem:
            sp = params['stem']
            for i in range(0, len(self.stem), 2):
                x = self.stem[i](sp[str(i)], x)
                x = jax.nn.relu(self.stem[i + 1](sp[str(i + 1)], x))
        elif self.stem_space_to_depth:
            x = jax.nn.relu(self.bn1(params['bn1'],
                                     self._s2d_conv1(params['conv1'], x)))
        else:
            x = jax.nn.relu(self.bn1(params['bn1'],
                                     self.conv1(params['conv1'], x)))
        x = max_pool2d(x, 3, stride=2, padding=1)
        outs = []
        for i, blocks in enumerate(self.layers):
            lp = params[f'layer{i + 1}']
            for j, blk in enumerate(blocks):
                x = blk(lp[str(j)], x)
            if i in self.out_indices:
                outs.append(x)
        return tuple(outs)

    def rfp_forward(self, params, x, rfp_feats):
        """DetectoRS recursive pass (ref: resnet.py rfp_forward): stage i
        blocks receive rfp_feats[i] when stage_with_rfp[i]."""
        params = self._maybe_freeze(params)
        if self.deep_stem:
            sp = params['stem']
            for i in range(0, len(self.stem), 2):
                x = self.stem[i](sp[str(i)], x)
                x = jax.nn.relu(self.stem[i + 1](sp[str(i + 1)], x))
        elif self.stem_space_to_depth:
            x = jax.nn.relu(self.bn1(params['bn1'],
                                     self._s2d_conv1(params['conv1'], x)))
        else:
            x = jax.nn.relu(self.bn1(params['bn1'],
                                     self.conv1(params['conv1'], x)))
        x = max_pool2d(x, 3, stride=2, padding=1)
        outs = []
        for i, blocks in enumerate(self.layers):
            lp = params[f'layer{i + 1}']
            feat = rfp_feats[i] if self.stage_with_rfp[i] else None
            for j, blk in enumerate(blocks):
                x = blk(lp[str(j)], x, rfp_feat=feat) \
                    if getattr(blk, 'rfp', None) else blk(lp[str(j)], x)
            if i in self.out_indices:
                outs.append(x)
        return tuple(outs)


@BACKBONES.register_module()
class ResNetV1d(ResNet):
    """ResNet with deep stem + avg-down shortcuts
    (ref: mmdet/models/backbones/resnet.py:709-720)."""

    def __init__(self, **kwargs):
        super().__init__(deep_stem=True, avg_down=True, **kwargs)
