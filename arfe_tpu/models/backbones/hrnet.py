"""HRNet backbone (ref: mmdet/models/backbones/hrnet.py:12-577).

Parallel multi-resolution branches with repeated fuse/exchange modules.
Param tree mirrors the torch state_dict:
``conv1/bn1/conv2/bn2``, ``layer1.{j}``, ``transition{s}.{i}[.{k}].{0,1}``,
``stage{s}.{m}.branches.{i}.{j}`` and ``stage{s}.{m}.fuse_layers.{i}.{j}``.

The reference's quirk of feeding ``y_list[-1]`` into any non-None
transition (not just new branches) is reproduced exactly.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ...registry import BACKBONES
from ..layers import BatchNorm, Conv2d, Module, stop_gradient_tree
from .resnet import BasicBlock, Bottleneck


def _upsample_nearest(x, factor):
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :],
                         (b, h, factor, w, factor, c))
    return x.reshape(b, h * factor, w * factor, c)


class ConvBN(Module):
    """Sequential(conv, bn[, relu]) with torch index naming 0/1."""

    def __init__(self, cin, cout, k, stride=1, padding=0, relu=False):
        self.conv = Conv2d(cin, cout, k, stride=stride, padding=padding,
                           bias=False, weight_init='kaiming_fan_out')
        self.bn = BatchNorm(cout)
        self.relu = relu

    def init(self, key):
        return {'0': self.conv.init(key), '1': self.bn.init(key)}

    def __call__(self, params, x):
        y = self.bn(params['1'], self.conv(params['0'], x))
        return jax.nn.relu(y) if self.relu else y


class HRModule(Module):
    """(ref: hrnet.py:12-195)."""

    def __init__(self, num_branches, block, num_blocks, in_channels,
                 num_channels, multiscale_output=True):
        self.num_branches = num_branches
        self.multiscale_output = multiscale_output
        self.in_channels = list(in_channels)
        self.branches = []
        for i in range(num_branches):
            blocks = []
            stride = 1
            need_ds = (stride != 1 or self.in_channels[i] !=
                       num_channels[i] * block.expansion)
            blocks.append(block(self.in_channels[i], num_channels[i],
                                stride=stride, downsample=need_ds))
            self.in_channels[i] = num_channels[i] * block.expansion
            for _ in range(1, num_blocks[i]):
                blocks.append(block(self.in_channels[i], num_channels[i]))
            self.branches.append(blocks)

        # fuse layers (ref: hrnet.py:117-177)
        self.fuse_layers = []
        ch = self.in_channels
        n_out = num_branches if multiscale_output else 1
        if num_branches > 1:
            for i in range(n_out):
                row = []
                for j in range(num_branches):
                    if j > i:
                        row.append(ConvBN(ch[j], ch[i], 1))
                    elif j == i:
                        row.append(None)
                    else:
                        downs = []
                        for k in range(i - j):
                            if k == i - j - 1:
                                downs.append(ConvBN(ch[j], ch[i], 3,
                                                    stride=2, padding=1))
                            else:
                                downs.append(ConvBN(ch[j], ch[j], 3,
                                                    stride=2, padding=1,
                                                    relu=True))
                        row.append(downs)
                self.fuse_layers.append(row)

    def init(self, key):
        nb = sum(len(b) for b in self.branches)
        nf = sum(1 for row in self.fuse_layers for f in row
                 if f is not None)
        keys = jax.random.split(key, max(nb + nf + 1, 2))
        it = iter(keys)
        p = {'branches': {}, 'fuse_layers': {}}
        for i, blocks in enumerate(self.branches):
            p['branches'][str(i)] = {str(j): blk.init(next(it))
                                     for j, blk in enumerate(blocks)}
        for i, row in enumerate(self.fuse_layers):
            rp = {}
            for j, f in enumerate(row):
                if f is None:
                    continue
                if isinstance(f, list):
                    k = next(it)
                    sub = jax.random.split(k, max(len(f), 2))
                    rp[str(j)] = {str(m): mod.init(sub[m])
                                  for m, mod in enumerate(f)}
                else:
                    rp[str(j)] = f.init(next(it))
            p['fuse_layers'][str(i)] = rp
        return p

    def __call__(self, params, xs):
        xs = [self._branch(params['branches'][str(i)], self.branches[i], x)
              for i, x in enumerate(xs)]
        if self.num_branches == 1:
            return [xs[0]]
        outs = []
        for i, row in enumerate(self.fuse_layers):
            y = 0.
            for j, f in enumerate(row):
                if f is None:
                    y = y + xs[j]
                elif isinstance(f, list):
                    t = xs[j]
                    fp = params['fuse_layers'][str(i)][str(j)]
                    for m, mod in enumerate(f):
                        t = mod(fp[str(m)], t)
                    y = y + t
                else:
                    t = f(params['fuse_layers'][str(i)][str(j)], xs[j])
                    y = y + _upsample_nearest(t, 2 ** (j - i))
            outs.append(jax.nn.relu(y))
        return outs

    @staticmethod
    def _branch(params, blocks, x):
        for j, blk in enumerate(blocks):
            x = blk(params[str(j)], x)
        return x


@BACKBONES.register_module()
class HRNet(Module):
    blocks_dict = {'BASIC': BasicBlock, 'BOTTLENECK': Bottleneck}

    def __init__(self, extra, in_channels=3, conv_cfg=None, norm_cfg=None,
                 norm_eval=True, with_cp=False, zero_init_residual=False,
                 frozen_stages=-1):
        self.extra = extra
        self.frozen_stages = frozen_stages
        self.conv1 = Conv2d(in_channels, 64, 3, stride=2, padding=1,
                            bias=False, weight_init='kaiming_fan_out')
        self.bn1 = BatchNorm(64)
        self.conv2 = Conv2d(64, 64, 3, stride=2, padding=1, bias=False,
                            weight_init='kaiming_fan_out')
        self.bn2 = BatchNorm(64)

        # stage 1
        s1 = extra['stage1']
        block = self.blocks_dict[s1['block']]
        nch = s1['num_channels'][0]
        nblk = s1['num_blocks'][0]
        self.layer1 = []
        inplanes = 64
        need_ds = inplanes != nch * block.expansion
        self.layer1.append(block(inplanes, nch, downsample=need_ds))
        inplanes = nch * block.expansion
        for _ in range(1, nblk):
            self.layer1.append(block(inplanes, nch))
        stage1_out = inplanes

        self.stages = []
        self.transitions = []
        pre_channels = [stage1_out]
        self.stage_cfgs = []
        for s_idx in (2, 3, 4):
            cfg = extra[f'stage{s_idx}']
            self.stage_cfgs.append(cfg)
            block = self.blocks_dict[cfg['block']]
            cur_channels = [c * block.expansion
                            for c in cfg['num_channels']]
            self.transitions.append(self._make_transition(pre_channels,
                                                          cur_channels))
            modules = []
            chans = list(cur_channels)
            for m in range(cfg['num_modules']):
                mod = HRModule(cfg['num_branches'], block,
                               cfg['num_blocks'], chans,
                               cfg['num_channels'],
                               multiscale_output=True)
                chans = mod.in_channels
                modules.append(mod)
            self.stages.append(modules)
            pre_channels = chans
        self.out_channels = pre_channels

    @staticmethod
    def _make_transition(pre, cur):
        """(ref: hrnet.py:388-432)."""
        layers = []
        for i in range(len(cur)):
            if i < len(pre):
                if cur[i] != pre[i]:
                    layers.append(ConvBN(pre[i], cur[i], 3, padding=1,
                                         relu=True))
                else:
                    layers.append(None)
            else:
                downs = []
                for j in range(i + 1 - len(pre)):
                    cin = pre[-1]
                    cout = cur[i] if j == i - len(pre) else cin
                    downs.append(ConvBN(cin, cout, 3, stride=2, padding=1,
                                        relu=True))
                layers.append(downs)
        return layers

    def init(self, key):
        keys = jax.random.split(key, 64)
        it = iter(keys)
        p = {'conv1': self.conv1.init(next(it)),
             'bn1': self.bn1.init(next(it)),
             'conv2': self.conv2.init(next(it)),
             'bn2': self.bn2.init(next(it)),
             'layer1': {str(j): blk.init(next(it))
                        for j, blk in enumerate(self.layer1)}}
        for s_idx, (trans, modules) in enumerate(zip(self.transitions,
                                                     self.stages)):
            tp = {}
            for i, t in enumerate(trans):
                if t is None:
                    continue
                if isinstance(t, list):
                    k = next(it)
                    sub = jax.random.split(k, max(len(t), 2))
                    tp[str(i)] = {str(m): mod.init(sub[m])
                                  for m, mod in enumerate(t)}
                else:
                    tp[str(i)] = t.init(next(it))
            p[f'transition{s_idx + 1}'] = tp
            k = next(it)
            sub = jax.random.split(k, len(modules))
            p[f'stage{s_idx + 2}'] = {str(m): mod.init(sub[m])
                                      for m, mod in enumerate(modules)}
        return p

    def _apply_transition(self, params, trans, ys, num_branches):
        xs = []
        for i in range(num_branches):
            t = trans[i]
            if t is None:
                xs.append(ys[i])
            elif isinstance(t, list):
                x = ys[-1]
                tp = params[str(i)]
                for m, mod in enumerate(t):
                    x = mod(tp[str(m)], x)
                xs.append(x)
            else:
                xs.append(t(params[str(i)], ys[-1]))
        return xs

    def __call__(self, params, x):
        if self.frozen_stages >= 0:
            params = dict(params)
            for k in ('conv1', 'bn1', 'conv2', 'bn2', 'layer1'):
                params[k] = stop_gradient_tree(params[k])
        x = jax.nn.relu(self.bn1(params['bn1'],
                                 self.conv1(params['conv1'], x)))
        x = jax.nn.relu(self.bn2(params['bn2'],
                                 self.conv2(params['conv2'], x)))
        for j, blk in enumerate(self.layer1):
            x = blk(params['layer1'][str(j)], x)
        ys = [x]
        for s_idx, (trans, modules, cfg) in enumerate(
                zip(self.transitions, self.stages, self.stage_cfgs)):
            xs = self._apply_transition(params[f'transition{s_idx + 1}'],
                                        trans, ys, cfg['num_branches'])
            for m, mod in enumerate(modules):
                xs = mod(params[f'stage{s_idx + 2}'][str(m)], xs)
            ys = xs
        return tuple(ys)
