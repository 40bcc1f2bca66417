"""Res2Net / RegNet / HRNet parity vs independently written torch mirrors."""
import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn

from arfe_tpu.convert import params_to_jax, state_dict_to_params

torch.manual_seed(0)


def _randomize_bn(m):
    for mod in m.modules():
        if isinstance(mod, tnn.BatchNorm2d):
            mod.running_mean.data = torch.randn_like(mod.running_mean) * 0.1
            mod.running_var.data = torch.rand_like(mod.running_var) + 0.5
            mod.weight.data = torch.randn_like(mod.weight) * 0.1 + 1
            mod.bias.data = torch.randn_like(mod.bias) * 0.1


class TorchBottle2neck(tnn.Module):
    """Literal torch mirror of the reference Bottle2neck
    (ref: mmdet/models/backbones/res2net.py:13-156)."""

    def __init__(self, inplanes, planes, stride=1, scales=4, base_width=26,
                 base_channels=64, stage_type='normal', downsample=False):
        super().__init__()
        import math
        width = int(math.floor(planes * (base_width / base_channels)))
        self.width = width
        self.scales = scales
        self.stride = stride
        self.stage_type = stage_type
        self.conv1 = tnn.Conv2d(inplanes, width * scales, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(width * scales)
        if stage_type == 'stage' and stride != 1:
            self.pool = tnn.AvgPool2d(3, stride, padding=1)
        self.convs = tnn.ModuleList(
            [tnn.Conv2d(width, width, 3, stride=stride, padding=1,
                        bias=False) for _ in range(scales - 1)])
        self.bns = tnn.ModuleList(
            [tnn.BatchNorm2d(width) for _ in range(scales - 1)])
        self.conv3 = tnn.Conv2d(width * scales, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.relu = tnn.ReLU()
        self.has_ds = downsample
        if downsample:
            self.downsample = tnn.Sequential(
                tnn.AvgPool2d(stride, stride, ceil_mode=True,
                              count_include_pad=False),
                tnn.Conv2d(inplanes, planes * 4, 1, bias=False),
                tnn.BatchNorm2d(planes * 4))

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        spx = torch.split(out, self.width, 1)
        sp = self.relu(self.bns[0](self.convs[0](spx[0])))
        out = sp
        for i in range(1, self.scales - 1):
            sp = spx[i] if self.stage_type == 'stage' else sp + spx[i]
            sp = self.relu(self.bns[i](self.convs[i](sp)))
            out = torch.cat((out, sp), 1)
        if self.stage_type == 'normal' or self.stride == 1:
            out = torch.cat((out, spx[-1]), 1)
        else:
            out = torch.cat((out, self.pool(spx[-1])), 1)
        out = self.bn3(self.conv3(out))
        if self.has_ds:
            identity = self.downsample(x)
        return self.relu(out + identity)


def _parity(jmod, tmod, x_nchw, atol=2e-4):
    _randomize_bn(tmod)
    tmod.eval()
    x = torch.randn(*x_nchw)
    with torch.no_grad():
        ref = tmod(x).numpy()
    params = params_to_jax(state_dict_to_params(tmod.state_dict()))
    got = np.asarray(jmod(params, jnp.asarray(
        x.numpy().transpose(0, 2, 3, 1)))).transpose(0, 3, 1, 2)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=atol)


def test_bottle2neck_normal_parity():
    from arfe_tpu.models.backbones.res2net import Bottle2neck
    jm = Bottle2neck(64, 16, stride=1, scales=4, base_width=26,
                     base_channels=64, stage_type='normal',
                     downsample=False)
    tm = TorchBottle2neck(64, 16, stride=1, stage_type='normal')
    _parity(jm, tm, (1, 64, 16, 16))


def test_bottle2neck_stage_stride2_parity():
    from arfe_tpu.models.backbones.res2net import Bottle2neck
    jm = Bottle2neck(64, 32, stride=2, scales=4, base_width=26,
                     base_channels=64, stage_type='stage', downsample=True)
    tm = TorchBottle2neck(64, 32, stride=2, stage_type='stage',
                          downsample=True)
    _parity(jm, tm, (1, 64, 16, 16))


class TorchRegNetBlock(tnn.Module):
    def __init__(self, inplanes, planes, width, groups, stride=1,
                 downsample=False):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, width, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(width)
        self.conv2 = tnn.Conv2d(width, width, 3, stride=stride, padding=1,
                                groups=groups, bias=False)
        self.bn2 = tnn.BatchNorm2d(width)
        self.conv3 = tnn.Conv2d(width, planes, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes)
        self.relu = tnn.ReLU()
        self.has_ds = downsample
        if downsample:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(inplanes, planes, 1, stride=stride, bias=False),
                tnn.BatchNorm2d(planes))

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.has_ds:
            identity = self.downsample(x)
        return self.relu(out + identity)


def test_regnet_block_parity():
    from arfe_tpu.models.backbones.regnet import RegNetBottleneck
    jm = RegNetBottleneck(32, 64, width=64, groups=4, stride=2,
                          downsample=True)
    tm = TorchRegNetBlock(32, 64, 64, 4, stride=2, downsample=True)
    _parity(jm, tm, (1, 32, 16, 16))


def test_regnet_width_schedule():
    """Width schedule matches the reference's published regnetx_3.2gf
    stage layout."""
    from arfe_tpu.models.backbones import RegNet
    m = RegNet(arch='regnetx_3.2gf')
    assert m.stage_widths == [96, 192, 432, 1008]
    assert [len(b) for b in m.layers] == [2, 6, 15, 2]
    assert m.out_channels == [96, 192, 432, 1008]


def test_hrnet_upsample_and_shapes():
    from arfe_tpu.models.backbones import HRNet
    extra = dict(
        stage1=dict(num_modules=1, num_branches=1, block='BOTTLENECK',
                    num_blocks=(1,), num_channels=(16,)),
        stage2=dict(num_modules=1, num_branches=2, block='BASIC',
                    num_blocks=(1, 1), num_channels=(8, 16)),
        stage3=dict(num_modules=2, num_branches=3, block='BASIC',
                    num_blocks=(1, 1, 1), num_channels=(8, 16, 32)),
        stage4=dict(num_modules=1, num_branches=4, block='BASIC',
                    num_blocks=(1, 1, 1, 1), num_channels=(8, 16, 32, 64)))
    hr = HRNet(extra=extra)
    p = hr.init(jax.random.PRNGKey(0))
    outs = hr(p, jnp.ones((1, 64, 64, 3)))
    assert [o.shape for o in outs] == [(1, 16, 16, 8), (1, 8, 8, 16),
                                       (1, 4, 4, 32), (1, 2, 2, 64)]
    # param naming mirrors torch state_dict
    assert 'branches' in p['stage2']['0']
    assert 'fuse_layers' in p['stage2']['0']
    assert '1' in p['transition1']  # new-branch downsample chain


def test_hrnet_grad_flows():
    from arfe_tpu.models.backbones import HRNet
    extra = dict(
        stage1=dict(num_modules=1, num_branches=1, block='BOTTLENECK',
                    num_blocks=(1,), num_channels=(8,)),
        stage2=dict(num_modules=1, num_branches=2, block='BASIC',
                    num_blocks=(1, 1), num_channels=(8, 16)),
        stage3=dict(num_modules=1, num_branches=3, block='BASIC',
                    num_blocks=(1, 1, 1), num_channels=(8, 16, 32)),
        stage4=dict(num_modules=1, num_branches=4, block='BASIC',
                    num_blocks=(1, 1, 1, 1), num_channels=(8, 16, 32, 64)))
    hr = HRNet(extra=extra)
    p = hr.init(jax.random.PRNGKey(0))

    def f(params):
        outs = hr(params, jnp.ones((1, 32, 32, 3)))
        return sum(o.sum() for o in outs)

    g = jax.grad(f)(p)
    assert float(jnp.abs(g['conv1']['weight']).sum()) > 0


def test_space_to_depth_stem_equivalence():
    """stem_space_to_depth computes the SAME conv1 from the SAME weights
    via a 2x2-blocked stride-1 4x4 conv (MXU-dense stem)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from arfe_tpu.models.backbones.resnet import ResNet
    m1 = ResNet(depth=18, base_channels=16)
    m2 = ResNet(depth=18, base_channels=16, stem_space_to_depth=True)
    p = m1.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.RandomState(0).randn(1, 64, 96, 3),
                    jnp.float32)
    for a, b in zip(m1(p, x), m2(p, x)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5)
