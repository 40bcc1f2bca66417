"""ResNet-50 converter+architecture parity vs an independently written torch
implementation of the standard (torchvision-layout) ResNet-50."""
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn

from arfe_tpu.convert import params_to_jax, state_dict_to_params
from arfe_tpu.models.backbones import ResNet

torch.manual_seed(0)


class TorchBottleneck(tnn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride=stride, padding=1,
                                bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.relu = tnn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class TorchResNet50(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU(inplace=True)
        self.maxpool = tnn.MaxPool2d(3, stride=2, padding=1)
        self.inplanes = 64
        self.layer1 = self._make_layer(64, 3, 1)
        self.layer2 = self._make_layer(128, 4, 2)
        self.layer3 = self._make_layer(256, 6, 2)
        self.layer4 = self._make_layer(512, 3, 2)

    def _make_layer(self, planes, blocks, stride):
        downsample = None
        if stride != 1 or self.inplanes != planes * 4:
            downsample = tnn.Sequential(
                tnn.Conv2d(self.inplanes, planes * 4, 1, stride=stride,
                           bias=False),
                tnn.BatchNorm2d(planes * 4))
        layers = [TorchBottleneck(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes * 4
        layers += [TorchBottleneck(self.inplanes, planes)
                   for _ in range(1, blocks)]
        return tnn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        outs = []
        for layer in (self.layer1, self.layer2, self.layer3, self.layer4):
            x = layer(x)
            outs.append(x)
        return outs


def test_resnet50_matches_torch():
    tm = TorchResNet50()
    # randomize BN stats so the test actually exercises them
    for m in tm.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.data = torch.randn_like(m.running_mean) * 0.1
            m.running_var.data = torch.rand_like(m.running_var) + 0.5
            m.weight.data = torch.randn_like(m.weight) * 0.1 + 1
            m.bias.data = torch.randn_like(m.bias) * 0.1
    tm.eval()
    x = torch.randn(1, 3, 64, 96)
    with torch.no_grad():
        refs = [o.numpy() for o in tm(x)]

    model = ResNet(depth=50, out_indices=(0, 1, 2, 3), style='pytorch')
    params = params_to_jax(state_dict_to_params(tm.state_dict()))
    outs = model(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    assert len(outs) == 4
    for got, ref in zip(outs, refs):
        got = np.asarray(got).transpose(0, 3, 1, 2)
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=2e-3)


def test_resnet50_param_count():
    model = ResNet(depth=50)
    params = model.init(jnp.array([0, 0], dtype=jnp.uint32))
    import jax
    n = sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))
    # torchvision resnet50 minus fc (2048*1000+1000): 25557032 - 2049000
    # plus BN running stats (they are leaves here): num BN params doubles
    # weight+bias count. Count only weight-like leaves for the check:
    flat = jax.tree_util.tree_leaves_with_path(params)
    n_no_stats = sum(
        int(np.prod(leaf.shape)) for path, leaf in flat
        if 'running_' not in jax.tree_util.keystr(path))
    assert n_no_stats == 25557032 - 2049000


def test_resnet_frozen_stages_stop_gradient():
    import jax
    model = ResNet(depth=18, frozen_stages=1, out_indices=(3,))
    params = model.init(jax.random.PRNGKey(0))

    def loss_fn(p):
        out = model(p, jnp.ones((1, 32, 32, 3)))[0]
        return (out ** 2).mean()

    grads = jax.grad(loss_fn)(params)
    g_conv1 = np.abs(np.asarray(grads['conv1']['weight'])).sum()
    g_l1 = np.abs(np.asarray(grads['layer1']['0']['conv1']['weight'])).sum()
    g_l2 = np.abs(np.asarray(grads['layer2']['0']['conv1']['weight'])).sum()
    assert g_conv1 == 0 and g_l1 == 0 and g_l2 > 0
