"""Numerical parity of NHWC layers vs torch (the conversion spec)."""
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn

from arfe_tpu.convert import state_dict_to_params
from arfe_tpu.models.layers import (BatchNorm, Conv2d, GroupNorm, Linear,
                                    max_pool2d, resize_bilinear,
                                    resize_nearest)

torch.manual_seed(0)


def to_nhwc(x):
    return jnp.asarray(x.detach().numpy().transpose(0, 2, 3, 1))


def from_nhwc_out(y):
    return np.asarray(y).transpose(0, 3, 1, 2)


@pytest.mark.parametrize('cin,cout,k,s,p,d,g', [
    (3, 8, 3, 1, 1, 1, 1),
    (8, 16, 3, 2, 1, 1, 1),
    (8, 16, 1, 1, 0, 1, 1),
    (4, 8, 7, 2, 3, 1, 1),
    (8, 8, 3, 1, 2, 2, 1),
    (8, 8, 3, 1, 1, 1, 4),
])
def test_conv2d_matches_torch(cin, cout, k, s, p, d, g):
    tconv = tnn.Conv2d(cin, cout, k, stride=s, padding=p, dilation=d,
                       groups=g, bias=True)
    x = torch.randn(2, cin, 17, 23)
    ref = tconv(x).detach().numpy()
    conv = Conv2d(cin, cout, k, stride=s, padding=p, dilation=d, groups=g)
    params = state_dict_to_params(tconv.state_dict())
    out = from_nhwc_out(conv(params, to_nhwc(x)))
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_batchnorm_eval_matches_torch():
    tbn = tnn.BatchNorm2d(8)
    tbn.running_mean.data = torch.randn(8)
    tbn.running_var.data = torch.rand(8) + 0.5
    tbn.weight.data = torch.randn(8)
    tbn.bias.data = torch.randn(8)
    tbn.eval()
    x = torch.randn(2, 8, 5, 7)
    ref = tbn(x).detach().numpy()
    bn = BatchNorm(8)
    params = state_dict_to_params(tbn.state_dict())
    out = from_nhwc_out(bn(params, to_nhwc(x)))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_linear_matches_torch():
    tl = tnn.Linear(12, 7)
    x = torch.randn(5, 12)
    ref = tl(x).detach().numpy()
    lin = Linear(12, 7)
    params = state_dict_to_params(tl.state_dict())
    out = np.asarray(lin(params, jnp.asarray(x.numpy())))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_groupnorm_matches_torch():
    tgn = tnn.GroupNorm(4, 16)
    tgn.weight.data = torch.randn(16)
    tgn.bias.data = torch.randn(16)
    x = torch.randn(2, 16, 6, 5)
    ref = tgn(x).detach().numpy()
    gn = GroupNorm(4, 16)
    params = state_dict_to_params(tgn.state_dict())
    out = from_nhwc_out(gn(params, to_nhwc(x)))
    np.testing.assert_allclose(out, ref, atol=1e-5)


@pytest.mark.parametrize('k,s,p', [(3, 2, 1), (2, 2, 0), (1, 2, 0)])
def test_maxpool_matches_torch(k, s, p):
    x = torch.randn(2, 4, 25, 25)
    ref = tnn.functional.max_pool2d(x, k, stride=s, padding=p).numpy()
    out = from_nhwc_out(max_pool2d(to_nhwc(x), k, stride=s, padding=p))
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_nearest_resize_matches_torch():
    x = torch.randn(1, 3, 13, 21)
    ref = tnn.functional.interpolate(x, size=(26, 42), mode='nearest').numpy()
    out = from_nhwc_out(resize_nearest(to_nhwc(x), (26, 42)))
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_bilinear_resize_matches_torch():
    x = torch.randn(1, 3, 10, 14)
    ref = tnn.functional.interpolate(
        x, size=(25, 35), mode='bilinear', align_corners=False).numpy()
    out = from_nhwc_out(resize_bilinear(to_nhwc(x), (25, 35)))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_conv_transpose_vs_torch():
    """FCNMaskHead deconv: converted torch ConvTranspose2d weights must give
    identical outputs (ADVICE r1: IOHW vs OIHW layout)."""
    import torch
    from arfe_tpu.convert.torch2jax import tensor_to_array
    from arfe_tpu.models.roi_heads.mask_heads.fcn_mask_head import \
        ConvTranspose2d

    torch.manual_seed(0)
    tmod = torch.nn.ConvTranspose2d(5, 7, kernel_size=2, stride=2)
    x = torch.randn(2, 5, 6, 6)
    with torch.no_grad():
        ref = tmod(x).permute(0, 2, 3, 1).numpy()

    jmod = ConvTranspose2d(5, 7, kernel_size=2, stride=2)
    params = {
        'weight': jnp.asarray(tensor_to_array('upsample.weight',
                                              tmod.weight.detach())),
        'bias': jnp.asarray(tmod.bias.detach().numpy()),
    }
    out = jmod(params, jnp.asarray(x.permute(0, 2, 3, 1).numpy()))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)
