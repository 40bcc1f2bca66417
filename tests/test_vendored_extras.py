"""Vendored timm utility layers (extras.py) + small framework utils
(contextmanagers, NiceRepr, demodata, split_combined_polys)."""
import asyncio

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arfe_tpu.models.backbones.layers import (
    AvgPool2dSame, BlurPool2d, CondConv2d, Conv2dSame, ConvBnAct, DropPath,
    MedianPool2d, MixedConv2d, SelectAdaptivePool2d, SpaceToDepthModule,
    SplitAttn, SplitBatchNorm2d, adaptive_avgmax_pool2d, drop_block_2d,
    drop_path, hard_sigmoid, hard_swish, mish, swish)

X = jnp.asarray(np.random.RandomState(0).randn(2, 8, 12, 16), jnp.float32)
KEY = jax.random.PRNGKey(0)


@pytest.mark.parametrize('module,out_shape', [
    (BlurPool2d(16), (2, 4, 6, 16)),
    (MedianPool2d(3), (2, 8, 12, 16)),
    (Conv2dSame(16, 8, 3, stride=2), (2, 4, 6, 8)),
    (AvgPool2dSame(2, 2), (2, 4, 6, 16)),
    (ConvBnAct(16, 8, 3, padding=1), (2, 8, 12, 8)),
    (MixedConv2d(16, 16), (2, 8, 12, 16)),
    (CondConv2d(16, 8), (2, 8, 12, 8)),
    (SplitBatchNorm2d(16), (2, 8, 12, 16)),
    (SpaceToDepthModule(), (2, 4, 6, 64)),
    (SelectAdaptivePool2d('catavgmax'), (2, 1, 1, 32)),
    (SplitAttn(8), (2, 8, 12, 8)),
])
def test_extras_shapes_finite(module, out_shape):
    p = module.init(KEY)
    out = module(p, X)
    assert tuple(out.shape) == out_shape
    assert np.isfinite(np.asarray(out)).all()


def test_median_pool_is_median():
    m = MedianPool2d(3)
    x = jnp.arange(25.0).reshape(1, 5, 5, 1)
    out = m(m.init(KEY), x)
    # interior pixel (2,2): window is 9 consecutive-ish values; median of
    # {6,7,8,11,12,13,16,17,18} = 12
    assert float(out[0, 2, 2, 0]) == 12.0


def test_blur_pool_preserves_constant():
    m = BlurPool2d(4, filt_size=3, stride=2)
    x = jnp.full((1, 8, 8, 4), 3.0)
    out = m(m.init(KEY), x)
    # binomial filter sums to 1 -> constants preserved away from borders
    assert abs(float(out[0, 2, 2, 0]) - 3.0) < 1e-5


def test_activations_against_reference():
    x = jnp.linspace(-4, 4, 33)
    np.testing.assert_allclose(np.asarray(swish(x)),
                               np.asarray(x) / (1 + np.exp(-np.asarray(x))),
                               atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(mish(x)),
        np.asarray(x) * np.tanh(np.log1p(np.exp(np.asarray(x)))), atol=1e-5)
    assert float(hard_sigmoid(jnp.asarray(10.0))) == 1.0
    assert float(hard_swish(jnp.asarray(-10.0))) == 0.0


def test_drop_path_and_block():
    big = jnp.ones((64, 4, 4, 2))
    out = drop_path(big, KEY, 0.5, training=True)
    kept = np.asarray(out[:, 0, 0, 0]) != 0
    assert 10 < kept.sum() < 54          # ~50% of samples survive
    np.testing.assert_allclose(np.asarray(out[kept][0]), 2.0)  # rescaled
    assert drop_path(big, KEY, 0.5, training=False) is big
    db = drop_block_2d(big, KEY, 0.2, 3, training=True)
    assert db.shape == big.shape


def test_cond_conv_routes_experts():
    m = CondConv2d(4, 4, 3, num_experts=2)
    p = m.init(KEY)
    x = jnp.asarray(np.random.RandomState(1).randn(3, 6, 6, 4), jnp.float32)
    out = m(p, x)
    # different samples get different mixed kernels -> outputs differ even
    # for identical inputs when routing differs
    x2 = jnp.concatenate([x[:1], x[:1] * 2], 0)
    out2 = m(p, x2)
    assert out.shape == (3, 6, 6, 4)
    assert np.isfinite(np.asarray(out2)).all()


def test_small_utils():
    from arfe_tpu.core.bbox.demodata import ensure_rng, random_boxes
    from arfe_tpu.core.mask import split_combined_polys
    from arfe_tpu.utils.util_mixins import NiceRepr

    b = random_boxes(7, scale=50, rng=3)
    assert b.shape == (7, 4) and (b[:, 2] >= b[:, 0]).all()
    assert ensure_rng(5).randint(10) == np.random.RandomState(5).randint(10)

    out = split_combined_polys([np.arange(20.0)], [[8, 6, 6]], [[2, 1]])
    assert len(out[0]) == 2 and len(out[0][0]) == 2
    np.testing.assert_array_equal(out[0][1][0], np.arange(14.0, 20.0))

    class T(NiceRepr):
        def __len__(self):
            return 3

    assert '(3)' in str(T())


def test_async_contextmanagers():
    from arfe_tpu.utils.contextmanagers import completed, concurrent

    async def main():
        sem = asyncio.Semaphore(1)
        order = []
        async with concurrent(sem):
            async with completed('trace', 'name'):
                order.append('inner')
        return order

    assert asyncio.run(main()) == ['inner']
