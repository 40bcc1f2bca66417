"""DCN / CARAFE / context ops."""
import jax
import jax.numpy as jnp
import numpy as np

from arfe_tpu.ops import (CARAFEPack, ContextBlock, GeneralizedAttention,
                          MaskedConv2d, deform_conv2d)
from arfe_tpu.ops.deform_conv import DeformConv2d, ModulatedDeformConv2d


def test_deform_conv_zero_offset_equals_conv():
    """With zero offsets, DCN must match a plain conv exactly."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 10, 12, 8).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 8, 16).astype(np.float32))
    offset = jnp.zeros((2, 10, 12, 2 * 9), jnp.float32)
    got = deform_conv2d(x, offset, w, stride=1, padding=1)
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-3)


def test_deform_conv_integer_shift():
    """Offset (0, 1) on a 1x1 kernel shifts the feature map by one column."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 6, 8, 4).astype(np.float32))
    w = jnp.asarray(np.eye(4).reshape(1, 1, 4, 4).astype(np.float32))
    offset = jnp.tile(jnp.asarray([0.0, 1.0]), (1, 6, 8, 1))
    got = np.asarray(deform_conv2d(x, offset, w))
    np.testing.assert_allclose(got[0, :, :-1], np.asarray(x)[0, :, 1:],
                               atol=1e-5)


def test_deform_conv_pack_init_is_identity_conv():
    m = DeformConv2d(8, 8, 3, padding=1)
    p = m.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.RandomState(0).randn(1, 8, 8, 8),
                    jnp.float32)
    got = m(p, x)
    ref = jax.lax.conv_general_dilated(
        x, p['weight'], (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)
    # modulated variant runs
    m2 = ModulatedDeformConv2d(8, 4, 3, padding=1, deform_groups=2)
    p2 = m2.init(jax.random.PRNGKey(1))
    assert m2(p2, x).shape == (1, 8, 8, 4)


def test_context_block():
    cb = ContextBlock(16, ratio=0.25)
    p = cb.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.RandomState(0).randn(2, 6, 7, 16),
                    jnp.float32)
    out = cb(p, x)
    assert out.shape == x.shape
    # zero-init channel_add conv -> identity at init
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)


def test_generalized_attention_identity_at_init():
    ga = GeneralizedAttention(16, num_heads=8)
    p = ga.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.RandomState(0).randn(1, 8, 8, 16),
                    jnp.float32)
    out = ga(p, x)
    # gamma starts at 0 -> identity
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)


def test_carafe_uniform_kernel_is_avg():
    """A uniform reassembly kernel averages the k*k neighborhood."""
    from arfe_tpu.ops import carafe
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 4, 4, 3).astype(np.float32))
    k, s = 3, 2
    masks = jnp.full((1, 8, 8, k * k), 1.0 / (k * k))
    out = np.asarray(carafe(x, masks, k, 1, s))
    assert out.shape == (1, 8, 8, 3)
    # center hi-res pixels equal the 3x3 mean of their source pixel
    xp = np.pad(np.asarray(x)[0], ((1, 1), (1, 1), (0, 0)))
    expected = np.stack([xp[i:i + 3, j:j + 3].mean((0, 1))
                         for i in range(4) for j in range(4)]).reshape(4, 4, 3)
    np.testing.assert_allclose(out[0, ::2, ::2], expected, atol=1e-5)


def test_carafe_pack():
    up = CARAFEPack(8, scale_factor=2)
    p = up.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.RandomState(0).randn(1, 5, 6, 8), jnp.float32)
    out = up(p, x)
    assert out.shape == (1, 10, 12, 8)


def test_masked_conv():
    m = MaskedConv2d(4, 4, 3, padding=1)
    p = m.init(jax.random.PRNGKey(0))
    x = jnp.ones((1, 4, 4, 4))
    mask = jnp.zeros((1, 4, 4)).at[0, 1, 1].set(1.0)
    out = np.asarray(m(p, x, mask))
    assert (out[0, 0, 0] == 0).all() and (out[0, 1, 1] != 0).any()
