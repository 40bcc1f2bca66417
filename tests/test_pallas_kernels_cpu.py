"""CPU-side checks for the Pallas kernels' wrappers and fallbacks
(the on-TPU parity runs live in scripts driven on hardware; these tests
pin the fallback semantics and support gates)."""
import jax
import jax.numpy as jnp
import numpy as np


def test_fused_attention_cpu_fallback_matches_xla():
    from arfe_tpu.ops.pallas_attention import (_xla_attention,
                                               attention_auto,
                                               fused_softmax_attention)
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(2, 50, 128), jnp.float32)
    k = jnp.asarray(rng.randn(2, 50, 128), jnp.float32)
    v = jnp.asarray(rng.randn(2, 50, 128), jnp.float32)
    ref = _xla_attention(q, k, v, 0.1)
    np.testing.assert_allclose(
        np.asarray(fused_softmax_attention(q, k, v, 0.1)),
        np.asarray(ref), atol=1e-5)
    # custom-vjp grads equal XLA grads
    g = jax.grad(lambda q_: attention_auto(q_, k, v, 0.1).sum())(q)
    gr = jax.grad(lambda q_: _xla_attention(q_, k, v, 0.1).sum())(q)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gr), atol=1e-5)


def test_nonlocal_uses_fused_path_and_matches():
    """NonLocal2D embedded_gaussian == its explicit einsum formulation."""
    from arfe_tpu.ops.non_local import NonLocal2D
    m = NonLocal2D(128, reduction=1, use_scale=False)
    p = m.init(jax.random.PRNGKey(0))
    # conv_out is zero-init -> identity; perturb it so the test is real
    p['conv_out']['conv']['weight'] = jax.random.normal(
        jax.random.PRNGKey(1), p['conv_out']['conv']['weight'].shape) * 0.01
    x = jnp.asarray(np.random.RandomState(0).randn(1, 6, 7, 128),
                    jnp.float32)
    out = m(p, x)
    # manual reference
    ic = 128
    g_x = m.g(p['g'], x).reshape(1, 42, ic)
    th = m.theta(p['theta'], x).reshape(1, 42, ic)
    ph = m.phi(p['phi'], x).reshape(1, 42, ic)
    pw = jax.nn.softmax(jnp.einsum('nqc,nkc->nqk', th, ph), -1)
    y = jnp.einsum('nqk,nkc->nqc', pw, g_x).reshape(1, 6, 7, ic)
    ref = x + m.conv_out(p['conv_out'], y)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_nms_exact_greedy_vs_sequential_reference():
    """nms() (XLA tile fixpoint) produces exact greedy results.

    (A bit-exact Pallas greedy-NMS kernel existed through round 4; it was
    measured 9x slower than the XLA tile path on v5e and removed —
    measurement preserved in CLAUDE.md.)"""
    from arfe_tpu.ops.nms import nms
    rng = np.random.RandomState(0)
    n = 300
    b = rng.rand(n, 4).astype(np.float32) * 200
    b[:, 2:] += b[:, :2] + 10
    s = rng.rand(n).astype(np.float32)
    dets, idx, valid = nms(jnp.asarray(b), jnp.asarray(s), 0.5, max_out=50)
    # sequential reference
    order = np.argsort(-s, kind='stable')
    keep = []
    sup = np.zeros(n, bool)
    for i in order:
        if sup[i]:
            continue
        keep.append(i)
        x1 = np.maximum(b[i, 0], b[:, 0]); y1 = np.maximum(b[i, 1], b[:, 1])
        x2 = np.minimum(b[i, 2], b[:, 2]); y2 = np.minimum(b[i, 3], b[:, 3])
        inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
        area = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
        iou = inter / (area[i] + area - inter)
        sup |= iou > 0.5
    keep = np.array(keep[:50])
    got = np.asarray(idx)[np.asarray(valid)]
    np.testing.assert_array_equal(np.sort(got), np.sort(keep))
