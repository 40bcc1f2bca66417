"""NASFPN / FPN_CARAFE / NASFCOS_FPN and merge-cell tests."""
import jax
import jax.numpy as jnp
import numpy as np

INS = [jnp.ones((1, 32 // (2 ** i), 32 // (2 ** i), 8 * 2 ** i))
       for i in range(4)]
CHANS = [8, 16, 32, 64]


def test_merge_cells():
    from arfe_tpu.ops.merge_cells import (ConcatCell, GlobalPoolingCell,
                                          SumCell, _resize)
    x1 = jnp.ones((1, 8, 8, 4))
    x2 = jnp.ones((1, 4, 4, 4)) * 2
    # resize: nearest up / maxpool down
    up = _resize(x2, (8, 8))
    assert up.shape == (1, 8, 8, 4) and float(up[0, 0, 0, 0]) == 2
    down = _resize(x1, (4, 4))
    assert down.shape == (1, 4, 4, 4)

    sc = SumCell(4, 4)
    p = sc.init(jax.random.PRNGKey(0))
    out = sc(p, x1, x2)
    assert out.shape == (1, 8, 8, 4)

    cc = ConcatCell(4, 4)
    pc = cc.init(jax.random.PRNGKey(0))
    out = cc(pc, x1, x2)
    assert out.shape == (1, 8, 8, 4)

    gp = GlobalPoolingCell(with_out_conv=False)
    out = gp({}, x1, x2, out_size=(4, 4))
    # x2 + sigmoid(mean(x2)) * x1_resized
    exp = 2 + (1 / (1 + np.exp(-2.0))) * 1
    np.testing.assert_allclose(np.asarray(out)[0, 0, 0, 0], exp, rtol=1e-5)


def test_nasfpn_shapes_and_grad():
    from arfe_tpu.models.necks import NASFPN
    n = NASFPN(in_channels=CHANS[1:], out_channels=16, num_outs=5,
               stack_times=2, start_level=0, norm_cfg=dict(type='BN'))
    p = n.init(jax.random.PRNGKey(0))
    outs = n(p, INS[1:])
    assert [o.shape for o in outs] == [
        (1, 16, 16, 16), (1, 8, 8, 16), (1, 4, 4, 16), (1, 2, 2, 16),
        (1, 1, 1, 16)]

    def f(params):
        return sum(o.sum() for o in n(params, INS[1:]))

    g = jax.grad(f)(p)
    w = g['fpn_stages']['0']['sum_43_3']['out_conv']['conv']['weight']
    assert float(jnp.abs(w).sum()) > 0


def test_fpn_carafe_shapes():
    from arfe_tpu.models.necks import FPN_CARAFE
    n = FPN_CARAFE(in_channels=CHANS, out_channels=16, num_outs=5,
                   start_level=0)
    p = n.init(jax.random.PRNGKey(0))
    outs = n(p, INS)
    assert [o.shape for o in outs] == [
        (1, 32, 32, 16), (1, 16, 16, 16), (1, 8, 8, 16), (1, 4, 4, 16),
        (1, 2, 2, 16)]
    # carafe upsamplers exist for every top-down step + extras
    assert len(n.upsample_modules) == 4


def test_nasfcos_fpn_shapes():
    from arfe_tpu.models.necks import NASFCOS_FPN
    n = NASFCOS_FPN(in_channels=CHANS, out_channels=16, num_outs=5,
                    start_level=1)
    p = n.init(jax.random.PRNGKey(0))
    outs = n(p, INS)
    assert [o.shape for o in outs] == [
        (1, 16, 16, 16), (1, 8, 8, 16), (1, 4, 4, 16), (1, 2, 2, 16),
        (1, 1, 1, 16)]


def test_resnet_plugins_wiring():
    from arfe_tpu.models.backbones import ResNet
    m = ResNet(depth=50, base_channels=16,
               plugins=[dict(cfg=dict(type='ContextBlock', ratio=1. / 16),
                             stages=(False, True, True, True),
                             position='after_conv3')])
    p = m.init(jax.random.PRNGKey(0))
    assert 'context_block' not in p['layer1']['0']
    assert 'context_block' in p['layer2']['0']
    outs = m(p, jnp.ones((1, 64, 64, 3)))
    assert len(outs) == 4


def test_generalized_attention_modes():
    from arfe_tpu.ops.attention_ops import GeneralizedAttention
    x = jnp.asarray(np.random.RandomState(0).randn(1, 8, 8, 16), jnp.float32)
    for at in ('1111', '1000', '0010', '0001', '0100'):
        ga = GeneralizedAttention(16, num_heads=8, attention_type=at)
        p = ga.init(jax.random.PRNGKey(0))
        # gamma starts 0 -> identity
        np.testing.assert_allclose(np.asarray(ga(p, x)), np.asarray(x),
                                   atol=1e-6)
        p['gamma'] = jnp.ones((1,))
        out = np.asarray(ga(p, x))
        assert np.isfinite(out).all()
        assert not np.allclose(out, np.asarray(x))
