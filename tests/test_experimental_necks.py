"""Experimental ARFE neck variants: forward shapes + semantic spot checks."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import arfe_tpu.models.necks as N

CHANS4 = [8, 16, 32, 64]
INS4 = tuple(jnp.asarray(
    np.random.RandomState(i).randn(2, 40 // (2 ** i), 40 // (2 ** i),
                                   8 * 2 ** i), jnp.float32)
    for i in range(4))
INS5 = tuple(jnp.asarray(
    np.random.RandomState(i).randn(2, 40 // (2 ** i), 40 // (2 ** i), 16),
    jnp.float32) for i in range(5))

FPN_STYLE = ['FPNBU', 'FPNNEWTD', 'FPNDENOISE', 'FPNDENOISEBU', 'FPNIPT',
             'FPNIPTWHOLE', 'FPNFEATSEL', 'FPNRF', 'FPNMultiRF', 'FPNDAM',
             'FPNBAM', 'FPNCBAM', 'FPNDualSpatial', 'DeformFPN', 'ATTFF',
             'ATTFF2']
LEVEL_STYLE = ['FPNCROSS', 'FPNRECOMB', 'FPNRelation', 'ATTSEP', 'MULTISEC']


@pytest.mark.parametrize('name', FPN_STYLE)
def test_fpn_style_forward(name):
    kw = dict(in_channels=CHANS4, out_channels=16, num_outs=5)
    m = getattr(N, name)(**kw)
    p = m.init(jax.random.PRNGKey(0))
    outs = m(p, INS4)
    assert len(outs) == 5
    for o in outs:
        assert np.isfinite(np.asarray(o)).all()
        assert o.shape[-1] == 16


@pytest.mark.parametrize('name', LEVEL_STYLE)
def test_level_style_forward(name):
    m = getattr(N, name)(in_channels=16, num_levels=5)
    p = m.init(jax.random.PRNGKey(0))
    outs = m(p, INS5)
    assert len(outs) == 5
    for o, x in zip(outs, INS5):
        assert o.shape == x.shape
        assert np.isfinite(np.asarray(o)).all()


def test_fpn_multi_padding_quirk():
    """FPNMULTI reproduces the reference's 1x1-with-padding growth."""
    m = N.FPNMULTI(in_channels=CHANS4, out_channels=16, num_outs=5)
    p = m.init(jax.random.PRNGKey(0))
    outs = m(p, INS4)
    assert outs[0].shape[1] == 42  # 40 + 2 from padding=1 on the 1x1


def test_fpnnewtd_channel_to_space():
    """The learned rearrangement maps channel 4c+k to the right subpixel."""
    m = N.FPNNEWTD(in_channels=[4, 4], out_channels=4, num_outs=2)
    p = m.init(jax.random.PRNGKey(0))
    b, h, w, c = 1, 2, 2, 4
    tmp = jnp.arange(b * h * w * 4 * c, dtype=jnp.float32).reshape(
        b, h, w, 4 * c)
    q = tmp.reshape(b, h, w, c, 2, 2)
    add = q.transpose(0, 1, 4, 2, 5, 3).reshape(b, 2 * h, 2 * w, c)
    # (2y+dy, 2x+dx, c) == tmp[y, x, 4c + 2dy + dx]
    for y in range(h):
        for x in range(w):
            for cc in range(c):
                for dy in range(2):
                    for dx in range(2):
                        assert float(add[0, 2 * y + dy, 2 * x + dx, cc]) \
                            == float(tmp[0, y, x, 4 * cc + 2 * dy + dx])


def test_fpnrecomb_weights_sum():
    """Recombination weights are a softmax over source levels."""
    m = N.FPNRECOMB(in_channels=16, num_levels=5)
    p = m.init(jax.random.PRNGKey(0))
    outs = m(p, INS5)
    # identity path preserved: output differs from input by the weighted
    # sum of other levels, so zeroing all inputs gives zeros
    zeros = tuple(jnp.zeros_like(x) for x in INS5)
    outs0 = m(p, zeros)
    for o in outs0:
        np.testing.assert_allclose(np.asarray(o), 0, atol=1e-6)


def test_cbam_module():
    from arfe_tpu.models.necks import CbamModule
    m = CbamModule(16)
    p = m.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 16), jnp.float32)
    out = m(p, x)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_detector_builds_with_experimental_neck():
    """List-neck composition: FPN -> FPNBU-style second stage via config."""
    from arfe_tpu.models.builder import build_detector
    cfg = dict(
        type='RetinaNet',
        backbone=dict(type='ResNet', depth=18, base_channels=16,
                      out_indices=(0, 1, 2, 3)),
        neck=[
            dict(type='FPN', in_channels=[16, 32, 64, 128],
                 out_channels=16, num_outs=5),
            dict(type='FPNRelation', in_channels=16, num_levels=5),
        ],
        bbox_head=dict(
            type='RetinaHead', num_classes=4, in_channels=16,
            feat_channels=16, stacked_convs=1,
            anchor_generator=dict(type='AnchorGenerator',
                                  octave_base_scale=4, scales_per_octave=1,
                                  ratios=[1.0], strides=[4, 8, 16, 32, 64]),
            loss_cls=dict(type='FocalLoss', use_sigmoid=True, gamma=2.0,
                          alpha=0.25, loss_weight=1.0)))
    det = build_detector(cfg, test_cfg=dict(
        nms_pre=50, score_thr=0.05, nms=dict(type='nms', iou_thr=0.5),
        max_per_img=10))
    p = det.init(jax.random.PRNGKey(0))
    dets, labels, valid = det.simple_test(
        p, jnp.ones((1, 64, 64, 3)), jnp.array([[64, 64]]),
        jnp.ones((1, 4)))
    assert dets.shape == (1, 10, 5)
