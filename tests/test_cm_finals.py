"""Channel-major single-stage finals (AnchorHead.get_bboxes_feats) must
match the NHWC forward + get_bboxes path (candidate order differs only in
exact score ties, improbable with random weights)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arfe_tpu.models.dense_heads import RetinaHead, SSDHead


def _run_pair(head, params, feats, img_shapes, scale_factors, cfg):
    outs = head(params, feats)
    ref = head.get_bboxes(*outs, img_shapes, scale_factors, cfg=cfg,
                          rescale=True)
    got = head.get_bboxes_feats(params, feats, img_shapes, scale_factors,
                                cfg=cfg, rescale=True)
    for name, r, g in zip(('dets', 'labels', 'valid'), ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), atol=1e-4,
                                   err_msg=name)


def test_retina_cm_finals_matches_nhwc():
    head = RetinaHead(6, 32, stacked_convs=1, feat_channels=32,
                      anchor_generator=dict(
                          type='AnchorGenerator', octave_base_scale=4,
                          scales_per_octave=3, ratios=[0.5, 1.0, 2.0],
                          strides=[8, 16, 32, 64, 128]),
                      test_cfg=None)
    assert head.cm_finals
    params = head.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    b = 2
    feats = [jnp.asarray(rng.randn(b, 40 // 2 ** i, 52 // 2 ** i, 32)
                         .astype(np.float32) * 0.3) for i in range(5)]
    img_shapes = jnp.asarray([[316.0, 410.0], [320.0, 416.0]])
    scale_factors = jnp.full((b, 4), 1.5, jnp.float32)
    # nms_pre=400: level 0 (40*52*9=18720 anchors) takes the top-k branch,
    # the last levels (< 400) take the full-level branch
    cfg = dict(nms_pre=400, score_thr=0.02,
               nms=dict(type='nms', iou_thr=0.5), max_per_img=50)
    _run_pair(head, params, feats, img_shapes, scale_factors, cfg)


def test_ssd_cm_finals_matches_nhwc():
    head = SSDHead(num_classes=4, in_channels=(32, 48, 32, 32),
                   anchor_generator=dict(
                       type='SSDAnchorGenerator', scale_major=False,
                       input_size=300, basesize_ratio_range=(0.15, 0.9),
                       strides=[8, 16, 32, 64],
                       ratios=[[2], [2, 3], [2, 3], [2]]),
                   test_cfg=None)
    assert head.cm_finals
    params = head.init(jax.random.PRNGKey(1))
    rng = np.random.RandomState(1)
    b = 2
    sizes = [(38, 38), (19, 19), (10, 10), (5, 5)]
    chans = (32, 48, 32, 32)
    feats = [jnp.asarray(rng.randn(b, h, w, c).astype(np.float32) * 0.3)
             for (h, w), c in zip(sizes, chans)]
    img_shapes = jnp.asarray([[300.0, 300.0], [300.0, 300.0]])
    scale_factors = jnp.ones((b, 4), jnp.float32)
    cfg = dict(nms_pre=500, score_thr=0.02,
               nms=dict(type='nms', iou_thr=0.45), max_per_img=40)
    _run_pair(head, params, feats, img_shapes, scale_factors, cfg)


def test_fcos_cm_finals_matches_nhwc():
    from arfe_tpu.models.dense_heads import FCOSHead
    head = FCOSHead(6, 32, feat_channels=32, stacked_convs=1,
                    strides=(8, 16, 32, 64, 128), test_cfg=None)
    assert head.cm_finals
    params = head.init(jax.random.PRNGKey(2))
    rng = np.random.RandomState(3)
    b = 2
    feats = [jnp.asarray(rng.randn(b, 40 // 2 ** i, 52 // 2 ** i, 32)
                         .astype(np.float32) * 0.3) for i in range(5)]
    img_shapes = jnp.asarray([[316.0, 410.0], [320.0, 416.0]])
    scale_factors = jnp.full((b, 4), 1.5, jnp.float32)
    cfg = dict(nms_pre=400, score_thr=0.02,
               nms=dict(type='nms', iou_thr=0.5), max_per_img=50)
    _run_pair(head, params, feats, img_shapes, scale_factors, cfg)


def test_atss_cm_finals_matches_nhwc():
    from arfe_tpu.models.dense_heads import ATSSHead
    head = ATSSHead(6, 32, feat_channels=32, stacked_convs=1,
                    anchor_generator=dict(
                        type='AnchorGenerator', octave_base_scale=8,
                        scales_per_octave=1, ratios=[1.0],
                        strides=[8, 16, 32, 64, 128]),
                    test_cfg=None)
    assert head.cm_finals
    params = head.init(jax.random.PRNGKey(3))
    rng = np.random.RandomState(4)
    b = 2
    feats = [jnp.asarray(rng.randn(b, 40 // 2 ** i, 52 // 2 ** i, 32)
                         .astype(np.float32) * 0.3) for i in range(5)]
    img_shapes = jnp.asarray([[316.0, 410.0], [320.0, 416.0]])
    scale_factors = jnp.full((b, 4), 1.5, jnp.float32)
    cfg = dict(nms_pre=400, score_thr=0.02,
               nms=dict(type='nms', iou_thr=0.5), max_per_img=50)
    _run_pair(head, params, feats, img_shapes, scale_factors, cfg)


def test_fovea_cm_finals_matches_nhwc():
    from arfe_tpu.models.dense_heads import FoveaHead
    head = FoveaHead(6, 32, feat_channels=32, stacked_convs=1,
                     test_cfg=None)
    assert head.cm_finals
    assert not FoveaHead(6, 32, feat_channels=32, stacked_convs=1,
                         with_deform=True, test_cfg=None).cm_finals
    params = head.init(jax.random.PRNGKey(4))
    rng = np.random.RandomState(5)
    b = 2
    feats = [jnp.asarray(rng.randn(b, 40 // 2 ** i, 52 // 2 ** i, 32)
                         .astype(np.float32) * 0.3) for i in range(5)]
    img_shapes = jnp.asarray([[316.0, 410.0], [320.0, 416.0]])
    scale_factors = jnp.full((b, 4), 1.5, jnp.float32)
    cfg = dict(nms_pre=400, score_thr=0.02,
               nms=dict(type='nms', iou_thr=0.5), max_per_img=50)
    _run_pair(head, params, feats, img_shapes, scale_factors, cfg)


def test_retina_sepbn_cm_finals_matches_nhwc():
    from arfe_tpu.models.dense_heads import RetinaSepBNHead
    head = RetinaSepBNHead(6, 5, 32, stacked_convs=1, feat_channels=32,
                           norm_cfg=dict(type='BN'),
                           anchor_generator=dict(
                               type='AnchorGenerator', octave_base_scale=4,
                               scales_per_octave=3, ratios=[0.5, 1.0, 2.0],
                               strides=[8, 16, 32, 64, 128]),
                           test_cfg=None)
    assert head.cm_finals
    params = head.init(jax.random.PRNGKey(5))
    rng = np.random.RandomState(6)
    b = 2
    feats = [jnp.asarray(rng.randn(b, 40 // 2 ** i, 52 // 2 ** i, 32)
                         .astype(np.float32) * 0.3) for i in range(5)]
    img_shapes = jnp.asarray([[316.0, 410.0], [320.0, 416.0]])
    scale_factors = jnp.full((b, 4), 1.5, jnp.float32)
    cfg = dict(nms_pre=400, score_thr=0.02,
               nms=dict(type='nms', iou_thr=0.5), max_per_img=50)
    _run_pair(head, params, feats, img_shapes, scale_factors, cfg)


def test_fsaf_opts_out():
    from arfe_tpu.models.dense_heads import FSAFHead
    assert not FSAFHead.cm_finals


@pytest.mark.parametrize('flag', ['0', '1'])
def test_detector_wiring(flag, monkeypatch):
    """SingleStageDetector.simple_test routes through the channel-major
    path (and the env kill-switch reverts it) with identical results."""
    from arfe_tpu.models import build_detector
    model_cfg = dict(
        type='RetinaNet',
        backbone=dict(type='ResNet', depth=18, base_channels=16,
                      num_stages=4, out_indices=(0, 1, 2, 3),
                      norm_eval=False, style='pytorch'),
        neck=dict(type='FPN', in_channels=[16, 32, 64, 128],
                  out_channels=16, start_level=1, add_extra_convs=True,
                  num_outs=5),
        bbox_head=dict(type='RetinaHead', num_classes=4, in_channels=16,
                       stacked_convs=1, feat_channels=16))
    test_cfg = dict(nms_pre=200, score_thr=0.05, max_per_img=20,
                    nms=dict(type='nms', iou_thr=0.5))
    model = build_detector(dict(model_cfg), test_cfg=test_cfg)
    params = jax.jit(model.init)(jax.random.PRNGKey(0))
    rng = np.random.RandomState(2)
    img = jnp.asarray(rng.randn(1, 64, 96, 3).astype(np.float32) * 0.2)
    img_shapes = jnp.asarray([[64.0, 96.0]])
    scale_factors = jnp.ones((1, 4), jnp.float32)
    monkeypatch.setenv('ARFE_TPU_CM_FINALS', flag)
    got = model.simple_test(params, img, img_shapes, scale_factors,
                            rescale=True)
    monkeypatch.setenv('ARFE_TPU_CM_FINALS', '0')
    ref = model.simple_test(params, img, img_shapes, scale_factors,
                            rescale=True)
    for name, r, g in zip(('dets', 'labels', 'valid'), ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), atol=1e-4,
                                   err_msg=name)
