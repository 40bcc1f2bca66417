"""End-to-end RetinaNet build + jitted inference smoke test (config #1
scaffolding, BASELINE.md milestone 1)."""
import jax
import jax.numpy as jnp
import numpy as np

from arfe_tpu.models import build_detector

MODEL_CFG = dict(
    type='RetinaNet',
    backbone=dict(type='ResNet', depth=18, num_stages=4,
                  out_indices=(0, 1, 2, 3), frozen_stages=1,
                  norm_cfg=dict(type='BN', requires_grad=True),
                  norm_eval=True, style='pytorch'),
    neck=dict(type='FPN', in_channels=[64, 128, 256, 512], out_channels=64,
              start_level=1, add_extra_convs='on_input', num_outs=5),
    bbox_head=dict(
        type='RetinaHead', num_classes=8, in_channels=64, stacked_convs=1,
        feat_channels=64,
        anchor_generator=dict(type='AnchorGenerator', octave_base_scale=4,
                              scales_per_octave=3, ratios=[0.5, 1.0, 2.0],
                              strides=[8, 16, 32, 64, 128]),
        bbox_coder=dict(type='DeltaXYWHBBoxCoder',
                        target_means=[0., 0., 0., 0.],
                        target_stds=[1.0, 1.0, 1.0, 1.0]),
        loss_cls=dict(type='FocalLoss', use_sigmoid=True, gamma=2.0,
                      alpha=0.25, loss_weight=1.0),
        loss_bbox=dict(type='L1Loss', loss_weight=1.0)))

TEST_CFG = dict(nms_pre=100, min_bbox_size=0, score_thr=0.01,
                nms=dict(type='nms', iou_thr=0.5), max_per_img=20,
                nms_cap=500)


def test_retinanet_inference_smoke():
    model = build_detector(dict(MODEL_CFG), test_cfg=dict(TEST_CFG))
    params = model.init(jax.random.PRNGKey(0))

    b, h, w = 2, 128, 160
    img = jnp.asarray(np.random.RandomState(0).randn(b, h, w, 3),
                      jnp.float32)
    img_shapes = jnp.array([[128., 160.], [120., 144.]])
    scale_factors = jnp.ones((b, 4), jnp.float32)

    fn = jax.jit(lambda p, i, s, f: model.simple_test(p, i, s, f,
                                                      rescale=True))
    dets, labels, valid = fn(params, img, img_shapes, scale_factors)
    assert dets.shape == (b, 20, 5)
    assert labels.shape == (b, 20)
    v = np.asarray(valid)
    d = np.asarray(dets)
    # valid rows have sane boxes; invalid rows have score -1
    assert (d[~v][:, 4] == -1).all()
    if v.any():
        assert (d[v][:, 4] >= 0.01 - 1e-6).all()
        assert (d[v][:, 2] >= d[v][:, 0]).all()
        assert (d[v][:, 3] >= d[v][:, 1]).all()
    # second call (no recompile) gives identical output
    dets2 = fn(params, img, img_shapes, scale_factors)[0]
    np.testing.assert_allclose(np.asarray(dets2), d)


def test_retinanet_feature_shapes():
    model = build_detector(dict(MODEL_CFG), test_cfg=dict(TEST_CFG))
    params = model.init(jax.random.PRNGKey(0))
    img = jnp.zeros((1, 128, 160, 3))
    feats = model.extract_feat(params, img)
    assert [f.shape[1:3] for f in feats] == \
        [(16, 20), (8, 10), (4, 5), (2, 3), (1, 2)]
    cls_scores, bbox_preds = model.bbox_head(params['bbox_head'], feats)
    assert cls_scores[0].shape == (1, 16, 20, 9 * 8)
    assert bbox_preds[0].shape == (1, 16, 20, 9 * 4)
