"""Faster R-CNN + AR-FPN end-to-end jitted inference (configs #3 scaffolding,
BASELINE.md milestones)."""
import jax
import jax.numpy as jnp
import numpy as np

from arfe_tpu.models import build_detector


def faster_cfg(with_arfpn=True):
    neck = [dict(type='FPN', in_channels=[64, 128, 256, 512],
                 out_channels=64, num_outs=5)]
    if with_arfpn:
        neck.append(dict(type='WFPNDualSpatial', in_channels=64,
                         num_levels=5))
    return dict(
        type='FasterRCNN',
        backbone=dict(type='ResNet', depth=18, num_stages=4,
                      out_indices=(0, 1, 2, 3), frozen_stages=1,
                      norm_eval=True, style='pytorch'),
        neck=neck,
        rpn_head=dict(
            type='RPNHead', in_channels=64, feat_channels=64,
            anchor_generator=dict(type='AnchorGenerator', scales=[8],
                                  ratios=[0.5, 1.0, 2.0],
                                  strides=[4, 8, 16, 32, 64]),
            bbox_coder=dict(type='DeltaXYWHBBoxCoder',
                            target_means=[0., 0., 0., 0.],
                            target_stds=[1., 1., 1., 1.]),
            loss_cls=dict(type='CrossEntropyLoss', use_sigmoid=True)),
        roi_head=dict(
            type='StandardRoIHead',
            bbox_roi_extractor=dict(
                type='SingleRoIExtractor',
                roi_layer=dict(type='RoIAlign', out_size=7, sample_num=0),
                out_channels=64, featmap_strides=[4, 8, 16, 32]),
            bbox_head=dict(
                type='Shared2FCBBoxHead', in_channels=64,
                fc_out_channels=128, roi_feat_size=7, num_classes=5,
                bbox_coder=dict(type='DeltaXYWHBBoxCoder',
                                target_means=[0., 0., 0., 0.],
                                target_stds=[0.1, 0.1, 0.2, 0.2]),
                reg_class_agnostic=False,
                loss_cls=dict(type='CrossEntropyLoss', use_sigmoid=False))))


TEST_CFG = dict(
    rpn=dict(nms_across_levels=False, nms_pre=100, nms_post=40, max_num=40,
             nms_thr=0.7, min_bbox_size=0),
    rcnn=dict(score_thr=0.05, nms=dict(type='nms', iou_thr=0.5),
              max_per_img=20, nms_cap=200))


def test_faster_rcnn_arfpn_inference():
    model = build_detector(faster_cfg(True), test_cfg=dict(TEST_CFG))
    params = model.init(jax.random.PRNGKey(0))
    b, h, w = 2, 128, 160
    img = jnp.asarray(np.random.RandomState(0).randn(b, h, w, 3) * 0.1,
                      jnp.float32)
    img_shapes = jnp.array([[128., 160.], [120., 150.]])
    scale_factors = jnp.ones((b, 4), jnp.float32)
    fn = jax.jit(lambda p, i, s, f: model.simple_test(p, i, s, f,
                                                      rescale=True))
    dets, labels, valid = fn(params, img, img_shapes, scale_factors)
    assert dets.shape == (b, 20, 5)
    d, v = np.asarray(dets), np.asarray(valid)
    assert (d[~v][:, 4] == -1).all()
    if v.any():
        assert np.isfinite(d[v]).all()


def test_rpn_proposals_valid():
    model = build_detector(faster_cfg(False), test_cfg=dict(TEST_CFG))
    params = model.init(jax.random.PRNGKey(1))
    img = jnp.asarray(np.random.RandomState(0).randn(1, 128, 160, 3) * 0.1,
                      jnp.float32)
    img_shapes = jnp.array([[128., 160.]])
    x = model.extract_feat(params, img)
    cls_scores, bbox_preds = model.rpn_head(params['rpn_head'], x)
    props, valid = model.rpn_head.get_bboxes(cls_scores, bbox_preds,
                                             img_shapes)
    assert props.shape == (1, 40, 5)
    p, v = np.asarray(props), np.asarray(valid)
    assert v.any()
    # proposals clipped to image
    assert (p[v][:, 0] >= 0).all() and (p[v][:, 2] <= 160).all()
    # scores descending among valid
    s = p[0][v[0]][:, 4]
    assert (np.diff(s) <= 1e-6).all()
