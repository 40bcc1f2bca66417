"""TTA: merge_augs golden math + detector aug_test consistency."""
import jax
import jax.numpy as jnp
import numpy as np

from arfe_tpu.core.post import (merge_aug_bboxes, merge_aug_masks,
                                merge_aug_proposals)
from arfe_tpu.models import build_detector

from test_train_step import make_batch


def test_merge_aug_proposals_mapping():
    # aug0: identity; aug1: scale x2 + horizontal flip in a 100-wide frame
    p0 = jnp.asarray([[[10., 20., 30., 40., 0.9]]])          # (1, 1, 5)
    # the same box seen at 2x scale and flipped: x1' = W - 2*x2 etc.
    w = 200.
    p1 = jnp.asarray([[[w - 60., 40., w - 20., 80., 0.8]]])
    valids = [jnp.ones((1, 1), bool)] * 2
    shapes = [jnp.asarray([[50., 100.]]), jnp.asarray([[100., 200.]])]
    sfs = [jnp.ones((1, 4), jnp.float32),
           jnp.full((1, 4), 2.0, jnp.float32)]
    merged, valid = merge_aug_proposals(
        [p0, p1], valids, shapes, sfs, [False, True],
        dict(nms_thr=0.5, max_num=4))
    m = np.asarray(merged[0])
    v = np.asarray(valid[0])
    # both map to the same original box -> NMS keeps one (score 0.9)
    assert v[0] and not v[1]
    np.testing.assert_allclose(m[0], [10, 20, 30, 40, 0.9], atol=1e-4)


def test_merge_aug_bboxes_average():
    b0 = jnp.asarray([[[10., 10., 20., 20.]]])
    b1 = jnp.asarray([[[80., 10., 90., 20.]]])   # flipped in 100-wide frame
    shapes = [jnp.asarray([[50., 100.]])] * 2
    sfs = [jnp.ones((1, 4), jnp.float32)] * 2
    s0 = jnp.asarray([[[0.6, 0.4]]])
    s1 = jnp.asarray([[[0.8, 0.2]]])
    boxes, scores = merge_aug_bboxes([b0, b1], [s0, s1], shapes, sfs,
                                     [False, True])
    np.testing.assert_allclose(np.asarray(boxes[0, 0]), [10, 10, 20, 20],
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(scores[0, 0]), [0.7, 0.3],
                               atol=1e-6)


def test_merge_aug_masks_unflip():
    m0 = jnp.arange(8.0).reshape(1, 1, 2, 4)
    m1 = m0[..., ::-1]
    out = merge_aug_masks([m0, m1], [False, True])
    np.testing.assert_allclose(np.asarray(out), np.asarray(m0))


TINY_FRCNN = dict(
    type='FasterRCNN',
    backbone=dict(type='ResNet', depth=18, num_stages=4,
                  out_indices=(0, 1, 2, 3), frozen_stages=1, norm_eval=True,
                  style='pytorch'),
    neck=dict(type='FPN', in_channels=[64, 128, 256, 512], out_channels=64,
              num_outs=5),
    rpn_head=dict(
        type='RPNHead', in_channels=64, feat_channels=64,
        anchor_generator=dict(type='AnchorGenerator', scales=[8],
                              ratios=[0.5, 1.0, 2.0],
                              strides=[4, 8, 16, 32, 64]),
        bbox_coder=dict(type='DeltaXYWHBBoxCoder', target_means=[0.] * 4,
                        target_stds=[1.0] * 4),
        loss_cls=dict(type='CrossEntropyLoss', use_sigmoid=True)),
    roi_head=dict(
        type='StandardRoIHead',
        bbox_roi_extractor=dict(
            type='SingleRoIExtractor',
            roi_layer=dict(type='RoIAlign', out_size=7, sample_num=0),
            out_channels=64, featmap_strides=[4, 8, 16, 32]),
        bbox_head=dict(
            type='Shared2FCBBoxHead', in_channels=64, fc_out_channels=128,
            roi_feat_size=7, num_classes=4,
            bbox_coder=dict(type='DeltaXYWHBBoxCoder',
                            target_means=[0.] * 4,
                            target_stds=[0.1, 0.1, 0.2, 0.2]),
            reg_class_agnostic=False,
            loss_cls=dict(type='CrossEntropyLoss', use_sigmoid=False))))
TEST_CFG = dict(
    rpn=dict(nms_pre=100, nms_post=32, max_num=32, nms_thr=0.7,
             min_bbox_size=0),
    rcnn=dict(score_thr=0.01, nms=dict(type='nms', iou_thr=0.5),
              max_per_img=10, nms_cap=200))


def test_two_stage_aug_test_identity_augs_match_simple_test():
    """Two identical augs (no flip, same scale) must reproduce
    simple_test."""
    model = build_detector(dict(TINY_FRCNN), test_cfg=dict(TEST_CFG))
    params = model.init(jax.random.PRNGKey(0))
    batch = make_batch()
    img = batch['img'][:1]
    shp = batch['img_shape'][:1]
    sf = jnp.ones((1, 4), jnp.float32)

    sd, sl, sv = model.simple_test(params, img, shp, sf, rescale=True)
    ad, al, av = model.aug_test(params, [img, img], [shp, shp], [sf, sf],
                                [False, False], rescale=True)
    sd, sl, sv = np.asarray(sd[0]), np.asarray(sl[0]), np.asarray(sv[0])
    ad, al, av = np.asarray(ad[0]), np.asarray(al[0]), np.asarray(av[0])
    # same surviving detections (averaging two identical passes is identity)
    assert av.sum() == sv.sum()
    np.testing.assert_allclose(np.sort(ad[av][:, 4])[::-1],
                               np.sort(sd[sv][:, 4])[::-1], atol=1e-4)


def test_two_stage_aug_test_flip_smoke():
    model = build_detector(dict(TINY_FRCNN), test_cfg=dict(TEST_CFG))
    params = model.init(jax.random.PRNGKey(0))
    batch = make_batch()
    img = batch['img'][:1]
    shp = batch['img_shape'][:1]
    sf = jnp.ones((1, 4), jnp.float32)
    flipped = img[:, :, ::-1, :]
    dets, labels, valid = jax.jit(
        lambda p, a, b: model.aug_test(p, [a, b], [shp, shp], [sf, sf],
                                       [False, True], rescale=True))(
        params, img, flipped)
    assert dets.shape == (1, 10, 5)
    assert np.isfinite(np.asarray(dets)).all()


def test_single_stage_aug_test_smoke():
    from test_more_models import FCOS_CFG, FCOS_TEST_CFG
    model = build_detector(dict(FCOS_CFG), test_cfg=dict(FCOS_TEST_CFG))
    params = model.init(jax.random.PRNGKey(0))
    batch = make_batch()
    img = batch['img'][:1]
    shp = batch['img_shape'][:1]
    sf = jnp.ones((1, 4), jnp.float32)
    dets, labels, valid = model.aug_test(
        params, [img, img[:, :, ::-1, :]], [shp, shp], [sf, sf],
        [False, True], rescale=True)
    assert dets.shape == (1, 20, 5)
    assert np.isfinite(np.asarray(dets)).all()
