"""RPNHead.get_proposals (feature-direct, channel-major head matmuls) must
produce the same proposals as the NHWC forward + get_bboxes path (ref
semantics: mmdet/models/dense_heads/rpn_head.py:52-120). The channel-major
path exists because flattening 3/12-channel NHWC conv outputs costs ~9 ms
per bs8 flagship iteration on TPU purely in lane-untile copies."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arfe_tpu.models.dense_heads.rpn_head import RPNHead


def _make_head(use_sigmoid):
    return RPNHead(
        in_channels=32, feat_channels=32,
        anchor_generator=dict(type='AnchorGenerator', scales=[8],
                              ratios=[0.5, 1.0, 2.0],
                              strides=[4, 8, 16, 32, 64]),
        bbox_coder=dict(type='DeltaXYWHBBoxCoder'),
        loss_cls=dict(type='CrossEntropyLoss', use_sigmoid=use_sigmoid,
                      loss_weight=1.0),
        loss_bbox=dict(type='L1Loss', loss_weight=1.0),
        test_cfg=dict(nms_pre=200, nms_post=100, max_num=100, nms_thr=0.7,
                      min_bbox_size=0))


@pytest.mark.parametrize('use_sigmoid', [True, False])
def test_get_proposals_matches_get_bboxes(use_sigmoid):
    head = _make_head(use_sigmoid)
    params = head.init(jax.random.PRNGKey(0))
    b = 2
    shapes = [(32, 48), (16, 24), (8, 12), (4, 6), (2, 3)]
    r = np.random.RandomState(0)
    feats = [jnp.asarray(r.randn(b, h, w, 32).astype(np.float32) * 0.5)
             for h, w in shapes]
    img_shapes = jnp.asarray([[128.0, 190.0]] * b)
    cls_scores, bbox_preds = head(params, feats)
    d1, v1 = head.get_bboxes(cls_scores, bbox_preds, img_shapes)
    d2, v2 = head.get_proposals(params, feats, img_shapes)
    d1, v1, d2, v2 = map(np.asarray, (d1, v1, d2, v2))
    np.testing.assert_array_equal(v1.sum(1), v2.sum(1))
    for i in range(b):
        # both come out score-sorted; compare as sets (exact ties may
        # reorder between the (hw, a) and (a, hw) candidate orders)
        a = d1[i][v1[i]]
        c = d2[i][v2[i]]
        a = a[np.lexsort(a.T)]
        c = c[np.lexsort(c.T)]
        np.testing.assert_allclose(a, c, atol=1e-4)


def test_get_proposals_shared_reuse():
    """Passing precomputed shared features (the forward_train path) gives
    the same result as recomputing them internally."""
    head = _make_head(True)
    params = head.init(jax.random.PRNGKey(1))
    shapes = [(16, 24), (8, 12), (4, 6), (2, 3), (1, 2)]
    r = np.random.RandomState(1)
    feats = [jnp.asarray(r.randn(1, h, w, 32).astype(np.float32))
             for h, w in shapes]
    img_shapes = jnp.asarray([[64.0, 96.0]])
    shared = [head.shared_single(params, f) for f in feats]
    d1, v1 = head.get_proposals(params, feats, img_shapes)
    d2, v2 = head.get_proposals(params, feats, img_shapes, shared=shared)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2))


def test_loss_from_shared_matches_loss():
    """Channel-major RPN loss == NHWC loss when the sampler takes every
    candidate (selection is then order-independent, so only the candidate
    reorder itself is under test)."""
    head = RPNHead(
        in_channels=32, feat_channels=32,
        anchor_generator=dict(type='AnchorGenerator', scales=[8],
                              ratios=[0.5, 1.0, 2.0],
                              strides=[4, 8, 16, 32, 64]),
        bbox_coder=dict(type='DeltaXYWHBBoxCoder'),
        loss_cls=dict(type='CrossEntropyLoss', use_sigmoid=True,
                      loss_weight=1.0),
        loss_bbox=dict(type='L1Loss', loss_weight=1.0),
        train_cfg=dict(
            assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.7,
                          neg_iou_thr=0.3, min_pos_iou=0.3,
                          match_low_quality=True),
            sampler=dict(type='RandomSampler', num=100000, pos_fraction=0.5,
                         add_gt_as_proposals=False),
            allowed_border=-1, pos_weight=-1))
    params = head.init(jax.random.PRNGKey(0))
    b = 2
    shapes = [(32, 48), (16, 24), (8, 12), (4, 6), (2, 3)]
    r = np.random.RandomState(0)
    feats = [jnp.asarray(r.randn(b, h, w, 32).astype(np.float32) * 0.5)
             for h, w in shapes]
    img_shapes = jnp.asarray([[128.0, 190.0]] * b)
    gt = jnp.asarray([[[10, 10, 60, 80], [40, 30, 100, 110]],
                      [[5, 20, 70, 60], [0, 0, 0, 0]]], jnp.float32)
    gv = jnp.asarray([[True, True], [True, False]])
    key = jax.random.PRNGKey(7)
    cls_scores, bbox_preds = head(params, feats)
    l1 = head.loss(cls_scores, bbox_preds, gt, gv, img_shapes, key)
    shared = [head.shared_single(params, f) for f in feats]
    l2 = head.loss_from_shared(params, shared, gt, gv, img_shapes, key)
    for k in l1:
        np.testing.assert_allclose(float(l1[k]), float(l2[k]), atol=2e-4)
