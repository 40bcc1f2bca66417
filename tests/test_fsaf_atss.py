"""FSAF + ATSS: assigner golden tests (vs a numpy port of the reference
algorithms) and head smoke tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arfe_tpu.core.bbox import ATSSAssigner, CenterRegionAssigner
from arfe_tpu.models import build_detector

from test_train_step import make_batch


def _pad_gt(boxes, labels, g_max=8):
    g = len(boxes)
    gb = np.zeros((g_max, 4), np.float32)
    gl = np.zeros((g_max,), np.int32)
    gv = np.zeros((g_max,), bool)
    gb[:g] = boxes
    gl[:g] = labels
    gv[:g] = True
    return jnp.asarray(gb), jnp.asarray(gl), jnp.asarray(gv)


def test_center_region_assigner_reference_example():
    """Docstring example from center_region_assigner.py:143-149."""
    assigner = CenterRegionAssigner(pos_scale=0.2, neg_scale=0.2)
    bboxes = jnp.array([[0, 0, 10, 10], [10, 10, 20, 20]], jnp.float32)
    gb, gl, gv = _pad_gt([[0, 0, 10, 10]], [1])
    res = assigner.assign(bboxes, gb, gv, gl)
    np.testing.assert_array_equal(np.asarray(res['assigned_gt_inds']), [1, 0])


def test_center_region_assigner_priority_and_shadow():
    # two overlapping gts: the smaller one has larger priority ONLY under
    # the reference's argsort-as-priority quirk; verify against a numpy
    # port of the reference logic
    assigner = CenterRegionAssigner(pos_scale=0.5, neg_scale=0.8)
    bboxes = jnp.array([
        [18, 18, 22, 22],   # center (20,20) in both cores
        [5, 5, 9, 9],       # center (7,7) in big gt's shadow region only
        [50, 50, 60, 60],   # outside everything
    ], jnp.float32)
    gb, gl, gv = _pad_gt([[0, 0, 40, 40], [15, 15, 25, 25]], [2, 5])
    res = assigner.assign(bboxes, gb, gv, gl)
    a = np.asarray(res['assigned_gt_inds'])
    # reference quirk: priority = argsort(areas, desc) = [0, 1] -> gt2 (idx
    # 1, priority value 1) wins the overlap
    assert a[0] == 2
    assert a[2] == 0
    shadow = np.asarray(res['shadowed_mat'])
    assert shadow[0, 0]      # anchor 0 also in gt1 core -> shadowed for gt1
    assert shadow[1].any()   # anchor 1 in a shadow region


def _atss_reference_numpy(boxes, nlvl, gts, labels, topk=9):
    """Direct numpy port of atss_assigner.py:29-167 (dynamic shapes)."""
    INF = 10 ** 8
    n, g = len(boxes), len(gts)
    if g == 0:
        return np.zeros(n, np.int64)

    def iou(a, b):
        lt = np.maximum(a[:, None, :2], b[None, :, :2])
        rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
        wh = np.clip(rb - lt, 0, None)
        inter = wh[..., 0] * wh[..., 1]
        aa = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
        ab = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
        return inter / np.maximum(aa[:, None] + ab[None, :] - inter, 1e-10)

    overlaps = iou(boxes, gts)
    gt_c = (gts[:, :2] + gts[:, 2:]) / 2
    bc = (boxes[:, :2] + boxes[:, 2:]) / 2
    dist = np.sqrt(((bc[:, None] - gt_c[None]) ** 2).sum(-1))
    cand = []
    start = 0
    for nl in nlvl:
        d = dist[start:start + nl]
        k = min(topk, nl)
        idx = np.argsort(d, axis=0, kind='stable')[:k]
        cand.append(idx + start)
        start += nl
    cand = np.concatenate(cand, 0)
    cious = overlaps[cand, np.arange(g)]
    thr = cious.mean(0) + cious.std(0, ddof=1)
    is_pos = cious >= thr[None]
    cx, cy = bc[:, 0][cand], bc[:, 1][cand]
    inside = np.stack([cx - gts[:, 0], cy - gts[:, 1],
                       gts[:, 2] - cx, gts[:, 3] - cy], 1).min(1) > 0.01
    is_pos &= inside
    ovl = np.full((n, g), -float(INF))
    for gi in range(g):
        sel = cand[:, gi][is_pos[:, gi]]
        ovl[sel, gi] = overlaps[sel, gi]
    assigned = np.zeros(n, np.int64)
    mx = ovl.max(1)
    assigned[mx > -INF] = ovl.argmax(1)[mx > -INF] + 1
    return assigned


def test_atss_assigner_matches_reference_port():
    rng = np.random.RandomState(0)
    nlvl = [64, 16, 4]
    boxes = []
    for sz, stride in zip([8, 4, 2], [8, 16, 32]):
        xs, ys = np.meshgrid(np.arange(sz), np.arange(sz))
        cx = (xs.ravel() + 0.5) * stride
        cy = (ys.ravel() + 0.5) * stride
        s = stride * 1.0
        boxes.append(np.stack([cx - s, cy - s, cx + s, cy + s], -1))
    boxes = np.concatenate(boxes, 0).astype(np.float32)
    gts = np.array([[4, 4, 30, 28], [20, 25, 60, 62], [2, 40, 18, 60]],
                   np.float32)
    ref = _atss_reference_numpy(boxes, nlvl, gts, None, topk=5)

    assigner = ATSSAssigner(topk=5)
    gb, gl, gv = _pad_gt(gts, [1, 2, 3])
    res = assigner.assign(jnp.asarray(boxes), nlvl, gb, gv, gl)
    got = np.asarray(res['assigned_gt_inds'])
    np.testing.assert_array_equal(got, ref)
    # labels follow the assignment
    lbl = np.asarray(res['labels'])
    assert (lbl[got > 0] == np.array([1, 2, 3])[got[got > 0] - 1]).all()
    assert (lbl[got == 0] == -1).all()


FSAF_CFG = dict(
    type='FSAF',
    backbone=dict(type='ResNet', depth=18, num_stages=4,
                  out_indices=(0, 1, 2, 3), frozen_stages=1, norm_eval=True,
                  style='pytorch'),
    neck=dict(type='FPN', in_channels=[64, 128, 256, 512], out_channels=64,
              start_level=1, add_extra_convs='on_input', num_outs=5),
    bbox_head=dict(
        type='FSAFHead', num_classes=8, in_channels=64, stacked_convs=1,
        feat_channels=64, reg_decoded_bbox=True,
        anchor_generator=dict(type='AnchorGenerator', octave_base_scale=1,
                              scales_per_octave=1, ratios=[1.0],
                              strides=[8, 16, 32, 64, 128]),
        bbox_coder=dict(type='TBLRBBoxCoder', normalizer=4.0),
        loss_cls=dict(type='FocalLoss', use_sigmoid=True, gamma=2.0,
                      alpha=0.25, loss_weight=1.0, reduction='none'),
        loss_bbox=dict(type='IoULoss', eps=1e-6, loss_weight=1.0,
                       reduction='none')))
FSAF_TRAIN_CFG = dict(
    assigner=dict(type='CenterRegionAssigner', pos_scale=0.2, neg_scale=0.2,
                  min_pos_iof=0.01),
    allowed_border=-1, pos_weight=-1)
TEST_CFG = dict(nms_pre=100, score_thr=0.05,
                nms=dict(type='nms', iou_thr=0.5), max_per_img=20,
                nms_cap=300)


def test_fsaf_detector_train_and_infer():
    model = build_detector(dict(FSAF_CFG), train_cfg=dict(FSAF_TRAIN_CFG),
                           test_cfg=dict(TEST_CFG))
    params = model.init(jax.random.PRNGKey(0))
    batch = make_batch()
    losses = model.forward_train(params, batch['img'], batch['img_shape'],
                                 batch['gt_bboxes'], batch['gt_valid'],
                                 batch['gt_labels'], jax.random.PRNGKey(0))
    assert np.isfinite(float(losses['loss_cls']))
    assert np.isfinite(float(losses['loss_bbox']))
    # each valid gt selects exactly one level
    hist = np.asarray(losses['gt_assign_hist'])
    assert hist.shape == (5,)
    assert hist.sum() == np.asarray(batch['gt_valid']).sum()

    dets, labels, valid = jax.jit(
        lambda p, i, s, f: model.simple_test(p, i, s, f, rescale=True))(
        params, batch['img'], batch['img_shape'],
        jnp.ones((2, 4), jnp.float32))
    assert dets.shape == (2, 20, 5)

    # gradients flow through both branches
    g = jax.grad(lambda p: sum(
        v for kk, v in model.forward_train(
            p, batch['img'], batch['img_shape'], batch['gt_bboxes'],
            batch['gt_valid'], batch['gt_labels'],
            jax.random.PRNGKey(0)).items() if 'loss' in kk))(params)
    assert np.isfinite(
        np.asarray(g['bbox_head']['retina_reg']['weight']).sum())


ATSS_CFG = dict(
    type='ATSS',
    backbone=dict(type='ResNet', depth=18, num_stages=4,
                  out_indices=(0, 1, 2, 3), frozen_stages=1, norm_eval=True,
                  style='pytorch'),
    neck=dict(type='FPN', in_channels=[64, 128, 256, 512], out_channels=64,
              start_level=1, add_extra_convs='on_output', num_outs=5),
    bbox_head=dict(
        type='ATSSHead', num_classes=8, in_channels=64, stacked_convs=1,
        feat_channels=64,
        anchor_generator=dict(type='AnchorGenerator', ratios=[1.0],
                              octave_base_scale=8, scales_per_octave=1,
                              strides=[8, 16, 32, 64, 128]),
        bbox_coder=dict(type='DeltaXYWHBBoxCoder',
                        target_means=[.0, .0, .0, .0],
                        target_stds=[0.1, 0.1, 0.2, 0.2]),
        loss_cls=dict(type='FocalLoss', use_sigmoid=True, gamma=2.0,
                      alpha=0.25, loss_weight=1.0),
        loss_bbox=dict(type='GIoULoss', loss_weight=2.0),
        loss_centerness=dict(type='CrossEntropyLoss', use_sigmoid=True,
                             loss_weight=1.0)))
ATSS_TRAIN_CFG = dict(assigner=dict(type='ATSSAssigner', topk=9),
                      allowed_border=-1, pos_weight=-1)


def test_atss_detector_train_and_infer():
    model = build_detector(dict(ATSS_CFG), train_cfg=dict(ATSS_TRAIN_CFG),
                           test_cfg=dict(TEST_CFG))
    params = model.init(jax.random.PRNGKey(0))
    batch = make_batch()
    losses = model.forward_train(params, batch['img'], batch['img_shape'],
                                 batch['gt_bboxes'], batch['gt_valid'],
                                 batch['gt_labels'], jax.random.PRNGKey(0))
    for k in ('loss_cls', 'loss_bbox', 'loss_centerness'):
        assert np.isfinite(float(losses[k])), k

    dets, labels, valid = jax.jit(
        lambda p, i, s, f: model.simple_test(p, i, s, f, rescale=True))(
        params, batch['img'], batch['img_shape'],
        jnp.ones((2, 4), jnp.float32))
    assert dets.shape == (2, 20, 5)

    g = jax.grad(lambda p: sum(
        v for kk, v in model.forward_train(
            p, batch['img'], batch['img_shape'], batch['gt_bboxes'],
            batch['gt_valid'], batch['gt_labels'],
            jax.random.PRNGKey(0)).items() if 'loss' in kk))(params)
    assert np.abs(np.asarray(g['bbox_head']['scales'])).sum() > 0


def test_fsaf_atss_configs_build():
    from arfe_tpu import Config
    for path in ('configs/fsaf/fsaf_r50_fpn_1x_coco.py',
                 'configs/atss/atss_r50_fpn_1x_coco.py',
                 'configs/arfe/faster_fsaf_r50_1x_coco.py'):
        cfg = Config.fromfile(f'/root/repo/{path}')
        d = cfg.todict()
        m = dict(d['model'])
        m.pop('pretrained', None)
        model = build_detector(m, train_cfg=d['train_cfg'],
                               test_cfg=d['test_cfg'])
        assert model is not None, path
