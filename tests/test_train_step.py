"""End-to-end training: loss decreases; multi-device DP step runs on the
8-device virtual CPU mesh (SURVEY.md §4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arfe_tpu.models import build_detector
from arfe_tpu.parallel import make_dp_train_step, make_mesh, replicate, \
    shard_batch
from arfe_tpu.train import (build_lr_schedule, build_optimizer,
                            frozen_prefixes_from_cfg, make_train_step)

from test_faster_rcnn_smoke import TEST_CFG, faster_cfg

RETINA_CFG = dict(
    type='RetinaNet',
    backbone=dict(type='ResNet', depth=18, num_stages=4,
                  out_indices=(0, 1, 2, 3), frozen_stages=1, norm_eval=True,
                  style='pytorch'),
    neck=dict(type='FPN', in_channels=[64, 128, 256, 512], out_channels=64,
              start_level=1, add_extra_convs='on_input', num_outs=5),
    bbox_head=dict(
        type='RetinaHead', num_classes=8, in_channels=64, stacked_convs=1,
        feat_channels=64,
        anchor_generator=dict(type='AnchorGenerator', octave_base_scale=4,
                              scales_per_octave=3, ratios=[0.5, 1.0, 2.0],
                              strides=[8, 16, 32, 64, 128]),
        bbox_coder=dict(type='DeltaXYWHBBoxCoder',
                        target_means=[0.] * 4, target_stds=[1.0] * 4),
        loss_cls=dict(type='FocalLoss', use_sigmoid=True, gamma=2.0,
                      alpha=0.25, loss_weight=1.0),
        loss_bbox=dict(type='L1Loss', loss_weight=1.0)))

RETINA_TRAIN_CFG = dict(
    assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.5, neg_iou_thr=0.4,
                  min_pos_iou=0, ignore_iof_thr=-1),
    allowed_border=-1, pos_weight=-1, debug=False)

FASTER_TRAIN_CFG = dict(
    rpn=dict(
        assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.7,
                      neg_iou_thr=0.3, min_pos_iou=0.3,
                      match_low_quality=True, ignore_iof_thr=-1),
        sampler=dict(type='RandomSampler', num=64, pos_fraction=0.5,
                     neg_pos_ub=-1, add_gt_as_proposals=False),
        allowed_border=-1, pos_weight=-1, debug=False),
    rpn_proposal=dict(nms_across_levels=False, nms_pre=100, nms_post=40,
                      max_num=40, nms_thr=0.7, min_bbox_size=0),
    rcnn=dict(
        assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.5,
                      neg_iou_thr=0.5, min_pos_iou=0.5,
                      match_low_quality=False, ignore_iof_thr=-1),
        sampler=dict(type='RandomSampler', num=32, pos_fraction=0.25,
                     neg_pos_ub=-1, add_gt_as_proposals=True),
        pos_weight=-1, debug=False))


def make_batch(b=2, h=128, w=160, g=8, num_classes=8, seed=0):
    r = np.random.RandomState(seed)
    img = r.randn(b, h, w, 3).astype(np.float32) * 0.2
    gt_bboxes = np.zeros((b, g, 4), np.float32)
    gt_valid = np.zeros((b, g), bool)
    gt_labels = np.zeros((b, g), np.int32)
    for i in range(b):
        n = r.randint(2, 5)
        xy = r.uniform(0, [w - 40, h - 40], (n, 2))
        wh = r.uniform(15, 40, (n, 2))
        gt_bboxes[i, :n] = np.concatenate([xy, xy + wh], -1)
        gt_valid[i, :n] = True
        gt_labels[i, :n] = r.randint(0, num_classes, n)
        # put a bright blob where each gt is, so there is signal
        for (x1, y1), (dw, dh) in zip(xy, wh):
            img[i, int(y1):int(y1 + dh), int(x1):int(x1 + dw)] += 1.0
    return dict(img=jnp.asarray(img),
                img_shape=jnp.asarray([[float(h), float(w)]] * b),
                gt_bboxes=jnp.asarray(gt_bboxes),
                gt_valid=jnp.asarray(gt_valid),
                gt_labels=jnp.asarray(gt_labels))


def _fit(model_cfg, train_cfg, test_cfg, steps=12, lr=0.01, num_classes=8):
    model = build_detector(dict(model_cfg), train_cfg=dict(train_cfg),
                           test_cfg=dict(test_cfg) if test_cfg else None)
    params = model.init(jax.random.PRNGKey(0))
    sched = build_lr_schedule(dict(policy='fixed'), lr, 1000)
    opt = build_optimizer(dict(type='SGD', momentum=0.9, weight_decay=1e-4),
                          sched, params,
                          frozen_prefixes_from_cfg(model_cfg))
    opt_state = opt.init(params)
    step = make_train_step(model, opt, donate=False)
    batch = make_batch(num_classes=num_classes)
    logs = []
    for i in range(steps):
        params, opt_state, log_vars = step(params, opt_state, batch,
                                           jax.random.PRNGKey(i))
        logs.append({k: float(v) for k, v in log_vars.items()})
    return logs, params


def test_retinanet_train_loss_decreases():
    logs, _ = _fit(RETINA_CFG, RETINA_TRAIN_CFG, None, steps=10, lr=0.005)
    assert np.isfinite([l['loss'] for l in logs]).all()
    assert logs[-1]['loss'] < logs[0]['loss']
    assert logs[0]['loss_cls'] > 0 and logs[0]['loss_bbox'] > 0


def test_faster_rcnn_train_loss_decreases():
    logs, _ = _fit(faster_cfg(True), FASTER_TRAIN_CFG, TEST_CFG, steps=10,
                   lr=0.005, num_classes=5)
    total = [l['loss'] for l in logs]
    assert np.isfinite(total).all()
    assert total[-1] < total[0]
    for k in ('loss_rpn_cls', 'loss_rpn_bbox', 'loss_cls', 'loss_bbox'):
        assert k in logs[0], logs[0].keys()


def test_frozen_backbone_unchanged_after_step():
    model_cfg = RETINA_CFG
    model = build_detector(dict(model_cfg), train_cfg=dict(RETINA_TRAIN_CFG))
    params = model.init(jax.random.PRNGKey(0))
    sched = build_lr_schedule(dict(policy='fixed'), 0.01, 1000)
    opt = build_optimizer(dict(type='SGD', momentum=0.9, weight_decay=1e-4),
                          sched, params,
                          frozen_prefixes_from_cfg(model_cfg))
    opt_state = opt.init(params)
    step = make_train_step(model, opt, donate=False)
    batch = make_batch()
    before_frozen = np.asarray(params['backbone']['conv1']['weight'])
    before_stats = np.asarray(
        params['backbone']['layer2']['0']['bn1']['running_mean'])
    p2, _, _ = step(params, opt_state, batch, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(
        np.asarray(p2['backbone']['conv1']['weight']), before_frozen)
    np.testing.assert_array_equal(
        np.asarray(p2['backbone']['layer2']['0']['bn1']['running_mean']),
        before_stats)
    # non-frozen layer did change
    assert not np.array_equal(
        np.asarray(p2['backbone']['layer2']['0']['conv1']['weight']),
        np.asarray(params['backbone']['layer2']['0']['conv1']['weight']))


def test_dp_train_step_8_devices():
    assert len(jax.devices()) == 8, 'conftest must force 8 cpu devices'
    mesh = make_mesh()
    assert mesh.shape['data'] == 8
    model = build_detector(dict(RETINA_CFG), train_cfg=dict(RETINA_TRAIN_CFG))
    params = model.init(jax.random.PRNGKey(0))
    sched = build_lr_schedule(dict(policy='step', warmup='linear',
                                   warmup_iters=3, warmup_ratio=0.1,
                                   step=[8, 11]), 0.01, 10)
    opt = build_optimizer(dict(type='SGD', momentum=0.9, weight_decay=1e-4),
                          sched, params, frozen_prefixes_from_cfg(RETINA_CFG))
    with mesh:
        params = replicate(mesh, params)
        opt_state = replicate(mesh, opt.init(params))
        step = make_dp_train_step(model, opt, mesh)
        batch = shard_batch(mesh, make_batch(b=8))
        p2, o2, logs = step(params, opt_state, batch, jax.random.PRNGKey(0))
        assert np.isfinite(float(logs['loss']))
        p3, o3, logs2 = step(p2, o2, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(logs2['loss']))
