"""OHEM-family samplers, GHM losses, DoubleHead and MaskScoring RoI heads."""
import jax
import jax.numpy as jnp
import numpy as np
import torch

from arfe_tpu.core.bbox import (InstanceBalancedPosSampler,
                                IoUBalancedNegSampler, OHEMSampler)
from arfe_tpu.models import build_detector
from arfe_tpu.models.losses import GHMC, GHMR

from test_train_step import make_batch


def _ghmc_reference_torch(pred, target, label_weight, bins=10):
    """Numpy/torch port of the reference GHMC loop
    (ghm_loss.py:50-96, momentum=0)."""
    import torch.nn.functional as F
    pred = torch.as_tensor(pred)
    target = torch.as_tensor(target).float()
    label_weight = torch.as_tensor(label_weight).float()
    edges = torch.arange(bins + 1).float() / bins
    edges[-1] += 1e-6
    weights = torch.zeros_like(pred)
    g = torch.abs(pred.sigmoid() - target)
    valid = label_weight > 0
    tot = max(valid.float().sum().item(), 1.0)
    n = 0
    for i in range(bins):
        inds = (g >= edges[i]) & (g < edges[i + 1]) & valid
        num_in_bin = inds.sum().item()
        if num_in_bin > 0:
            weights[inds] = tot / num_in_bin
            n += 1
    if n > 0:
        weights = weights / n
    return float(F.binary_cross_entropy_with_logits(
        pred, target, weights, reduction='sum') / tot)


def test_ghmc_matches_reference_port():
    rng = np.random.RandomState(0)
    pred = rng.randn(40, 6).astype(np.float32)
    target = np.zeros((40, 6), np.float32)
    target[np.arange(40) % 2 == 0, rng.randint(0, 6, 20)] = 1
    weight = (rng.rand(40, 6) > 0.1).astype(np.float32)
    ref = _ghmc_reference_torch(pred, target, weight)
    got = float(GHMC(bins=10)(jnp.asarray(pred), jnp.asarray(target),
                              jnp.asarray(weight)))
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_ghmc_int_labels():
    pred = jnp.asarray(np.random.RandomState(1).randn(20, 5), jnp.float32)
    labels = jnp.asarray(np.random.RandomState(2).randint(0, 6, 20))
    lw = jnp.ones((20,), jnp.float32)
    out = float(GHMC(bins=10)(pred, labels, lw))
    assert np.isfinite(out) and out > 0


def test_ghmr_matches_reference_port():
    rng = np.random.RandomState(3)
    pred = rng.randn(30, 4).astype(np.float32)
    target = rng.randn(30, 4).astype(np.float32)
    weight = (rng.rand(30, 4) > 0.3).astype(np.float32)

    mu, bins = 0.02, 10
    tp, tt, tw = map(torch.as_tensor, (pred, target, weight))
    diff = tp - tt
    loss = torch.sqrt(diff * diff + mu * mu) - mu
    g = torch.abs(diff / torch.sqrt(mu * mu + diff * diff))
    edges = torch.arange(bins + 1).float() / bins
    edges[-1] = 1e3
    weights = torch.zeros_like(g)
    valid = tw > 0
    tot = max(tw.float().sum().item(), 1.0)
    n = 0
    for i in range(bins):
        inds = (g >= edges[i]) & (g < edges[i + 1]) & valid
        num = inds.sum().item()
        if num > 0:
            n += 1
            weights[inds] = tot / num
    if n > 0:
        weights /= n
    ref = float((loss * weights).sum() / tot)

    got = float(GHMR(mu=mu, bins=bins)(jnp.asarray(pred), jnp.asarray(target),
                                       jnp.asarray(weight)))
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_ohem_picks_hardest():
    sampler = OHEMSampler(num=4, pos_fraction=0.5)
    assigned = jnp.asarray([1, 1, 1, 0, 0, 0, 0, 0], jnp.int32)
    # pos losses: cand2 highest of 3; neg losses: cands 6,7 highest
    hard = jnp.asarray([0.1, 0.2, 5.0, 0.1, 0.2, 0.3, 9.0, 8.0])
    out = sampler.sample(jax.random.PRNGKey(0), assigned, hard_scores=hard)
    sel = set(np.asarray(out['inds'])[np.asarray(out['valid'])].tolist())
    # 2 pos slots -> hardest two positives {2, 1}; 2 neg slots -> {6, 7}
    assert {2, 6, 7}.issubset(sel)
    assert 3 not in sel and 4 not in sel


def test_instance_balanced_pos():
    sampler = InstanceBalancedPosSampler(num=4, pos_fraction=1.0)
    # 6 candidates for gt1, 1 for gt2 -> selection must include the gt2 one
    assigned = jnp.asarray([1, 1, 1, 1, 1, 1, 2, 0], jnp.int32)
    out = sampler.sample(jax.random.PRNGKey(0), assigned, num_gts=8)
    sel = np.asarray(out['inds'])[np.asarray(out['is_pos'])]
    assert 6 in sel.tolist()


def test_iou_balanced_neg_smoke():
    sampler = IoUBalancedNegSampler(num=8, pos_fraction=0.25, floor_thr=0.1,
                                    floor_fraction=0.5, num_bins=2)
    assigned = jnp.zeros((32,), jnp.int32)
    overlaps = jnp.asarray(np.linspace(0, 0.45, 32), jnp.float32)
    out = sampler.sample(jax.random.PRNGKey(0), assigned,
                         max_overlaps=overlaps)
    assert int(np.asarray(out['valid']).sum()) == 8


DOUBLE_CFG = dict(
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
        type='DoubleHeadRoIHead',
        reg_roi_scale_factor=1.3,
        bbox_roi_extractor=dict(
            type='SingleRoIExtractor',
            roi_layer=dict(type='RoIAlign', out_size=7, sample_num=0),
            out_channels=64, featmap_strides=[4, 8, 16, 32]),
        bbox_head=dict(
            type='DoubleConvFCBBoxHead', num_convs=1, num_fcs=1,
            in_channels=64, conv_out_channels=128, fc_out_channels=128,
            roi_feat_size=7, num_classes=4,
            bbox_coder=dict(type='DeltaXYWHBBoxCoder',
                            target_means=[0.] * 4,
                            target_stds=[0.1, 0.1, 0.2, 0.2]),
            reg_class_agnostic=False,
            loss_cls=dict(type='CrossEntropyLoss', use_sigmoid=False))))
TRAIN_CFG = dict(
    rpn=dict(assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.7,
                           neg_iou_thr=0.3, min_pos_iou=0.3,
                           match_low_quality=True, ignore_iof_thr=-1),
             sampler=dict(type='RandomSampler', num=32, pos_fraction=0.5,
                          neg_pos_ub=-1, add_gt_as_proposals=False),
             allowed_border=-1, pos_weight=-1),
    rpn_proposal=dict(nms_pre=100, nms_post=32, max_num=32, nms_thr=0.7,
                      min_bbox_size=0),
    rcnn=dict(assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.5,
                            neg_iou_thr=0.5, min_pos_iou=0.5,
                            match_low_quality=False, ignore_iof_thr=-1),
              sampler=dict(type='OHEMSampler', num=32, pos_fraction=0.25,
                           neg_pos_ub=-1, add_gt_as_proposals=True),
              pos_weight=-1))
TEST_CFG = dict(
    rpn=dict(nms_pre=100, nms_post=32, max_num=32, nms_thr=0.7,
             min_bbox_size=0),
    rcnn=dict(score_thr=0.05, nms=dict(type='nms', iou_thr=0.5),
              max_per_img=10, nms_cap=200))


def test_double_head_with_ohem_train_and_infer():
    model = build_detector(dict(DOUBLE_CFG), train_cfg=dict(TRAIN_CFG),
                           test_cfg=dict(TEST_CFG))
    params = model.init(jax.random.PRNGKey(0))
    batch = make_batch()
    losses = model.forward_train(params, batch['img'], batch['img_shape'],
                                 batch['gt_bboxes'], batch['gt_valid'],
                                 batch['gt_labels'], jax.random.PRNGKey(0))
    for k, v in losses.items():
        if 'loss' in k:
            assert np.isfinite(float(v)), k
    dets, labels, valid = model.simple_test(
        params, batch['img'], batch['img_shape'],
        jnp.ones((2, 4), jnp.float32), rescale=True)
    assert dets.shape == (2, 10, 5)


def test_mask_scoring_rcnn_train():
    cfg = dict(DOUBLE_CFG)
    cfg['type'] = 'MaskScoringRCNN'
    cfg['roi_head'] = dict(
        type='MaskScoringRoIHead',
        mask_iou_head=dict(type='MaskIoUHead', num_convs=1, num_fcs=1,
                           roi_feat_size=14, in_channels=64,
                           conv_out_channels=64, fc_out_channels=64,
                           num_classes=4),
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
            loss_cls=dict(type='CrossEntropyLoss', use_sigmoid=False)),
        mask_roi_extractor=dict(
            type='SingleRoIExtractor',
            roi_layer=dict(type='RoIAlign', out_size=14, sample_num=0),
            out_channels=64, featmap_strides=[4, 8, 16, 32]),
        mask_head=dict(type='FCNMaskHead', num_convs=1, in_channels=64,
                       conv_out_channels=64, num_classes=4))
    train_cfg = dict(TRAIN_CFG)
    train_cfg['rcnn'] = dict(train_cfg['rcnn'],
                             sampler=dict(type='RandomSampler', num=32,
                                          pos_fraction=0.25, neg_pos_ub=-1,
                                          add_gt_as_proposals=True),
                             mask_size=28, mask_thr_binary=0.5)
    model = build_detector(cfg, train_cfg=train_cfg, test_cfg=dict(TEST_CFG))
    params = model.init(jax.random.PRNGKey(0))
    batch = make_batch()
    b, g = batch['gt_bboxes'].shape[:2]
    crops = np.zeros((b, g, 32, 32), np.float32)
    crops[..., 8:24, 8:24] = 1.0
    losses = model.forward_train(params, batch['img'], batch['img_shape'],
                                 batch['gt_bboxes'], batch['gt_valid'],
                                 batch['gt_labels'], jax.random.PRNGKey(0),
                                 gt_mask_crops=jnp.asarray(crops))
    assert 'loss_mask_iou' in losses
    for k, v in losses.items():
        if 'loss' in k:
            assert np.isfinite(float(v)), k
    out = model.simple_test(params, batch['img'], batch['img_shape'],
                            jnp.ones((2, 4), jnp.float32), rescale=True)
    assert len(out) == 5  # dets, labels, valid, masks, mask_scores
    assert out[4].shape == (2, 10)
