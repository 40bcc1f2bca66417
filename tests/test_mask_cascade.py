"""Mask R-CNN and Cascade R-CNN (config #5 scaffolding)."""
import jax
import jax.numpy as jnp
import numpy as np

from arfe_tpu.core.mask import BitmapMasks, mask_target_from_crops, \
    paste_masks_np
from arfe_tpu.models import build_detector

from test_faster_rcnn_smoke import TEST_CFG, faster_cfg
from test_train_step import FASTER_TRAIN_CFG, make_batch


def test_mask_target_from_crops_exact():
    # gt mask = right half of the gt box; roi == gt box -> target right half
    crop = np.zeros((1, 16, 16), np.float32)
    crop[0, :, 8:] = 1.0
    gt_box = jnp.array([[10., 10., 42., 42.]])
    roi = gt_box
    tgt = np.asarray(mask_target_from_crops(jnp.asarray(crop), gt_box, roi,
                                            mask_size=8))
    assert tgt.shape == (1, 8, 8)
    assert (tgt[0, :, :4] == 0).all() and (tgt[0, :, 5:] == 1).all()
    # roi = left half of gt box -> target all zeros
    roi2 = jnp.array([[10., 10., 26., 42.]])
    tgt2 = np.asarray(mask_target_from_crops(jnp.asarray(crop), gt_box,
                                             roi2, mask_size=8))
    assert tgt2.sum() == 0


def test_bitmap_masks_ops():
    m = np.zeros((2, 20, 30), np.uint8)
    m[0, 5:10, 5:15] = 1
    m[1, 0:4, 0:4] = 1
    bm = BitmapMasks(m, 20, 30)
    r = bm.resize((10, 15))
    assert r.masks.shape == (2, 10, 15)
    f = bm.flip('horizontal')
    assert f.masks[0, 7, 30 - 10] == 1
    crops = bm.to_fixed_crops(np.array([[5, 5, 15, 10], [0, 0, 4, 4]]),
                              crop_size=8)
    assert crops.shape == (2, 8, 8)
    assert crops[0].mean() > 0.9  # crop exactly covers the mask


def test_paste_masks():
    mask = np.ones((1, 4, 4), np.float32)
    out = paste_masks_np(mask, np.array([[2., 3., 10., 9.]]), 20, 20)
    assert out.shape == (1, 20, 20)
    assert out[0, 4, 5] == 1 and out[0, 0, 0] == 0


def mask_rcnn_cfg():
    cfg = faster_cfg(False)
    cfg['type'] = 'MaskRCNN'
    cfg['roi_head']['mask_roi_extractor'] = dict(
        type='SingleRoIExtractor',
        roi_layer=dict(type='RoIAlign', out_size=14, sample_num=0),
        out_channels=64, featmap_strides=[4, 8, 16, 32])
    cfg['roi_head']['mask_head'] = dict(
        type='FCNMaskHead', num_convs=2, in_channels=64,
        conv_out_channels=64, num_classes=5)
    return cfg


def test_mask_rcnn_train_and_test():
    model = build_detector(mask_rcnn_cfg(), train_cfg=dict(FASTER_TRAIN_CFG),
                           test_cfg=dict(TEST_CFG))
    params = model.init(jax.random.PRNGKey(0))
    batch = make_batch(num_classes=5)
    # synthetic gt mask crops: full boxes -> all-ones crops
    b, g = batch['gt_valid'].shape
    crops = np.zeros((b, g, 32, 32), np.float32)
    crops[np.asarray(batch['gt_valid'])] = 1.0
    losses = model.forward_train(params, batch['img'], batch['img_shape'],
                                 batch['gt_bboxes'], batch['gt_valid'],
                                 batch['gt_labels'], jax.random.PRNGKey(0),
                                 gt_mask_crops=jnp.asarray(crops))
    assert 'loss_mask' in losses
    assert np.isfinite(float(losses['loss_mask']))
    # grads reach the mask head
    def total(p):
        ls = model.forward_train(p, batch['img'], batch['img_shape'],
                                 batch['gt_bboxes'], batch['gt_valid'],
                                 batch['gt_labels'], jax.random.PRNGKey(0),
                                 gt_mask_crops=jnp.asarray(crops))
        return sum(v for k, v in ls.items() if 'loss' in k)
    grads = jax.grad(total)(params)
    g0 = np.asarray(
        grads['roi_head']['mask_head']['conv_logits']['weight'])
    assert np.abs(g0).sum() > 0
    # inference returns masks
    out = model.simple_test(params, batch['img'], batch['img_shape'],
                            jnp.ones((2, 4), jnp.float32), rescale=False)
    dets, labels, valid, masks = out
    assert masks.shape[:2] == dets.shape[:2]
    assert masks.shape[2:] == (28, 28)


def cascade_cfg():
    base_head = dict(
        type='Shared2FCBBoxHead', in_channels=64, fc_out_channels=128,
        roi_feat_size=7, num_classes=5,
        bbox_coder=dict(type='DeltaXYWHBBoxCoder',
                        target_means=[0., 0., 0., 0.],
                        target_stds=[0.1, 0.1, 0.2, 0.2]),
        reg_class_agnostic=True,
        loss_cls=dict(type='CrossEntropyLoss', use_sigmoid=False))
    cfg = faster_cfg(False)
    cfg['type'] = 'CascadeRCNN'
    cfg['roi_head'] = dict(
        type='CascadeRoIHead', num_stages=3,
        stage_loss_weights=[1, 0.5, 0.25],
        bbox_roi_extractor=dict(
            type='SingleRoIExtractor',
            roi_layer=dict(type='RoIAlign', out_size=7, sample_num=0),
            out_channels=64, featmap_strides=[4, 8, 16, 32]),
        bbox_head=[dict(base_head,
                        bbox_coder=dict(type='DeltaXYWHBBoxCoder',
                                        target_means=[0.] * 4,
                                        target_stds=[s, s, 2 * s, 2 * s]))
                   for s in (0.1, 0.05, 0.033)])
    return cfg


CASCADE_TRAIN_CFG = dict(
    rpn=FASTER_TRAIN_CFG['rpn'],
    rpn_proposal=FASTER_TRAIN_CFG['rpn_proposal'],
    rcnn=[dict(
        assigner=dict(type='MaxIoUAssigner', pos_iou_thr=thr,
                      neg_iou_thr=thr, min_pos_iou=thr,
                      match_low_quality=False, ignore_iof_thr=-1),
        sampler=dict(type='RandomSampler', num=32, pos_fraction=0.25,
                     neg_pos_ub=-1, add_gt_as_proposals=True),
        pos_weight=-1, debug=False) for thr in (0.5, 0.6, 0.7)])


def test_cascade_rcnn_train_and_test():
    model = build_detector(cascade_cfg(), train_cfg=dict(CASCADE_TRAIN_CFG),
                           test_cfg=dict(TEST_CFG))
    params = model.init(jax.random.PRNGKey(0))
    batch = make_batch(num_classes=5)
    losses = model.forward_train(params, batch['img'], batch['img_shape'],
                                 batch['gt_bboxes'], batch['gt_valid'],
                                 batch['gt_labels'], jax.random.PRNGKey(0))
    for stage in range(3):
        assert f's{stage}.loss_cls' in losses
        assert np.isfinite(float(losses[f's{stage}.loss_cls']))
    dets, labels, valid = model.simple_test(
        params, batch['img'], batch['img_shape'],
        jnp.ones((2, 4), jnp.float32), rescale=True)
    assert dets.shape == (2, 20, 5)
    d, v = np.asarray(dets), np.asarray(valid)
    assert (d[~v][:, 4] == -1).all()
