"""Hybrid Task Cascade: semantic fusion, interleaved sampling, mask info
flow."""
import jax
import jax.numpy as jnp
import numpy as np

from arfe_tpu.models import build_detector
from arfe_tpu.models.roi_heads.mask_heads.fused_semantic_head import \
    _resize_bilinear_align_corners

from test_mask_cascade import CASCADE_TRAIN_CFG, cascade_cfg
from test_faster_rcnn_smoke import TEST_CFG
from test_train_step import make_batch


def test_align_corners_resize_vs_torch():
    import torch
    import torch.nn.functional as F
    x = np.random.RandomState(0).randn(2, 7, 9, 3).astype(np.float32)
    ref = F.interpolate(torch.as_tensor(x).permute(0, 3, 1, 2), size=(13, 5),
                        mode='bilinear', align_corners=True)
    ref = ref.permute(0, 2, 3, 1).numpy()
    got = np.asarray(_resize_bilinear_align_corners(jnp.asarray(x), (13, 5)))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def htc_cfg(with_semantic=True):
    cfg = cascade_cfg()
    cfg['type'] = 'HybridTaskCascade'
    rh = cfg['roi_head']
    rh['type'] = 'HybridTaskCascadeRoIHead'
    rh['mask_roi_extractor'] = dict(
        type='SingleRoIExtractor',
        roi_layer=dict(type='RoIAlign', out_size=14, sample_num=0),
        out_channels=64, featmap_strides=[4, 8, 16, 32])
    rh['mask_head'] = [dict(type='HTCMaskHead', with_conv_res=(i > 0),
                            num_convs=1, in_channels=64,
                            conv_out_channels=64, num_classes=5)
                       for i in range(3)]
    if with_semantic:
        rh['semantic_roi_extractor'] = dict(
            type='SingleRoIExtractor',
            roi_layer=dict(type='RoIAlign', out_size=14, sample_num=0),
            out_channels=64, featmap_strides=[8])
        rh['semantic_head'] = dict(
            type='FusedSemanticHead', num_ins=5, fusion_level=1,
            num_convs=2, in_channels=64, conv_out_channels=64,
            num_classes=17, ignore_label=255, loss_weight=0.2)
    return cfg


def _mask_batch():
    batch = make_batch(num_classes=5)
    b, g = batch['gt_valid'].shape
    crops = np.zeros((b, g, 32, 32), np.float32)
    crops[..., 4:28, 4:28] = 1.0
    batch['gt_mask_crops'] = jnp.asarray(crops)
    return batch


def test_htc_train_with_semantic_and_masks():
    model = build_detector(htc_cfg(), train_cfg=dict(CASCADE_TRAIN_CFG),
                           test_cfg=dict(TEST_CFG))
    params = model.init(jax.random.PRNGKey(0))
    batch = _mask_batch()
    h, w = batch['img'].shape[1:3]
    seg = np.full((2, h // 8, w // 8), 255, np.int32)
    seg[:, 2:6, 2:6] = 3
    losses = model.forward_train(
        params, batch['img'], batch['img_shape'], batch['gt_bboxes'],
        batch['gt_valid'], batch['gt_labels'], jax.random.PRNGKey(0),
        gt_mask_crops=batch['gt_mask_crops'],
        gt_semantic_seg=jnp.asarray(seg))
    assert 'loss_semantic_seg' in losses
    for stage in range(3):
        assert np.isfinite(float(losses[f's{stage}.loss_cls']))
        assert np.isfinite(float(losses[f's{stage}.loss_mask']))
    # semantic branch and conv_res get gradients
    g = jax.grad(lambda p: sum(
        v for kk, v in model.forward_train(
            p, batch['img'], batch['img_shape'], batch['gt_bboxes'],
            batch['gt_valid'], batch['gt_labels'], jax.random.PRNGKey(0),
            gt_mask_crops=batch['gt_mask_crops'],
            gt_semantic_seg=jnp.asarray(seg)).items()
        if 'loss' in kk))(params)
    sem_g = np.abs(np.asarray(
        g['roi_head']['semantic_head']['conv_logits']['weight'])).sum()
    assert sem_g > 0
    res_g = np.abs(np.asarray(
        g['roi_head']['mask_head']['1']['conv_res']['conv']
        ['weight'])).sum()
    assert res_g > 0


def test_htc_simple_test_returns_mask_probs():
    model = build_detector(htc_cfg(), train_cfg=dict(CASCADE_TRAIN_CFG),
                           test_cfg=dict(TEST_CFG))
    params = model.init(jax.random.PRNGKey(0))
    batch = _mask_batch()
    out = jax.jit(lambda p, i, s, f: model.simple_test(p, i, s, f,
                                                       rescale=True))(
        params, batch['img'], batch['img_shape'],
        jnp.ones((2, 4), jnp.float32))
    dets, labels, valid, masks = out
    assert dets.shape == (2, 20, 5)
    m = np.asarray(masks)
    assert m.shape[:2] == (2, 20)
    assert (m >= 0).all() and (m <= 1).all()  # probabilities, not logits


def test_htc_without_semantic_builds_and_trains():
    model = build_detector(htc_cfg(with_semantic=False),
                           train_cfg=dict(CASCADE_TRAIN_CFG),
                           test_cfg=dict(TEST_CFG))
    params = model.init(jax.random.PRNGKey(0))
    batch = _mask_batch()
    losses = model.forward_train(
        params, batch['img'], batch['img_shape'], batch['gt_bboxes'],
        batch['gt_valid'], batch['gt_labels'], jax.random.PRNGKey(0),
        gt_mask_crops=batch['gt_mask_crops'])
    assert 'loss_semantic_seg' not in losses
    assert np.isfinite(float(losses['s2.loss_mask']))
