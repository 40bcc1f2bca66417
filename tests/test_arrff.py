"""AR-RFF: multi-RoI fusion head + multi-class auxiliary head
(configs #4 equivalents)."""
import jax
import jax.numpy as jnp
import numpy as np

from arfe_tpu.models import build_detector
from arfe_tpu.models.utils import (get_adaptive_scale_rois,
                                   get_boundary_rois, get_large_small_rois)

from test_faster_rcnn_smoke import TEST_CFG, faster_cfg
from test_train_step import FASTER_TRAIN_CFG, make_batch


def _with_head(head_type):
    cfg = faster_cfg(True)
    cfg['roi_head']['bbox_head']['type'] = head_type
    return cfg


def test_adaptive_scale_rois_golden():
    rois = jnp.array([[0., 10., 10., 49., 29.]])  # w=40, h=20 (incl +1)
    lh, lw = get_adaptive_scale_rois(rois, 1.0)
    lh, lw = np.asarray(lh)[0], np.asarray(lw)[0]
    # h_rate = 40/20*1+1 = 3 -> new half-h = 30; ctr_y = 19.5
    np.testing.assert_allclose(lh, [0., 9.5, 0.1, 49.5, 49.5], atol=1e-4)
    # w_rate = 20/40*1+1 = 1.5 -> half-w = 30; ctr_x = 29.5
    np.testing.assert_allclose(lw[1], 29.5 - 30, atol=1e-4) \
        if 29.5 - 30 > 0.1 else np.testing.assert_allclose(lw[1], 0.1)
    np.testing.assert_allclose(lw[3], 29.5 + 30, atol=1e-4)


def test_large_small_and_boundary_rois_shapes():
    rois = jnp.asarray(np.random.RandomState(0).rand(6, 5) * 50)
    large, small = get_large_small_rois(rois)
    assert large.shape == small.shape == (6, 5)
    t, r, b, l = get_boundary_rois(rois)
    for x in (t, r, b, l):
        assert x.shape == (6, 5)
        assert (np.asarray(x)[:, 0] == np.asarray(rois)[:, 0]).all()


def test_multirois_head_inference_and_train():
    cfg = _with_head('MultiRoIsBBoxHead')
    model = build_detector(cfg, train_cfg=dict(FASTER_TRAIN_CFG),
                           test_cfg=dict(TEST_CFG))
    assert model.roi_head.multi_rois  # auto-enabled by head type
    params = model.init(jax.random.PRNGKey(0))
    batch = make_batch(num_classes=5)
    # inference
    dets, labels, valid = model.simple_test(
        params, batch['img'], batch['img_shape'],
        jnp.ones((2, 4), jnp.float32), rescale=True)
    assert dets.shape == (2, 20, 5)
    # training losses finite with grads
    def loss_fn(p):
        losses = model.forward_train(p, batch['img'], batch['img_shape'],
                                     batch['gt_bboxes'], batch['gt_valid'],
                                     batch['gt_labels'],
                                     jax.random.PRNGKey(0))
        return sum(v for k, v in losses.items() if 'loss' in k), losses
    (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(total))
    g = np.asarray(grads['roi_head']['bbox_head']['wh_conv']['conv']
                   ['weight'])
    assert np.abs(g).sum() > 0  # fusion convs receive gradient


def test_multi_classes_head_train():
    cfg = _with_head('Shared2FCMultiClassesBBoxHead')
    model = build_detector(cfg, train_cfg=dict(FASTER_TRAIN_CFG),
                           test_cfg=dict(TEST_CFG))
    assert model.roi_head.with_multi_cls
    assert not model.roi_head.multi_rois
    params = model.init(jax.random.PRNGKey(0))
    batch = make_batch(num_classes=5)
    losses = model.forward_train(params, batch['img'], batch['img_shape'],
                                 batch['gt_bboxes'], batch['gt_valid'],
                                 batch['gt_labels'], jax.random.PRNGKey(0))
    assert 'loss_multi_cls' in losses
    assert np.isfinite(float(losses['loss_multi_cls']))
    # inference path ignores multi_cls cleanly
    dets, _, valid = model.simple_test(params, batch['img'],
                                       batch['img_shape'],
                                       jnp.ones((2, 4), jnp.float32))
    assert dets.shape == (2, 20, 5)
