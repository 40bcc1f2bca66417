"""Breadth: FCOS, WFPN-family necks, ResNeXt, PAFPN/HRFPN."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arfe_tpu.models import build_detector, build_neck

from test_train_step import make_batch

FCOS_CFG = dict(
    type='FCOS',
    backbone=dict(type='ResNet', depth=18, num_stages=4,
                  out_indices=(0, 1, 2, 3), frozen_stages=1, norm_eval=True,
                  style='pytorch'),
    neck=dict(type='FPN', in_channels=[64, 128, 256, 512], out_channels=64,
              start_level=1, add_extra_convs='on_output',
              relu_before_extra_convs=True, num_outs=5),
    bbox_head=dict(
        type='FCOSHead', num_classes=8, in_channels=64, stacked_convs=1,
        feat_channels=64, strides=[8, 16, 32, 64, 128],
        loss_cls=dict(type='FocalLoss', use_sigmoid=True, gamma=2.0,
                      alpha=0.25, loss_weight=1.0),
        loss_bbox=dict(type='IoULoss', loss_weight=1.0),
        loss_centerness=dict(type='CrossEntropyLoss', use_sigmoid=True,
                             loss_weight=1.0)))
FCOS_TEST_CFG = dict(nms_pre=100, score_thr=0.05,
                     nms=dict(type='nms', iou_thr=0.5), max_per_img=20,
                     nms_cap=300)


def test_fcos_inference_and_loss():
    model = build_detector(dict(FCOS_CFG), test_cfg=dict(FCOS_TEST_CFG))
    params = model.init(jax.random.PRNGKey(0))
    batch = make_batch()
    dets, labels, valid = jax.jit(
        lambda p, i, s, f: model.simple_test(p, i, s, f, rescale=True))(
        params, batch['img'], batch['img_shape'],
        jnp.ones((2, 4), jnp.float32))
    assert dets.shape == (2, 20, 5)

    losses = model.forward_train(params, batch['img'], batch['img_shape'],
                                 batch['gt_bboxes'], batch['gt_valid'],
                                 batch['gt_labels'], jax.random.PRNGKey(0))
    for k in ('loss_cls', 'loss_bbox', 'loss_centerness'):
        assert np.isfinite(float(losses[k])), k
    # gradient flows to the learnable per-level scales
    g = jax.grad(lambda p: sum(
        v for kk, v in model.forward_train(
            p, batch['img'], batch['img_shape'], batch['gt_bboxes'],
            batch['gt_valid'], batch['gt_labels'],
            jax.random.PRNGKey(0)).items() if 'loss' in kk))(params)
    assert np.abs(np.asarray(g['bbox_head']['scales'])).sum() > 0


def test_fcos_target_assignment():
    from arfe_tpu.models.dense_heads.fcos_head import FCOSHead
    head = FCOSHead(num_classes=3, in_channels=8, stacked_convs=1,
                    feat_channels=8, strides=[8, 16],
                    regress_ranges=((-1, 64), (64, 1e8)))
    pts = jnp.array([[20., 20.], [100., 100.]])
    rr = jnp.array([[-1., 64.], [-1., 64.]])
    gb = jnp.array([[10., 10., 40., 40.], [0., 0., 0., 0.]])
    gv = jnp.array([True, False])
    gl = jnp.array([2, 0])
    labels, tgt, pos = head._targets_single(pts, rr, gb, gv, gl)
    assert int(labels[0]) == 2 and bool(pos[0])
    assert int(labels[1]) == 3 and not bool(pos[1])  # bg
    np.testing.assert_allclose(np.asarray(tgt[0]), [10, 10, 20, 20])


@pytest.mark.parametrize('neck_type', ['WFPN', 'WFPNChannel',
                                       'WFPNChannelADD', 'WFPNAVG',
                                       'WFPNPool', 'WFPNPreTreat'])
def test_wfpn_variants_preserve_shapes(neck_type):
    shapes = [(2, 16, 20, 32), (2, 8, 10, 32), (2, 4, 5, 32), (2, 2, 3, 32)]
    inputs = tuple(jnp.asarray(np.random.RandomState(i).randn(*s) * 0.5,
                               jnp.float32) for i, s in enumerate(shapes))
    neck = build_neck(dict(type=neck_type, in_channels=32, num_levels=4))
    p = neck.init(jax.random.PRNGKey(0))
    outs = neck(p, inputs)
    assert all(o.shape == s for o, s in zip(outs, shapes))
    assert all(bool(jnp.isfinite(o).all()) for o in outs)


def test_pafpn_hrfpn_resnext():
    from arfe_tpu.models import build_backbone
    bb = build_backbone(dict(type='ResNeXt', depth=50, groups=32,
                             base_width=4))
    p = bb.init(jax.random.PRNGKey(0))
    outs = bb(p, jnp.zeros((1, 64, 64, 3)))
    assert [o.shape[-1] for o in outs] == [256, 512, 1024, 2048]

    neck = build_neck(dict(type='PAFPN', in_channels=[64, 128, 256, 512],
                           out_channels=32, num_outs=5))
    np_ = neck.init(jax.random.PRNGKey(0))
    ins = tuple(jnp.zeros((1, 32 // 2 ** i, 32 // 2 ** i, c))
                for i, c in enumerate([64, 128, 256, 512]))
    outs = neck(np_, ins)
    assert len(outs) == 5 and outs[0].shape == (1, 32, 32, 32)


def test_ssd300():
    cfg = dict(
        type='SSD',
        backbone=dict(type='SSDVGG', input_size=300, depth=16,
                      out_indices=(3, 4)),
        neck=None,
        bbox_head=dict(type='SSDHead', num_classes=5,
                       in_channels=(512, 1024, 512, 256, 256, 256)))
    test_cfg = dict(nms_pre=200, min_bbox_size=0, score_thr=0.02,
                    nms=dict(type='nms', iou_thr=0.45), max_per_img=20,
                    nms_cap=400)
    train_cfg = dict(
        assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.5,
                      neg_iou_thr=0.5, min_pos_iou=0., ignore_iof_thr=-1,
                      gt_max_assign_all=False),
        allowed_border=-1, pos_weight=-1, neg_pos_ratio=3,
        smoothl1_beta=1.0, debug=False)
    m = build_detector(cfg, train_cfg=train_cfg, test_cfg=test_cfg)
    p = m.init(jax.random.PRNGKey(0))
    img = jnp.asarray(np.random.RandomState(0).randn(1, 300, 300, 3) * 0.3,
                      jnp.float32)
    feats = m.extract_feat(p, img)
    assert [f.shape[1:3] for f in feats] == \
        [(38, 38), (19, 19), (10, 10), (5, 5), (3, 3), (1, 1)]
    dets, labels, valid = m.simple_test(p, img, jnp.array([[300., 300.]]),
                                        jnp.ones((1, 4)))
    assert dets.shape == (1, 20, 5)
    gt = jnp.asarray(np.array([[[30, 30, 120, 150], [200, 40, 280, 280]]]),
                     jnp.float32)
    losses = m.forward_train(p, img, jnp.array([[300., 300.]]), gt,
                             jnp.array([[True, True]]),
                             jnp.array([[1, 3]]), jax.random.PRNGKey(0))
    assert np.isfinite(float(losses['loss_cls']))
    assert np.isfinite(float(losses['loss_bbox']))
