"""Tests for the round-2 dense-head batch: Fovea, RepPoints, FreeAnchor,
GuidedAnchor family, NASFCOS, RetinaSepBN, PISA."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

AG = dict(type='AnchorGenerator', octave_base_scale=4, scales_per_octave=1,
          ratios=[1.0], strides=[4, 8, 16, 32, 64])
TC = dict(nms_pre=50, score_thr=0.05, nms=dict(type='nms', iou_thr=0.5),
          max_per_img=10)
FOCAL = dict(type='FocalLoss', use_sigmoid=True, gamma=2.0, alpha=0.25,
             loss_weight=1.0)


def feats(c=8, b=2):
    return [jnp.ones((b, 32 // (2 ** i), 32 // (2 ** i), c))
            for i in range(5)]


GT = jnp.array([[[2., 2., 60., 60.], [10., 10., 30., 30.]]] * 2)
GV = jnp.ones((2, 2), bool)
GL = jnp.zeros((2, 2), jnp.int32)
SHAPES = jnp.array([[128, 128]] * 2)


def test_fovea_targets_golden():
    """The mask-based fovea painting must match the reference's sequential
    rectangle painting semantics (smallest area wins overlaps)."""
    from arfe_tpu.models.dense_heads import FoveaHead
    head = FoveaHead(num_classes=3, in_channels=8, feat_channels=8,
                     stacked_convs=1, sigma=0.5,
                     base_edge_list=(16, 32, 64, 128, 256),
                     scale_ranges=((8, 32), (16, 64), (32, 128), (64, 256),
                                   (128, 512)))
    # two overlapping gts on level 1 (sqrt areas 32..64): the smaller one
    # must win the overlap region
    gtb = jnp.array([[0., 0., 48., 48.], [8., 8., 40., 40.]])
    gv = jnp.array([True, True])
    gl = jnp.array([1, 2], jnp.int32)
    labels, tgt, pos = head._level_targets(1, (16, 16), gtb, gv, gl)
    lab2d = np.asarray(labels).reshape(16, 16)
    # stride 8, gt2 scaled = [1,1,5,5]; ctr half_w=2, sigma .5 ->
    # pos range: ceil(1+1-0.5)=2 .. floor(1+3-0.5)=3
    assert lab2d[2, 2] == 2 and lab2d[3, 3] == 2
    # gt1 scaled [0,0,6,6]: ctr range ceil(0+1.5-.5)=1..floor(0+4.5-.5)=4
    assert lab2d[1, 1] == 1 and lab2d[4, 4] == 1
    # overlap cells (2..3) belong to the smaller gt 2
    assert lab2d[2, 3] == 2
    # outside everything: background
    assert lab2d[10, 10] == 3
    # regression target of a positive: log-space normalized distances
    p_idx = 2 * 16 + 2
    gx, gy = (2 + 0.5) * 8, (2 + 0.5) * 8
    exp = np.log(np.clip(np.array([
        (gx - 8.) / 32, (gy - 8.) / 32, (40. - gx) / 32, (40. - gy) / 32]),
        1 / 16, 16))
    np.testing.assert_allclose(np.asarray(tgt)[p_idx], exp, rtol=1e-5)


def test_point_assigner_golden():
    """PointAssigner vs a hand-built case."""
    from arfe_tpu.core.bbox.assigners import PointAssigner
    # points on two levels (stride 8 and 16)
    pts = []
    for s in (8, 16):
        xs = (np.arange(4) + 0.5) * s
        for y in xs:
            for x in xs:
                pts.append([x, y, s])
    pts = jnp.asarray(np.array(pts, np.float32))
    # gt with wh 32 -> lvl = log2(32/4) = 3 (stride 8)
    gtb = jnp.array([[0., 0., 32., 32.]])
    gv = jnp.array([True])
    gl = jnp.array([1], jnp.int32)
    res = PointAssigner(scale=4, pos_num=1).assign(pts, gtb, gv, gl)
    a = np.asarray(res['assigned_gt_inds'])
    # closest stride-8 point to center (16,16) is one of the 4 central
    # points; with pos_num=1 exactly one point is positive
    assert (a > 0).sum() == 1
    pos_idx = int(np.argmax(a > 0))
    x, y, s = np.asarray(pts)[pos_idx]
    assert s == 8 and abs(x - 16) <= 4 and abs(y - 16) <= 4


def test_group_rank_desc():
    from arfe_tpu.models.losses.pisa_loss import group_rank_desc
    v = jnp.array([0.9, 0.1, 0.5, 0.8, 0.3, 0.7])
    g = jnp.array([0, 0, 0, 1, 1, 2])
    m = jnp.ones(6, bool)
    r = np.asarray(group_rank_desc(v, g, m, 3))
    np.testing.assert_array_equal(r, [0, 2, 1, 0, 1, 0])
    # masked entries don't disturb group ranks
    m2 = jnp.array([True, False, True, True, True, True])
    r2 = np.asarray(group_rank_desc(v, g, m2, 3))
    assert r2[0] == 0 and r2[2] == 1


def test_reppoints_points2bbox_moment():
    """moment transform vs a literal numpy spec (Bessel std, exp transfer)."""
    from arfe_tpu.models.dense_heads import RepPointsHead
    head = RepPointsHead(num_classes=2, in_channels=8, feat_channels=8,
                         point_feat_channels=8, stacked_convs=1,
                         transform_method='moment')
    pts = jax.random.normal(jax.random.PRNGKey(0), (5, 18))
    moment = jnp.array([0.3, -0.2])
    out = np.asarray(head.points2bbox(pts, moment=moment, y_first=False))
    p = np.asarray(pts).reshape(5, 9, 2)
    px, py = p[..., 0], p[..., 1]
    xm, ym = px.mean(1), py.mean(1)
    xs = px.std(1, ddof=1)
    ys = py.std(1, ddof=1)
    hw = xs * np.exp(0.3)
    hh = ys * np.exp(-0.2)
    exp = np.stack([xm - hw, ym - hh, xm + hw, ym + hh], -1)
    np.testing.assert_allclose(out, exp, rtol=1e-5)


def test_reppoints_train_and_infer():
    from arfe_tpu.models.dense_heads import RepPointsHead
    train_cfg = dict(
        init=dict(assigner=dict(type='PointAssigner', scale=4, pos_num=1),
                  allowed_border=-1, pos_weight=-1),
        refine=dict(assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.5,
                                  neg_iou_thr=0.4, min_pos_iou=0),
                    allowed_border=-1, pos_weight=-1))
    h = RepPointsHead(num_classes=4, in_channels=8, feat_channels=8,
                      point_feat_channels=8, stacked_convs=1,
                      train_cfg=train_cfg, test_cfg=TC)
    p = h.init(jax.random.PRNGKey(0))
    outs = h(p, feats())
    losses = h.loss(*outs, GT, GV, GL, SHAPES)
    for v in losses.values():
        assert np.isfinite(float(v))
    dets, labels, valid = h.get_bboxes(*outs, SHAPES, jnp.ones((2, 4)))
    assert dets.shape == (2, 10, 5)


def test_free_anchor_loss():
    from arfe_tpu.models.dense_heads import FreeAnchorRetinaHead
    h = FreeAnchorRetinaHead(
        num_classes=4, in_channels=8, feat_channels=8, stacked_convs=1,
        pre_anchor_topk=8, anchor_generator=AG, loss_cls=dict(FOCAL),
        loss_bbox=dict(type='SmoothL1Loss', beta=0.11, loss_weight=0.75),
        test_cfg=TC)
    p = h.init(jax.random.PRNGKey(0))
    outs = h(p, feats())
    losses = h.loss(*outs, GT, GV, GL, SHAPES)
    assert np.isfinite(float(losses['positive_bag_loss']))
    assert np.isfinite(float(losses['negative_bag_loss']))
    # padded (invalid) gts must not change the loss
    gt3 = jnp.concatenate([GT, jnp.zeros((2, 1, 4))], 1)
    gv3 = jnp.concatenate([GV, jnp.zeros((2, 1), bool)], 1)
    gl3 = jnp.concatenate([GL, jnp.zeros((2, 1), jnp.int32)], 1)
    losses3 = h.loss(*outs, gt3, gv3, gl3, SHAPES)
    np.testing.assert_allclose(float(losses['positive_bag_loss']),
                               float(losses3['positive_bag_loss']),
                               rtol=1e-5)


def test_guided_anchor_loc_targets():
    """GA loc targets: center region positive, ignore ring 0, rest 0.1."""
    from arfe_tpu.models.dense_heads import GuidedAnchorHead
    ag_a = dict(type='AnchorGenerator', octave_base_scale=4,
                scales_per_octave=3, ratios=[0.5, 1.0, 2.0],
                strides=[8, 16, 32, 64, 128])
    ag_s = dict(type='AnchorGenerator', ratios=[1.0], scales=[4],
                strides=[8, 16, 32, 64, 128])
    h = GuidedAnchorHead(
        num_classes=2, in_channels=8, feat_channels=8,
        approx_anchor_generator=ag_a, square_anchor_generator=ag_s,
        train_cfg=dict(
            ga_assigner=dict(type='ApproxMaxIoUAssigner', pos_iou_thr=0.7,
                             neg_iou_thr=0.3, min_pos_iou=0.3),
            assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.5,
                          neg_iou_thr=0.4, min_pos_iou=0),
            center_ratio=0.2, ignore_ratio=0.5, allowed_border=-1,
            pos_weight=-1),
        loss_cls=dict(FOCAL), test_cfg=TC)
    # gt sized so target level is 0 (scale 64 -> log2(64/32)+0.5 -> 1?)
    gtb = jnp.array([[[0., 0., 64., 64.]]])
    gv = jnp.ones((1, 1), bool)
    sizes = [(16, 16), (8, 8), (4, 4), (2, 2), (1, 1)]
    t, w, avg = h.ga_loc_targets(gtb, gv, sizes)
    # scale = 64 -> target_lvl = floor(log2(64) - log2(4*8) + .5) = 1
    t1 = np.asarray(t[1]).reshape(8, 8)
    w1 = np.asarray(w[1]).reshape(8, 8)
    # on stride-16: gt/16 = [0,0,4,4]; r1=0.4: ctr = round(.4*4)=2..round(.6*4)=2
    assert t1[2, 2] == 1
    assert w1[2, 2] == 1
    # r2=0.25: ignore 1..3 minus ctr
    assert w1[1, 1] == 0
    # far away: negative weight 0.1
    assert abs(w1[7, 7] - 0.1) < 1e-6
    # adjacent levels got the ignore ring
    w0 = np.asarray(w[0]).reshape(16, 16)
    assert w0[2, 2] == 0  # gt/8=[0,0,8,8], r2 region 2..6
    assert abs(w0[15, 15] - 0.1) < 1e-6


def test_ga_retina_and_garpn_build_and_run():
    from arfe_tpu.models.dense_heads import GARPNHead, GARetinaHead
    ag_a = dict(type='AnchorGenerator', octave_base_scale=8,
                scales_per_octave=3, ratios=[0.5, 1.0, 2.0],
                strides=[4, 8, 16, 32, 64])
    ag_s = dict(type='AnchorGenerator', ratios=[1.0], scales=[8],
                strides=[4, 8, 16, 32, 64])
    train_cfg = dict(
        ga_assigner=dict(type='ApproxMaxIoUAssigner', pos_iou_thr=0.7,
                         neg_iou_thr=0.3, min_pos_iou=0.3),
        assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.7,
                      neg_iou_thr=0.3, min_pos_iou=0.3),
        sampler=dict(type='RandomSampler', num=64, pos_fraction=0.5),
        allowed_border=-1, center_ratio=0.2, ignore_ratio=0.5,
        pos_weight=-1)
    tc = dict(TC, nms_post=20, nms_thr=0.7, min_bbox_size=0, max_num=20)
    h = GARPNHead(in_channels=8, feat_channels=8,
                  approx_anchor_generator=ag_a,
                  square_anchor_generator=ag_s,
                  train_cfg=train_cfg, test_cfg=tc)
    p = h.init(jax.random.PRNGKey(0))
    outs = h(p, feats())
    losses = h.loss(*outs, GT, GV, SHAPES, jax.random.PRNGKey(1))
    assert set(losses) == {'loss_rpn_cls', 'loss_rpn_bbox',
                           'loss_anchor_shape', 'loss_anchor_loc'}
    dets, valid = h.get_bboxes(*outs, SHAPES)
    assert dets.shape == (2, 20, 5)

    tcfg = dict(train_cfg)
    tcfg['assigner'] = dict(type='MaxIoUAssigner', pos_iou_thr=0.5,
                            neg_iou_thr=0.4, min_pos_iou=0)
    del tcfg['sampler']
    hr = GARetinaHead(num_classes=4, in_channels=8, feat_channels=8,
                      stacked_convs=1, approx_anchor_generator=ag_a,
                      square_anchor_generator=ag_s, loss_cls=dict(FOCAL),
                      train_cfg=tcfg, test_cfg=TC)
    pr = hr.init(jax.random.PRNGKey(0))
    outs_r = hr(pr, feats())
    lr = hr.loss(*outs_r, GT, GV, GL, SHAPES, jax.random.PRNGKey(1))
    for v in lr.values():
        assert np.isfinite(float(v))
    dr, _, _ = hr.get_bboxes(*outs_r, SHAPES, jnp.ones((2, 4)))
    assert dr.shape == (2, 10, 5)


def test_retina_sepbn_shares_convs():
    from arfe_tpu.models.dense_heads import RetinaSepBNHead
    h = RetinaSepBNHead(num_classes=4, num_ins=5, in_channels=8,
                        feat_channels=8, stacked_convs=1,
                        norm_cfg=dict(type='BN'), anchor_generator=AG,
                        loss_cls=dict(FOCAL), test_cfg=TC)
    p = h.init(jax.random.PRNGKey(0))
    # only level 0 holds conv weights; every level holds its own bn
    assert 'conv' in p['cls_convs']['0']['0']
    assert 'conv' not in p['cls_convs']['1']['0']
    assert 'bn' in p['cls_convs']['1']['0']
    outs = h(p, feats())
    assert outs[0][0].shape == (2, 32, 32, 4)


def test_nasfcos_head():
    from arfe_tpu.models.dense_heads import NASFCOSHead
    h = NASFCOSHead(num_classes=4, in_channels=8, feat_channels=8,
                    norm_cfg=dict(type='GN', num_groups=4), test_cfg=TC)
    p = h.init(jax.random.PRNGKey(0))
    outs = h(p, feats())
    losses = h.loss(*outs, GT, GV, GL, SHAPES)
    for v in losses.values():
        assert np.isfinite(float(v))


def test_pisa_retina_isr_reweights():
    from arfe_tpu.models.dense_heads import PISARetinaHead
    train_cfg = dict(assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.5,
                                   neg_iou_thr=0.4, min_pos_iou=0),
                     isr=dict(k=2., bias=0.), carl=dict(k=1., bias=0.2),
                     allowed_border=-1, pos_weight=-1)
    h = PISARetinaHead(num_classes=4, in_channels=8, feat_channels=8,
                       stacked_convs=1, anchor_generator=AG,
                       loss_cls=dict(FOCAL), train_cfg=train_cfg,
                       test_cfg=TC)
    p = h.init(jax.random.PRNGKey(0))
    outs = h(p, feats())
    losses = h.loss(*outs, GT, GV, GL, SHAPES, jax.random.PRNGKey(1))
    assert 'loss_carl' in losses
    for v in losses.values():
        assert np.isfinite(float(v))
    # without isr/carl the cls loss changes (reweighting has an effect)
    h2 = PISARetinaHead(num_classes=4, in_channels=8, feat_channels=8,
                        stacked_convs=1, anchor_generator=AG,
                        loss_cls=dict(FOCAL),
                        train_cfg=dict(assigner=train_cfg['assigner'],
                                       allowed_border=-1, pos_weight=-1),
                        test_cfg=TC)
    l2 = h2.loss(*outs, GT, GV, GL, SHAPES, jax.random.PRNGKey(1))
    assert 'loss_carl' not in l2


def test_pisa_ssd_runs():
    from arfe_tpu.models.dense_heads import PISASSDHead
    ssd_ag = dict(type='SSDAnchorGenerator', scale_major=False,
                  input_size=300, basesize_ratio_range=(0.15, 0.9),
                  strides=[8, 16, 32, 64, 100, 300],
                  ratios=[[2], [2, 3], [2, 3], [2, 3], [2], [2]])
    train = dict(assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.5,
                               neg_iou_thr=0.5, min_pos_iou=0.,
                               gt_max_assign_all=False),
                 isr=dict(k=2., bias=0.25), carl=dict(k=1., bias=0.2),
                 smoothl1_beta=1., allowed_border=-1, pos_weight=-1,
                 neg_pos_ratio=3)
    h = PISASSDHead(num_classes=4, in_channels=(8,) * 6,
                    anchor_generator=ssd_ag, train_cfg=train, test_cfg=TC)
    p = h.init(jax.random.PRNGKey(0))
    f = [jnp.ones((2, s, s, 8)) for s in (38, 19, 10, 5, 3, 1)]
    outs = h(p, f)
    losses = h.loss(*outs, GT, GV, GL, SHAPES, jax.random.PRNGKey(1))
    assert 'loss_carl' in losses
    for v in losses.values():
        assert np.isfinite(float(v))
