"""Grid R-CNN, PISA RoI head, and shared ResLayer (C4) tests."""
import jax
import jax.numpy as jnp
import numpy as np

EXTRACTOR = dict(type='SingleRoIExtractor',
                 roi_layer=dict(type='RoIAlign', out_size=14, sample_num=0),
                 out_channels=8, featmap_strides=[4, 8, 16, 32])
BBOX_HEAD = dict(type='Shared2FCBBoxHead', in_channels=8, fc_out_channels=16,
                 roi_feat_size=14, num_classes=4)
GRID_HEAD = dict(type='GridHead', grid_points=9, num_convs=2,
                 roi_feat_size=14, in_channels=8, point_feat_channels=4,
                 norm_cfg=dict(type='GN', num_groups=4))
TRAIN = dict(assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.5,
                           neg_iou_thr=0.5, min_pos_iou=0.5),
             sampler=dict(type='RandomSampler', num=16, pos_fraction=0.25,
                          add_gt_as_proposals=True),
             pos_radius=1, max_num_grid=12, pos_weight=-1)
TEST = dict(score_thr=0.05, nms=dict(type='nms', iou_thr=0.5), max_per_img=8)

FEATS = [jnp.ones((2, 32 // (2 ** i), 32 // (2 ** i), 8)) for i in range(4)]
PROPS = jnp.tile(jnp.array([[4., 4., 60., 60., 1.]]), (2, 8, 1))
PV = jnp.ones((2, 8), bool)
GT = jnp.array([[[2., 2., 60., 60.], [10., 10., 30., 30.]]] * 2)
GV = jnp.ones((2, 2), bool)
GL = jnp.zeros((2, 2), jnp.int32)
SHAPES = jnp.array([[128, 128]] * 2)


def test_grid_head_targets_golden():
    """Analytic circle targets == the reference's painted circles."""
    from arfe_tpu.models.roi_heads import GridHead
    gh = GridHead(grid_points=9, num_convs=1, roi_feat_size=14,
                  in_channels=8, point_feat_channels=4,
                  norm_cfg=dict(type='GN', num_groups=4))
    pos = jnp.array([[10., 10., 40., 40.]])
    gts = jnp.array([[12., 12., 38., 38.]])
    t = np.asarray(gh.get_targets(pos, gts, pos_radius=1))
    assert t.shape == (1, 28, 28, 9)
    # literal reference replication for grid point j
    ms = gh.whole_map_size
    x1 = 10. - 15.
    y1 = 10. - 15.
    w = 60.
    h = 60.
    for j in range(9):
        fx = 1 - (j // 3) / 2
        fy = 1 - (j % 3) / 2
        gx = fx * 12. + (1 - fx) * 38.
        gy = fy * 12. + (1 - fy) * 38.
        cx = int((gx - x1) / w * ms)
        cy = int((gy - y1) / h * ms)
        ref = np.zeros((ms, ms))
        for x in range(cx - 1, cx + 2):
            for y in range(cy - 1, cy + 2):
                if 0 <= x < ms and 0 <= y < ms and \
                        (x - cx) ** 2 + (y - cy) ** 2 <= 1:
                    ref[y, x] = 1
        sx, sy, ex, ey = gh.sub_regions[j]
        np.testing.assert_array_equal(t[0, :, :, j], ref[sy:ey, sx:ex])


def test_grid_head_get_bboxes_votes():
    from arfe_tpu.models.roi_heads import GridHead
    gh = GridHead(grid_points=9, num_convs=1, roi_feat_size=14,
                  in_channels=8, point_feat_channels=4,
                  norm_cfg=dict(type='GN', num_groups=4))
    dets = jnp.array([[10., 10., 40., 40., 0.9]])
    # peaked heatmaps: put a strong peak at the target grid points of the
    # det box itself -> voting should approximately recover the box
    half = gh.whole_map_size // 2
    t = gh.get_targets(dets[:, :4], dets[:, :4], pos_radius=1)
    logits = (t * 12.0 - 6.0)
    out = np.asarray(gh.get_bboxes(dets, logits, jnp.array([128, 128])))
    np.testing.assert_allclose(out[0, :4], [10., 10., 40., 40.], atol=1.5)
    assert out[0, 4] == np.float32(0.9)


def test_grid_roi_head_train_and_test():
    from arfe_tpu.models.roi_heads import GridRoIHead
    h = GridRoIHead(grid_roi_extractor=EXTRACTOR, grid_head=GRID_HEAD,
                    bbox_roi_extractor=EXTRACTOR, bbox_head=BBOX_HEAD,
                    train_cfg=TRAIN, test_cfg=TEST)
    p = h.init(jax.random.PRNGKey(0))
    losses = h.forward_train(p, FEATS, PROPS, PV, GT, GV, GL,
                             jax.random.PRNGKey(1), img_shapes=SHAPES)
    assert 'loss_grid' in losses
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    dets, labels, valid = h.simple_test(p, FEATS, PROPS, PV, SHAPES,
                                        jnp.ones((2, 4)))
    assert dets.shape == (2, 8, 5)


def test_pisa_roi_head():
    from arfe_tpu.models.roi_heads import PISARoIHead
    h = PISARoIHead(bbox_roi_extractor=EXTRACTOR, bbox_head=BBOX_HEAD,
                    train_cfg=dict(TRAIN, isr=dict(k=2., bias=0.),
                                   carl=dict(k=1., bias=0.2)),
                    test_cfg=TEST)
    p = h.init(jax.random.PRNGKey(0))
    losses = h.forward_train(p, FEATS, PROPS, PV, GT, GV, GL,
                             jax.random.PRNGKey(1), img_shapes=SHAPES)
    assert 'loss_carl' in losses
    for k, v in losses.items():
        assert np.isfinite(float(v)), k


def test_shared_res_layer_c4():
    """C4-style: shared res5 applied to RoI feats before the bbox head."""
    from arfe_tpu.models.roi_heads import StandardRoIHead
    ex = dict(type='SingleRoIExtractor',
              roi_layer=dict(type='RoIAlign', out_size=14, sample_num=0),
              out_channels=1024, featmap_strides=[16])
    h = StandardRoIHead(
        bbox_roi_extractor=ex,
        bbox_head=dict(type='BBoxHead', with_avg_pool=True,
                       roi_feat_size=7, in_channels=2048, num_classes=4),
        shared_head=dict(type='ResLayer', depth=50, stage=3, stride=2),
        train_cfg=dict(TRAIN), test_cfg=TEST)
    p = h.init(jax.random.PRNGKey(0))
    assert 'layer4' in p['shared_head']
    feats = [jnp.ones((1, 8, 8, 1024))]
    props = jnp.tile(jnp.array([[4., 4., 60., 60., 1.]]), (1, 4, 1))
    pv = jnp.ones((1, 4), bool)
    dets, labels, valid = h.simple_test(
        p, feats, props, pv, jnp.array([[128, 128]]), jnp.ones((1, 4)))
    assert dets.shape == (1, 8, 5)


def test_grouped_deconv_matches_torch():
    """GroupedDeconv2d vs torch.nn.ConvTranspose2d (k=4, s=2, p=1, groups)."""
    torch = __import__('torch')
    from arfe_tpu.models.roi_heads.mask_heads.grid_head import \
        GroupedDeconv2d
    rng = np.random.RandomState(0)
    cin, cout, g = 8, 4, 4
    x = rng.randn(2, 7, 7, cin).astype(np.float32)
    m = GroupedDeconv2d(cin, cout, 4, stride=2, padding=1, groups=g)
    params = m.init(jax.random.PRNGKey(0))
    w = np.asarray(params['weight'])          # (k, k, cin/g, cout)
    b = np.asarray(params['bias'])
    y = np.asarray(m(params, jnp.asarray(x)))

    tm = torch.nn.ConvTranspose2d(cin, cout, 4, stride=2, padding=1,
                                  groups=g)
    # torch weight layout: (cin, cout/g, k, k); ours is (k, k, cin/g, cout)
    # with output channels laid out group-major
    wt = np.zeros((cin, cout // g, 4, 4), np.float32)
    for gi in range(g):
        for ci in range(cin // g):
            for co in range(cout // g):
                wt[gi * (cin // g) + ci, co] = \
                    w[:, :, ci, gi * (cout // g) + co]
    with torch.no_grad():
        tm.weight.copy_(torch.from_numpy(wt))
        tm.bias.copy_(torch.from_numpy(b))
        yt = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(y, yt.numpy().transpose(0, 2, 3, 1),
                               atol=1e-5)
