import jax
import jax.numpy as jnp
import numpy as np

from arfe_tpu.core.bbox import MaxIoUAssigner, PseudoSampler, RandomSampler


def pad_gt(boxes, labels, g_max=8):
    g = len(boxes)
    gb = np.zeros((g_max, 4), np.float32)
    gl = np.zeros((g_max,), np.int32)
    gv = np.zeros((g_max,), bool)
    gb[:g] = boxes
    gl[:g] = labels
    gv[:g] = True
    return jnp.asarray(gb), jnp.asarray(gl), jnp.asarray(gv)


def test_max_iou_assigner_basic():
    assigner = MaxIoUAssigner(pos_iou_thr=0.5, neg_iou_thr=0.4,
                              min_pos_iou=0.3, match_low_quality=True)
    boxes = jnp.array([
        [0, 0, 10, 10],     # iou 1.0 with gt0 -> pos
        [0, 0, 10, 9],      # iou 0.9 with gt0 -> pos
        [50, 50, 60, 60],   # iou 0 -> neg
        [0, 0, 10, 4.5],    # iou 0.45 with gt0 -> between -> ignore
    ], jnp.float32)
    gb, gl, gv = pad_gt(np.array([[0, 0, 10, 10]]), [3])
    res = assigner.assign(boxes, gb, gv, gl)
    a = np.asarray(res['assigned_gt_inds'])
    assert a.tolist() == [1, 1, 0, -1]
    labels = np.asarray(res['labels'])
    assert labels[0] == 3 and labels[1] == 3
    assert labels[2] == -1 and labels[3] == -1


def test_max_iou_assigner_low_quality_match():
    # gt1 overlaps nothing above pos_thr; its best anchor (iou 0.45 >= 0.3)
    # must still be assigned via low-quality matching
    assigner = MaxIoUAssigner(pos_iou_thr=0.7, neg_iou_thr=0.3,
                              min_pos_iou=0.3, match_low_quality=True)
    boxes = jnp.array([
        [0, 0, 10, 10],
        [20, 20, 30, 32],
    ], jnp.float32)
    gb, gl, gv = pad_gt(np.array([[0, 0, 10, 10], [20, 22, 30, 34]]), [1, 2])
    res = assigner.assign(boxes, gb, gv, gl)
    a = np.asarray(res['assigned_gt_inds'])
    assert a[0] == 1      # exact match
    assert a[1] == 2      # low-quality match to gt1


def test_max_iou_assigner_invalid_gt_ignored():
    assigner = MaxIoUAssigner(pos_iou_thr=0.5, neg_iou_thr=0.4)
    boxes = jnp.array([[0, 0, 10, 10]], jnp.float32)
    gb = jnp.array([[0, 0, 10, 10], [0, 0, 10, 10]], jnp.float32)
    gv = jnp.array([False, True])
    res = assigner.assign(boxes, gb, gv, jnp.array([5, 7]))
    # must match the VALID gt (index 2 -> 1-based), not the invalid one
    assert int(res['assigned_gt_inds'][0]) == 2
    assert int(res['labels'][0]) == 7


def test_random_sampler_counts():
    sampler = RandomSampler(num=16, pos_fraction=0.25)
    assigned = jnp.asarray(
        np.array([1] * 3 + [0] * 100 + [-1] * 10), jnp.int32)
    out = sampler.sample(jax.random.PRNGKey(0), assigned)
    is_pos = np.asarray(out['is_pos'])
    valid = np.asarray(out['valid'])
    inds = np.asarray(out['inds'])
    assert valid.sum() == 16
    assert is_pos.sum() == 3  # only 3 pos available (< 4 expected)
    a = np.asarray(assigned)
    assert (a[inds[is_pos]] > 0).all()
    assert (a[inds[valid & ~is_pos]] == 0).all()
    # no duplicate picks
    assert len(set(inds[valid].tolist())) == 16


def test_random_sampler_pos_cap():
    sampler = RandomSampler(num=8, pos_fraction=0.5)
    assigned = jnp.asarray(np.array([1] * 50 + [0] * 50), jnp.int32)
    out = sampler.sample(jax.random.PRNGKey(1), assigned)
    assert np.asarray(out['is_pos']).sum() == 4
    assert np.asarray(out['valid']).sum() == 8


def test_random_sampler_few_candidates():
    sampler = RandomSampler(num=16, pos_fraction=0.25)
    assigned = jnp.asarray(np.array([1, 0, 0, -1]), jnp.int32)
    out = sampler.sample(jax.random.PRNGKey(2), assigned)
    assert np.asarray(out['valid']).sum() == 3  # 1 pos + 2 neg available


def test_pseudo_sampler():
    s = PseudoSampler()
    assigned = jnp.asarray(np.array([1, 0, -1, 2]), jnp.int32)
    out = s.sample(jax.random.PRNGKey(0), assigned)
    assert np.asarray(out['is_pos']).tolist() == [True, False, False, True]
    assert np.asarray(out['valid']).tolist() == [True, True, False, True]


def test_max_iou_assigner_empty_gt_all_negative():
    """Zero valid gts -> all anchors negative (reference behavior), not
    all-ignore (ADVICE r1)."""
    assigner = MaxIoUAssigner(pos_iou_thr=0.5, neg_iou_thr=0.4,
                              min_pos_iou=0.3, match_low_quality=True)
    boxes = jnp.array([[0, 0, 10, 10], [5, 5, 20, 20]], jnp.float32)
    gb = jnp.zeros((8, 4), jnp.float32)
    gv = jnp.zeros((8,), bool)
    gl = jnp.zeros((8,), jnp.int32)
    res = assigner.assign(boxes, gb, gv, gl)
    np.testing.assert_array_equal(np.asarray(res['assigned_gt_inds']), [0, 0])
