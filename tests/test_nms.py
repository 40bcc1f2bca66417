import jax.numpy as jnp
import numpy as np
import pytest

from arfe_tpu.core.post import multiclass_nms
from arfe_tpu.ops import batched_nms, nms, soft_nms


def greedy_nms_ref(boxes, scores, thr):
    """Plain numpy sequential greedy NMS — the spec
    (ref: mmdet/ops/nms/src/nms_cpu.cpp hard-NMS semantics)."""
    order = np.argsort(-scores, kind='stable')
    keep = []
    suppressed = np.zeros(len(boxes), dtype=bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        x1 = np.maximum(boxes[i, 0], boxes[:, 0])
        y1 = np.maximum(boxes[i, 1], boxes[:, 1])
        x2 = np.minimum(boxes[i, 2], boxes[:, 2])
        y2 = np.minimum(boxes[i, 3], boxes[:, 3])
        inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
        area_i = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
        iou = inter / np.maximum(area_i + areas - inter, 1e-6)
        suppressed |= iou > thr
        suppressed[i] = False  # keep self
    return keep


@pytest.mark.parametrize('n,thr', [(8, 0.5), (64, 0.5), (300, 0.7),
                                   (1000, 0.5)])
def test_nms_matches_sequential_greedy(n, thr):
    rng = np.random.RandomState(n)
    xy = rng.uniform(0, 200, (n, 2))
    wh = rng.uniform(5, 80, (n, 2))
    boxes = np.concatenate([xy, xy + wh], axis=1).astype(np.float32)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    ref_keep = greedy_nms_ref(boxes, scores, thr)

    dets, idx, valid = nms(jnp.asarray(boxes), jnp.asarray(scores), thr)
    got_idx = np.asarray(idx)[np.asarray(valid)]
    assert list(got_idx) == ref_keep
    # scores in descending order
    got_scores = np.asarray(dets)[np.asarray(valid), 4]
    assert (np.diff(got_scores) <= 1e-6).all()


def test_nms_max_out_and_padding():
    boxes = jnp.array([[0, 0, 10, 10], [100, 0, 110, 10], [0, 100, 10, 110],
                       [1, 1, 11, 11]], dtype=jnp.float32)
    scores = jnp.array([0.9, 0.8, 0.7, 0.85])
    dets, idx, valid = nms(boxes, scores, 0.5, max_out=4)
    v = np.asarray(valid)
    assert v.sum() == 3  # box 3 suppressed by box 0
    assert list(np.asarray(idx)[v]) == [0, 1, 2]
    # padded row has score -1
    assert np.asarray(dets)[3, 4] == -1.0


def test_nms_valid_mask():
    boxes = jnp.array([[0, 0, 10, 10], [100, 0, 110, 10]], dtype=jnp.float32)
    scores = jnp.array([0.9, 0.8])
    mask = jnp.array([True, False])
    dets, idx, valid = nms(boxes, scores, 0.5, max_out=2, valid_mask=mask)
    assert np.asarray(valid).tolist() == [True, False]


def test_batched_nms_class_isolation():
    # Identical boxes in different classes must both survive
    # (ref: nms_wrapper.py:119-157 offset trick).
    boxes = jnp.array([[0, 0, 10, 10], [0, 0, 10, 10]], dtype=jnp.float32)
    scores = jnp.array([0.9, 0.8])
    idxs = jnp.array([0, 1])
    dets, idx, valid = batched_nms(boxes, scores, idxs,
                                   dict(type='nms', iou_thr=0.5), max_out=2)
    assert np.asarray(valid).sum() == 2
    # coordinates are un-offset in the output
    np.testing.assert_allclose(np.asarray(dets)[:, :4],
                               [[0, 0, 10, 10], [0, 0, 10, 10]])


def test_soft_nms_decays_scores():
    boxes = jnp.array([[0, 0, 10, 10], [1, 1, 11, 11], [100, 100, 110, 110]],
                      dtype=jnp.float32)
    scores = jnp.array([0.9, 0.8, 0.7])
    dets, idx, valid = soft_nms(boxes, scores, 0.3, method='linear',
                                min_score=1e-3, max_out=3)
    d = np.asarray(dets)
    v = np.asarray(valid)
    assert v.all()
    # overlapping box decayed below its original score, isolated box intact
    picked = {int(i): float(s) for i, s in
              zip(np.asarray(idx), d[:, 4])}
    assert picked[0] == pytest.approx(0.9)
    assert picked[2] == pytest.approx(0.7)
    assert picked[1] < 0.8


def test_multiclass_nms():
    n, c = 20, 4
    rng = np.random.RandomState(3)
    xy = rng.uniform(0, 100, (n, 2))
    wh = rng.uniform(10, 40, (n, 2))
    boxes = np.concatenate([xy, xy + wh], axis=1).astype(np.float32)
    scores = rng.uniform(0, 1, (n, c + 1)).astype(np.float32)
    dets, labels, valid = multiclass_nms(
        jnp.asarray(boxes), jnp.asarray(scores), score_thr=0.3,
        nms_cfg=dict(type='nms', iou_thr=0.5), max_num=10)
    assert dets.shape == (10, 5)
    v = np.asarray(valid)
    assert 0 < v.sum() <= 10
    assert (np.asarray(dets)[v, 4] > 0.3).all()
    assert (np.asarray(labels)[v] < c).all()
    # descending score order
    s = np.asarray(dets)[v, 4]
    assert (np.diff(s) <= 1e-6).all()


def test_multiclass_nms_respects_row_validity():
    boxes = jnp.array([[0, 0, 10, 10], [50, 50, 60, 60]], dtype=jnp.float32)
    scores = jnp.array([[0.9, 0.1], [0.9, 0.1]])  # class0 + bg column
    dets, labels, valid = multiclass_nms(
        boxes, scores, 0.05, dict(type='nms', iou_thr=0.5), max_num=4,
        valid_mask=jnp.array([True, False]))
    assert np.asarray(valid).sum() == 1
