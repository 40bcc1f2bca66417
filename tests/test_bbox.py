import jax.numpy as jnp
import numpy as np
import pytest

from arfe_tpu.core.bbox import (DeltaXYWHBBoxCoder, bbox2delta, bbox2roi,
                                bbox_flip, bbox_overlaps, delta2bbox)


def test_delta2bbox_golden():
    # Golden values from the reference docstring
    # (ref: mmdet/core/bbox/coder/delta_xywh_bbox_coder.py:127-139).
    rois = jnp.array([[0., 0., 1., 1.],
                      [0., 0., 1., 1.],
                      [0., 0., 1., 1.],
                      [5., 5., 5., 5.]])
    deltas = jnp.array([[0., 0., 0., 0.],
                        [1., 1., 1., 1.],
                        [0., 0., 2., -1.],
                        [0.7, -1.9, -0.5, 0.3]])
    out = delta2bbox(rois, deltas, max_shape=(32, 32))
    expected = np.array([[0.0000, 0.0000, 1.0000, 1.0000],
                         [0.1409, 0.1409, 2.8591, 2.8591],
                         [0.0000, 0.3161, 4.1945, 0.6839],
                         [5.0000, 5.0000, 5.0000, 5.0000]])
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-4)


def test_encode_decode_roundtrip():
    rng = np.random.RandomState(0)
    x1y1 = rng.uniform(0, 100, (64, 2))
    wh = rng.uniform(2, 50, (64, 2))
    boxes = np.concatenate([x1y1, x1y1 + wh], axis=1).astype(np.float32)
    x1y1g = rng.uniform(0, 100, (64, 2))
    whg = rng.uniform(2, 50, (64, 2))
    gts = np.concatenate([x1y1g, x1y1g + whg], axis=1).astype(np.float32)
    coder = DeltaXYWHBBoxCoder(target_means=(0.1, 0.1, 0., 0.),
                               target_stds=(0.1, 0.1, 0.2, 0.2))
    deltas = coder.encode(jnp.asarray(boxes), jnp.asarray(gts))
    rec = coder.decode(jnp.asarray(boxes), deltas)
    np.testing.assert_allclose(np.asarray(rec), gts, atol=5e-3)


def test_classwise_decode_shape():
    rois = jnp.zeros((10, 4)).at[:, 2:].set(10.0)
    deltas = jnp.zeros((10, 4 * 5))
    out = delta2bbox(rois, deltas)
    assert out.shape == (10, 20)


def test_bbox_overlaps_golden():
    a = jnp.array([[0., 0., 10., 10.]])
    b = jnp.array([[0., 0., 10., 10.],
                   [5., 5., 15., 15.],
                   [20., 20., 30., 30.]])
    iou = np.asarray(bbox_overlaps(a, b))
    np.testing.assert_allclose(iou[0], [1.0, 25. / 175., 0.0], atol=1e-6)
    iof = np.asarray(bbox_overlaps(a, b, mode='iof'))
    np.testing.assert_allclose(iof[0], [1.0, 0.25, 0.0], atol=1e-6)


def test_bbox_overlaps_aligned_and_batched():
    a = jnp.array([[0., 0., 4., 4.], [0., 0., 2., 2.]])
    b = jnp.array([[0., 0., 4., 4.], [1., 1., 3., 3.]])
    out = np.asarray(bbox_overlaps(a, b, is_aligned=True))
    np.testing.assert_allclose(out, [1.0, 1. / 7.], atol=1e-6)
    # batched leading dim
    a3 = jnp.broadcast_to(a, (3, 2, 4))
    b3 = jnp.broadcast_to(b, (3, 2, 4))
    out3 = np.asarray(bbox_overlaps(a3, b3))
    assert out3.shape == (3, 2, 2)


def test_bbox_flip_roundtrip():
    boxes = jnp.array([[10., 20., 30., 40.]])
    flipped = bbox_flip(boxes, (100, 200))
    np.testing.assert_allclose(np.asarray(flipped), [[170., 20., 190., 40.]])
    back = bbox_flip(flipped, (100, 200))
    np.testing.assert_allclose(np.asarray(back), np.asarray(boxes))


def test_bbox2roi():
    b0 = jnp.ones((3, 4))
    b1 = 2 * jnp.ones((3, 4))
    rois = np.asarray(bbox2roi([b0, b1]))
    assert rois.shape == (6, 5)
    assert (rois[:3, 0] == 0).all() and (rois[3:, 0] == 1).all()


def test_encode_golden_vs_reference_formula():
    # Hand-checked single case of bbox2delta with nonzero means/stds.
    p = jnp.array([[0., 0., 10., 20.]])
    g = jnp.array([[2., 2., 12., 26.]])
    d = np.asarray(bbox2delta(p, g, means=(0., 0., 0., 0.),
                              stds=(0.1, 0.1, 0.2, 0.2)))
    # px,py,pw,ph = 5,10,10,20 ; gx,gy,gw,gh = 7,14,10,24
    exp = np.array([[0.2 / 0.1, 0.2 / 0.1, 0.0, np.log(24 / 20) / 0.2]])
    np.testing.assert_allclose(d, exp, atol=5e-4)
