"""Box coordinate transforms (jnp, static-shape).

TPU-native counterpart of ref: mmdet/core/bbox/transforms.py:6-112. Boxes are
``(x1, y1, x2, y2)`` float arrays; every function is shape-polymorphic in the
leading dims and jit-safe (no data-dependent shapes).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def bbox_flip(bboxes, img_shape, direction='horizontal'):
    """Flip boxes inside an image of ``img_shape`` (h, w).

    Ref semantics: mmdet/core/bbox/transforms.py:6-28 (x2/x1 swap with
    ``w - x - 1`` convention is NOT used in v2; v2 uses ``w - x``).
    """
    assert bboxes.shape[-1] % 4 == 0
    h, w = img_shape[0], img_shape[1]
    flipped = bboxes
    if direction == 'horizontal':
        x1 = w - bboxes[..., 2::4]
        x2 = w - bboxes[..., 0::4]
        flipped = jnp.stack(
            [x1, bboxes[..., 1::4], x2, bboxes[..., 3::4]], axis=-1)
    elif direction == 'vertical':
        y1 = h - bboxes[..., 3::4]
        y2 = h - bboxes[..., 1::4]
        flipped = jnp.stack(
            [bboxes[..., 0::4], y1, bboxes[..., 2::4], y2], axis=-1)
    else:
        raise ValueError(f'Invalid flip direction: {direction}')
    return flipped.reshape(bboxes.shape)


def bbox_mapping(bboxes, img_shape, scale_factor, flip, direction='horizontal'):
    """Map boxes from original image scale to testing scale
    (ref: transforms.py:31-41)."""
    scale_factor = jnp.asarray(scale_factor, dtype=bboxes.dtype)
    new_bboxes = bboxes * jnp.tile(scale_factor.reshape(-1)[:4],
                                   bboxes.shape[-1] // 4)
    if flip:
        new_bboxes = bbox_flip(new_bboxes, img_shape, direction)
    return new_bboxes


def bbox_mapping_back(bboxes, img_shape, scale_factor, flip,
                      direction='horizontal'):
    """Map boxes from testing scale back to original image scale
    (ref: transforms.py:44-53)."""
    new_bboxes = bbox_flip(bboxes, img_shape, direction) if flip else bboxes
    scale_factor = jnp.asarray(scale_factor, dtype=bboxes.dtype)
    return new_bboxes / jnp.tile(scale_factor.reshape(-1)[:4],
                                 bboxes.shape[-1] // 4)


def bbox2roi(bbox_list):
    """Stack per-image ``(n, 4)`` boxes into ``(sum_n, 5)`` rois with a
    leading batch index column (ref: transforms.py:56-70). With static
    shapes every image contributes a fixed n."""
    rois = []
    for img_id, bboxes in enumerate(bbox_list):
        inds = jnp.full((bboxes.shape[0], 1), float(img_id),
                        dtype=bboxes.dtype)
        rois.append(jnp.concatenate([inds, bboxes[:, :4]], axis=-1))
    return jnp.concatenate(rois, axis=0)


def roi2bbox_list(rois, num_imgs, rois_per_img):
    """Inverse of :func:`bbox2roi` for the static-shape layout."""
    boxes = rois[:, 1:5].reshape(num_imgs, rois_per_img, 4)
    return [boxes[i] for i in range(num_imgs)]


def bbox2result(bboxes, labels, num_classes):
    """Convert final detections to the reference's per-class list-of-arrays
    result format (ref: transforms.py:73-91): a list of ``num_classes``
    float32 arrays of shape ``(k, 5)``.

    Host-side (numpy) — call only after device compute is done. Rows with
    ``score <= -1`` (padding slots) are dropped.
    """
    bboxes = np.asarray(bboxes)
    labels = np.asarray(labels)
    valid = bboxes[:, 4] > -1
    bboxes, labels = bboxes[valid], labels[valid]
    return [bboxes[labels == i, :].astype(np.float32)
            for i in range(num_classes)]


def distance2bbox(points, distance, max_shape=None):
    """Decode (left, top, right, bottom) distances from points to boxes
    (ref: transforms.py:94-112; used by FCOS-style heads)."""
    x1 = points[..., 0] - distance[..., 0]
    y1 = points[..., 1] - distance[..., 1]
    x2 = points[..., 0] + distance[..., 2]
    y2 = points[..., 1] + distance[..., 3]
    if max_shape is not None:
        x1 = jnp.clip(x1, 0, max_shape[1])
        y1 = jnp.clip(y1, 0, max_shape[0])
        x2 = jnp.clip(x2, 0, max_shape[1])
        y2 = jnp.clip(y2, 0, max_shape[0])
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def bbox_area(bboxes):
    return (bboxes[..., 2] - bboxes[..., 0]) * (bboxes[..., 3] - bboxes[..., 1])


def bbox_center_wh(bboxes):
    """Return (cx, cy, w, h) tuple of arrays."""
    cx = (bboxes[..., 0] + bboxes[..., 2]) * 0.5
    cy = (bboxes[..., 1] + bboxes[..., 3]) * 0.5
    w = bboxes[..., 2] - bboxes[..., 0]
    h = bboxes[..., 3] - bboxes[..., 1]
    return cx, cy, w, h
