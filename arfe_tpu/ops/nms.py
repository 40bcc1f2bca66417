"""Static-shape greedy NMS for TPU (jnp / XLA).

TPU-native counterpart of the reference's CUDA/CPU NMS stack
(ref: mmdet/ops/nms/nms_wrapper.py:7-160, src/nms_kernel.cu, nms_cpu.cpp).
Instead of a dynamic-shape kernel returning a variable number of indices,
everything here has fixed output capacity with validity masks so it composes
into a single jitted program with zero host round-trips.

Algorithm: exact greedy NMS via score-sorted tiles (the standard TPU
formulation, cf. TF's ``non_max_suppression_padded``): boxes are processed in
tiles of ``tile_size``; each tile is first suppressed against surviving boxes
of earlier tiles (vectorized (T, N) IoU), then self-suppressed to a fixpoint
with a bounded ``while_loop``. Suppressed boxes are zeroed, which removes
their suppression power (zero-area => IoU 0). The result is bit-identical to
sequential greedy NMS.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core.bbox.iou import bbox_overlaps

NEG_INF = -jnp.inf


def _pad_to_multiple(x, multiple, axis=0, value=0.0):
    n = x.shape[axis]
    pad = (-n) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def _nms_sorted_keep(sorted_boxes, iou_threshold, tile_size=128):
    """Greedy-NMS keep mask over score-descending ``sorted_boxes`` (N, 4).

    Zero-area boxes never suppress anything; the caller is responsible for
    masking out padding in the returned keep mask.
    """
    n = sorted_boxes.shape[0]
    t = tile_size
    assert n % t == 0
    num_tiles = n // t
    col_idx = jnp.arange(n)
    row_in_tile = jnp.arange(t)
    # tri[k, j]: box k (earlier, higher score) may suppress box j within tile
    tri = row_in_tile[:, None] < row_in_tile[None, :]

    def process_tile(i, state):
        boxes_z, keep = state
        start = i * t
        tile = jax.lax.dynamic_slice(boxes_z, (start, 0), (t, 4))
        # Suppression by surviving boxes of earlier tiles (already final).
        iou_cross = bbox_overlaps(tile, boxes_z)
        prev_cols = (col_idx < start)[None, :]
        sup_cross = jnp.any((iou_cross > iou_threshold) & prev_cols, axis=1)
        tile = tile * (~sup_cross)[:, None].astype(tile.dtype)
        # Within-tile fixpoint: alive[j] = no alive k<j with IoU>thr.
        iou_self = bbox_overlaps(tile, tile)
        sup_pair = (iou_self > iou_threshold) & tri

        def cond(carry):
            alive, prev, it = carry
            return jnp.logical_and(it < t, jnp.any(alive != prev))

        def body(carry):
            alive, _, it = carry
            new_alive = ~jnp.any(sup_pair & alive[:, None], axis=0)
            return new_alive, alive, it + 1

        alive0 = jnp.ones((t,), dtype=bool)
        alive, _, _ = jax.lax.while_loop(
            cond, body, (alive0, jnp.zeros((t,), dtype=bool), 0))
        alive = alive & ~sup_cross
        tile = tile * alive[:, None].astype(tile.dtype)
        boxes_z = jax.lax.dynamic_update_slice(boxes_z, tile, (start, 0))
        keep = jax.lax.dynamic_update_slice(keep, alive, (start,))
        return boxes_z, keep

    keep0 = jnp.zeros((n,), dtype=bool)
    _, keep = jax.lax.fori_loop(0, num_tiles, process_tile,
                                (sorted_boxes, keep0))
    return keep


def nms(boxes, scores, iou_threshold, max_out=None, valid_mask=None,
        tile_size=256):
    """Hard NMS with fixed output capacity.

    Args:
        boxes: (N, 4) float boxes.
        scores: (N,) scores. Higher first.
        iou_threshold: suppression IoU threshold (ref ``iou_thr``).
            (tile_size=256 measured fastest on v5e: fewer sequential
            tile steps than 128, better VPU shapes than 512 — exact
            greedy at any tile size.)
        max_out: number of output slots (defaults to N).
        valid_mask: optional (N,) bool; False entries never participate.

    Returns:
        dets: (max_out, 5) — kept boxes with scores; padded rows are all-zero
            boxes with score -1.
        idx: (max_out,) int32 indices into the input (padding: 0).
        out_valid: (max_out,) bool validity of each slot.
    """
    n = boxes.shape[0]
    if max_out is None:
        max_out = n
    scores_m = scores.astype(jnp.float32)
    if valid_mask is not None:
        scores_m = jnp.where(valid_mask, scores_m, NEG_INF)
    order = jnp.argsort(-scores_m)
    sboxes = boxes[order].astype(jnp.float32)
    sscores = scores_m[order]
    svalid = jnp.isfinite(sscores)
    sboxes = sboxes * svalid[:, None].astype(sboxes.dtype)

    # A bit-exact Pallas greedy-NMS kernel existed through round 4 but was
    # measured 9x SLOWER than this XLA tile fixpoint on v5e (NMS state is
    # tiny; the fixpoint parallelizes) — removed, measurement in CLAUDE.md.
    t = min(tile_size, max(8, n))
    pboxes = _pad_to_multiple(sboxes, t, axis=0)
    keep = _nms_sorted_keep(pboxes, iou_threshold, t)[:n]
    keep = keep & svalid

    kept_scores = jnp.where(keep, sscores, NEG_INF)
    k = min(max_out, n)
    top_vals, top_pos = jax.lax.top_k(kept_scores, k)
    out_valid = jnp.isfinite(top_vals)
    idx = jnp.where(out_valid, order[top_pos], 0).astype(jnp.int32)
    out_boxes = boxes[order[top_pos]].astype(jnp.float32)
    out_boxes = out_boxes * out_valid[:, None].astype(out_boxes.dtype)
    out_scores = jnp.where(out_valid, top_vals, -1.0)
    dets = jnp.concatenate([out_boxes, out_scores[:, None]], axis=1)
    if k < max_out:  # pad output capacity beyond candidate count
        pad = max_out - k
        dets = jnp.concatenate(
            [dets, jnp.tile(jnp.array([[0., 0., 0., 0., -1.]],
                                      dtype=dets.dtype), (pad, 1))], axis=0)
        idx = jnp.concatenate([idx, jnp.zeros((pad,), jnp.int32)])
        out_valid = jnp.concatenate([out_valid,
                                     jnp.zeros((pad,), dtype=bool)])
    return dets, idx, out_valid


def batched_nms(boxes, scores, idxs, nms_cfg, max_out=None, valid_mask=None):
    """Class-/group-wise NMS via the coordinate-offset trick
    (ref: mmdet/ops/nms/nms_wrapper.py:119-157).

    Boxes of different ``idxs`` never suppress each other.
    """
    nms_cfg = dict(nms_cfg)
    nms_type = nms_cfg.pop('type', 'nms')
    # mmdet 2.0 configs say ``iou_thr``; accept ``iou_threshold`` too
    iou_thr = nms_cfg.pop('iou_thr', None)
    if iou_thr is None:
        iou_thr = nms_cfg.pop('iou_threshold')
    if nms_type == 'soft_nms':
        return soft_nms(boxes, scores, iou_thr, max_out=max_out,
                        valid_mask=valid_mask, **nms_cfg)
    max_coordinate = jnp.max(boxes)
    offsets = idxs.astype(boxes.dtype) * (max_coordinate + 1.0)
    boxes_for_nms = boxes + offsets[:, None]
    dets, idx, out_valid = nms(boxes_for_nms, scores, iou_thr,
                               max_out=max_out, valid_mask=valid_mask)
    # Recover un-offset coordinates for the kept boxes.
    out_boxes = boxes[idx].astype(jnp.float32) \
        * out_valid[:, None].astype(jnp.float32)
    dets = jnp.concatenate([out_boxes, dets[:, 4:5]], axis=1)
    return dets, idx, out_valid


def soft_nms(boxes, scores, iou_threshold, sigma=0.5, min_score=1e-3,
             method='linear', max_out=None, valid_mask=None):
    """Soft-NMS (ref: mmdet/ops/nms/src/nms_cpu.cpp soft_nms_cpu_kernel:77;
    python surface nms_wrapper.py:62-116).

    Sequential greedy pick + score decay, bounded at ``max_out`` picks.
    """
    n = boxes.shape[0]
    if max_out is None:
        max_out = n
    boxes = boxes.astype(jnp.float32)
    scores_m = scores.astype(jnp.float32)
    if valid_mask is not None:
        scores_m = jnp.where(valid_mask, scores_m, NEG_INF)

    def body(i, state):
        cur_scores, out_boxes, out_scores, out_idx = state
        pick = jnp.argmax(cur_scores)
        pick_score = cur_scores[pick]
        pick_box = boxes[pick]
        ok = pick_score >= min_score
        out_boxes = out_boxes.at[i].set(
            jnp.where(ok, pick_box, jnp.zeros(4, jnp.float32)))
        out_scores = out_scores.at[i].set(jnp.where(ok, pick_score, -1.0))
        out_idx = out_idx.at[i].set(jnp.where(ok, pick, 0).astype(jnp.int32))
        ious = bbox_overlaps(pick_box[None, :], boxes)[0]
        if method == 'linear':
            decay = jnp.where(ious > iou_threshold, 1.0 - ious, 1.0)
        elif method == 'gaussian':
            decay = jnp.exp(-(ious * ious) / sigma)
        else:  # 'naive' == hard
            decay = jnp.where(ious > iou_threshold, 0.0, 1.0)
        cur_scores = jnp.where(ok, cur_scores * decay, cur_scores)
        cur_scores = cur_scores.at[pick].set(NEG_INF)
        return cur_scores, out_boxes, out_scores, out_idx

    out = jax.lax.fori_loop(
        0, max_out, body,
        (scores_m, jnp.zeros((max_out, 4), jnp.float32),
         jnp.full((max_out,), -1.0, jnp.float32),
         jnp.zeros((max_out,), jnp.int32)))
    _, out_boxes, out_scores, out_idx = out
    out_valid = out_scores >= 0
    dets = jnp.concatenate([out_boxes, out_scores[:, None]], axis=1)
    return dets, out_idx, out_valid


def nms_match(dets, iou_threshold):
    """Group boxes into NMS-suppression clusters
    (ref: nms_wrapper.py:160-199, nms_match_cpu_kernel). Returns, for each
    box, the index of its cluster root (the kept box that suppressed it, or
    itself). Static-shape analog of the list-of-groups API."""
    boxes, scores = dets[:, :4], dets[:, 4]
    n = boxes.shape[0]
    order = jnp.argsort(-scores)
    sboxes = boxes[order]
    t = min(128, max(8, n))
    pboxes = _pad_to_multiple(sboxes, t, axis=0)
    keep_sorted = _nms_sorted_keep(pboxes, iou_threshold, t)[:n]
    iou = bbox_overlaps(sboxes, sboxes)
    kept_cols = keep_sorted[None, :] & (jnp.arange(n)[None, :]
                                        <= jnp.arange(n)[:, None])
    cand = jnp.where(kept_cols & (iou > iou_threshold),
                     jnp.arange(n)[None, :], n)
    root_sorted = jnp.min(cand, axis=1)
    root_sorted = jnp.where(keep_sorted, jnp.arange(n), root_sorted)
    root_sorted = jnp.where(root_sorted == n, jnp.arange(n), root_sorted)
    roots = jnp.zeros((n,), jnp.int32).at[order].set(order[root_sorted])
    return roots
