"""Test-time-augmentation merging (ref:
mmdet/core/post_processing/merge_augs.py:8-107).

Batched, static-shape: each aug contributes fixed-capacity arrays with
validity masks; "merging" is concatenation + NMS (proposals) or averaging
(boxes/scores/masks). Flip flags are static per aug (the MultiScaleFlipAug
pipeline emits augs in a deterministic order).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..bbox.transforms import bbox_mapping_back


def merge_aug_proposals(aug_proposals, aug_valids, aug_img_shapes,
                        aug_scale_factors, aug_flips, cfg):
    """(ref: merge_augs.py:8-43). Each aug's proposals are mapped back to
    the original image frame, concatenated, and re-NMSed.

    Args:
        aug_proposals: list per aug of (B, P, 5).
        aug_valids: list per aug of (B, P) bool.
        aug_img_shapes: list per aug of (B, 2) resized (h, w).
        aug_scale_factors: list per aug of (B, 4).
        aug_flips: list per aug of static bool.
        cfg: rpn test cfg with nms_thr / max_num.
    Returns:
        (B, max_num, 5) merged proposals in the original frame, (B, max_num)
        valid.
    """
    from ...ops.nms import nms
    mapped = []
    for props, shapes, sfs, flip in zip(aug_proposals, aug_img_shapes,
                                        aug_scale_factors, aug_flips):
        boxes = jax.vmap(
            lambda bx, sh, sf: bbox_mapping_back(bx, sh, sf, flip))(
            props[..., :4].astype(jnp.float32), shapes, sfs)
        mapped.append(jnp.concatenate([boxes, props[..., 4:5]], -1))
    all_props = jnp.concatenate(mapped, axis=1)
    all_valid = jnp.concatenate(list(aug_valids), axis=1)
    max_num = cfg.get('max_num', cfg.get('nms_post', 1000))

    def _one(pr, vm):
        dets, _, ov = nms(pr[:, :4], pr[:, 4], cfg['nms_thr'],
                          max_out=max_num, valid_mask=vm)
        return dets, ov

    return jax.vmap(_one)(all_props, all_valid)


def merge_aug_bboxes(aug_bboxes, aug_scores, aug_img_shapes,
                     aug_scale_factors, aug_flips):
    """Average decoded boxes/scores over augs after mapping back to the
    original frame (ref: merge_augs.py:46-77).

    aug_bboxes: list per aug of (B, P, 4k); aug_scores: list of (B, P, C)
    or None.
    """
    recovered = []
    for bx, shapes, sfs, flip in zip(aug_bboxes, aug_img_shapes,
                                     aug_scale_factors, aug_flips):
        recovered.append(jax.vmap(
            lambda b_, sh, sf: bbox_mapping_back(b_, sh, sf, flip))(
            bx.astype(jnp.float32), shapes, sfs))
    bboxes = jnp.mean(jnp.stack(recovered), axis=0)
    if aug_scores is None:
        return bboxes
    scores = jnp.mean(jnp.stack(list(aug_scores)), axis=0)
    return bboxes, scores


def merge_aug_scores(aug_scores):
    """(ref: merge_augs.py:80-85)."""
    return jnp.mean(jnp.stack(list(aug_scores)), axis=0)


def merge_aug_masks(aug_masks, aug_flips, weights=None):
    """Average mask probabilities over augs, un-flipping the horizontal
    flips (ref: merge_augs.py:88-107).

    aug_masks: list per aug of (..., mh, mw) probabilities.
    """
    recovered = [m[..., ::-1] if flip else m
                 for m, flip in zip(aug_masks, aug_flips)]
    stacked = jnp.stack(recovered)
    if weights is None:
        return jnp.mean(stacked, axis=0)
    w = jnp.asarray(weights, stacked.dtype)
    return (stacked * w[(...,) + (None,) * (stacked.ndim - 1)]).sum(0) \
        / w.sum()
