"""Samplers (static, mask-based).

TPU-native counterpart of ref: mmdet/core/bbox/samplers/random_sampler.py
(+ PseudoSampler). Sampling without replacement under jit is done by ranking
uniform random priorities (equivalent in distribution to the reference's
``random_choice`` permutation). Outputs have a fixed ``num`` slots with a
validity mask; the dynamic pos/neg split lives in the values, not shapes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ...registry import BBOX_SAMPLERS


def _pick_k_smallest(priority, k_static, limit):
    """Indices of the ``limit`` (dynamic, <= k_static) smallest finite
    priorities: (idx (k,), ok (k,) bool). top_k instead of a full argsort —
    ranking 268k RPN anchors per image via argsort dominated the train-step
    target assignment."""
    n = priority.shape[0]
    k = min(k_static, n)
    negvals, idx = jax.lax.top_k(-priority, k)
    ok = (jnp.arange(k) < limit) & jnp.isfinite(negvals)
    return idx, ok


class BaseStaticSampler:
    """Shared pos/neg quota logic + fixed-slot compression
    (ref: samplers/base_sampler.py sample()). Subclasses override
    ``_pos_priority`` / ``_neg_priority`` — lower priority value means
    more preferred; inf means not a candidate.
    """

    needs_hard_scores = False

    def __init__(self, num, pos_fraction, neg_pos_ub=-1,
                 add_gt_as_proposals=True, **kwargs):
        self.num = num
        self.pos_fraction = pos_fraction
        self.neg_pos_ub = neg_pos_ub
        self.add_gt_as_proposals = add_gt_as_proposals

    def _pos_priority(self, key, cand, ctx):
        return jnp.where(cand, jax.random.uniform(key, cand.shape), jnp.inf)

    def _neg_priority(self, key, cand, ctx):
        return jnp.where(cand, jax.random.uniform(key, cand.shape), jnp.inf)

    def sample(self, key, assigned_gt_inds, **ctx):
        """Select up to ``num*pos_fraction`` positives and fill with
        negatives (ref: base_sampler.sample).

        Args:
            key: PRNG key.
            assigned_gt_inds: (N,) -1/0/k assigner output.
            ctx: optional extras — ``hard_scores`` (N,) per-candidate loss
                for OHEM, ``max_overlaps`` (N,) for IoU-balanced sampling.
        Returns:
            dict(inds (num,) int32 candidate indices,
                 is_pos (num,) bool, valid (num,) bool)
        """
        n = assigned_gt_inds.shape[0]
        kp, kn = jax.random.split(key)
        pos_cand = assigned_gt_inds > 0
        neg_cand = assigned_gt_inds == 0
        ctx = dict(ctx, assigned_gt_inds=assigned_gt_inds)

        num_expected_pos = int(self.num * self.pos_fraction)
        num_pos_avail = pos_cand.sum()
        num_pos = jnp.minimum(num_expected_pos, num_pos_avail)
        pos_idx, pos_ok = _pick_k_smallest(
            self._pos_priority(kp, pos_cand, ctx), num_expected_pos,
            num_pos)

        num_neg_avail = neg_cand.sum()
        num_neg_expected = self.num - num_pos
        if self.neg_pos_ub >= 0:
            num_neg_expected = jnp.minimum(
                num_neg_expected, jnp.maximum(1, num_pos * self.neg_pos_ub))
        num_neg = jnp.minimum(num_neg_expected, num_neg_avail)
        neg_idx, neg_ok = _pick_k_smallest(
            self._neg_priority(kn, neg_cand, ctx), self.num, num_neg)

        # compress into `num` fixed slots: selected positives first, then
        # negatives (slot order is irrelevant downstream — consumers pair
        # `inds` with the is_pos/valid masks)
        cand_idx = jnp.concatenate([pos_idx, neg_idx])
        cand_score = jnp.concatenate(
            [2.0 * pos_ok.astype(jnp.float32),
             1.0 * neg_ok.astype(jnp.float32)])
        k = min(self.num, cand_idx.shape[0])
        picked, slot = jax.lax.top_k(cand_score, k)
        inds = cand_idx[slot]
        is_pos = picked >= 2.0
        valid = picked >= 1.0
        if k < self.num:
            pad = self.num - k
            inds = jnp.concatenate([inds, jnp.zeros((pad,), inds.dtype)])
            is_pos = jnp.concatenate([is_pos, jnp.zeros((pad,), bool)])
            valid = jnp.concatenate([valid, jnp.zeros((pad,), bool)])
        return dict(inds=inds.astype(jnp.int32), is_pos=is_pos, valid=valid)


@BBOX_SAMPLERS.register_module()
class RandomSampler(BaseStaticSampler):
    """(ref: samplers/random_sampler.py) — uniform random pos/neg."""


def _group_balanced_priority(key, cand, group_ids, num_groups):
    """Priority = (rank within group, random tiebreak): selecting the k
    smallest priorities round-robins across groups — the static equivalent
    of per-group quota sampling with random fill."""
    n = cand.shape[0]
    rnd = jax.random.uniform(key, (n,))
    prio = jnp.where(cand, rnd, jnp.inf)
    onehot = (group_ids[:, None] == jnp.arange(num_groups)[None, :]) \
        & cand[:, None]
    # rank within group = #same-group candidates with smaller random draw
    smaller = (rnd[:, None] > rnd[None, :]) & cand[None, :]
    same_group = group_ids[:, None] == group_ids[None, :]
    within_rank = (smaller & same_group).sum(axis=1)
    del onehot
    return jnp.where(cand, within_rank.astype(jnp.float32) + rnd, jnp.inf)


@BBOX_SAMPLERS.register_module()
class InstanceBalancedPosSampler(BaseStaticSampler):
    """Balance positives across gt instances
    (ref: samplers/instance_balanced_pos_sampler.py): per-gt quota with
    random fill, realized as round-robin rank selection."""

    def _pos_priority(self, key, cand, ctx):
        assigned = ctx['assigned_gt_inds']
        g = int(ctx.get('num_gts', 128))
        return _group_balanced_priority(key, cand,
                                        jnp.clip(assigned - 1, 0, g - 1), g)


@BBOX_SAMPLERS.register_module()
class IoUBalancedNegSampler(BaseStaticSampler):
    """IoU-balanced negatives (ref: samplers/iou_balanced_neg_sampler.py):
    ``1 - floor_fraction`` of negatives drawn uniformly across IoU bins in
    [floor_thr, pos_iou), the rest from IoU < floor_thr. Realized as
    round-robin across bins with the floor set ranked after the binned
    sets in proportion."""

    def __init__(self, num, pos_fraction, floor_thr=-1, floor_fraction=0,
                 num_bins=3, **kwargs):
        super().__init__(num, pos_fraction, **kwargs)
        self.floor_thr = floor_thr
        self.floor_fraction = floor_fraction
        self.num_bins = num_bins

    def _neg_priority(self, key, cand, ctx):
        overlaps = ctx.get('max_overlaps')
        if overlaps is None:
            return super()._neg_priority(key, cand, ctx)
        floor = max(self.floor_thr, 0.0)
        # bin negatives by IoU; the floor set gets its own group whose
        # round-robin weight is scaled so it receives ~floor_fraction
        hi = 0.5  # bins span [floor, 0.5) as in the reference's max_iou
        binned = jnp.clip(((overlaps - floor) / max(hi - floor, 1e-6)
                           * self.num_bins).astype(jnp.int32), 0,
                          self.num_bins - 1)
        in_floor = overlaps < self.floor_thr if self.floor_thr >= 0 \
            else jnp.zeros_like(cand)
        group = jnp.where(in_floor, self.num_bins, binned)
        prio = _group_balanced_priority(key, cand, group, self.num_bins + 1)
        if self.floor_fraction > 0:
            # stretch the floor group's ranks so it contributes
            # floor_fraction of each selection prefix
            scale = (1 - self.floor_fraction) / max(self.floor_fraction,
                                                    1e-6) / self.num_bins
            prio = jnp.where(in_floor & cand, prio * scale, prio)
        return prio


@BBOX_SAMPLERS.register_module()
class OHEMSampler(BaseStaticSampler):
    """Online Hard Example Mining (ref: samplers/ohem_sampler.py:9-84):
    positives and negatives are picked by highest current classification
    loss. The RoI head supplies ``hard_scores`` (per-candidate cls loss,
    computed with a stop-gradient forward over all candidates)."""

    needs_hard_scores = True

    def __init__(self, num, pos_fraction, context=None, **kwargs):
        super().__init__(num, pos_fraction, **kwargs)

    def _hard_priority(self, key, cand, ctx):
        hard = ctx.get('hard_scores')
        if hard is None:
            return jnp.where(cand, jax.random.uniform(key, cand.shape),
                             jnp.inf)
        return jnp.where(cand, -hard, jnp.inf)

    _pos_priority = _hard_priority
    _neg_priority = _hard_priority


@BBOX_SAMPLERS.register_module()
class ScoreHLRSampler(OHEMSampler):
    """Score-based hard-loss ranking (ref: samplers/score_hlr_sampler.py).
    Simplified to hard-score ranking (the reference's score-guided decay
    reweighting requires its NMS-match machinery); behaves as OHEM."""


@BBOX_SAMPLERS.register_module()
class CombinedSampler(BaseStaticSampler):
    """Different samplers for pos and neg
    (ref: samplers/combined_sampler.py)."""

    def __init__(self, num, pos_fraction, pos_sampler=None, neg_sampler=None,
                 **kwargs):
        super().__init__(num, pos_fraction, **kwargs)
        from ...registry import build_from_cfg as _build
        common = dict(num=num, pos_fraction=pos_fraction)
        self.pos_sampler = _build(dict(common, **(pos_sampler or
                                                  dict(type='RandomSampler'))),
                                  BBOX_SAMPLERS)
        self.neg_sampler = _build(dict(common, **(neg_sampler or
                                                  dict(type='RandomSampler'))),
                                  BBOX_SAMPLERS)
        self.needs_hard_scores = (self.pos_sampler.needs_hard_scores
                                  or self.neg_sampler.needs_hard_scores)

    def _pos_priority(self, key, cand, ctx):
        return self.pos_sampler._pos_priority(key, cand, ctx)

    def _neg_priority(self, key, cand, ctx):
        return self.neg_sampler._neg_priority(key, cand, ctx)


@BBOX_SAMPLERS.register_module()
class RandomSamplerPrior(RandomSampler):
    """ARFE variant (ref: samplers/random_sampler_prior.py:9) — same sampling
    behavior in its final state; kept as a registered alias for config
    compatibility."""


@BBOX_SAMPLERS.register_module()
class PseudoSampler:
    """Select everything (ref: samplers/pseudo_sampler.py): positives are
    assigned>0, negatives assigned==0, no subsampling."""

    needs_hard_scores = False
    add_gt_as_proposals = False

    def __init__(self, **kwargs):
        pass

    def sample(self, key, assigned_gt_inds, **ctx):
        n = assigned_gt_inds.shape[0]
        inds = jnp.arange(n, dtype=jnp.int32)
        return dict(inds=inds, is_pos=assigned_gt_inds > 0,
                    valid=assigned_gt_inds >= 0)
