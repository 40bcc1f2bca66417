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


def _rank_of(priority):
    """rank[i] = position of i in ascending sort of priority."""
    order = jnp.argsort(priority)
    return jnp.zeros_like(order).at[order].set(jnp.arange(order.shape[0]))


@BBOX_SAMPLERS.register_module()
class RandomSampler:
    def __init__(self, num, pos_fraction, neg_pos_ub=-1,
                 add_gt_as_proposals=True, **kwargs):
        self.num = num
        self.pos_fraction = pos_fraction
        self.neg_pos_ub = neg_pos_ub
        self.add_gt_as_proposals = add_gt_as_proposals

    def sample(self, key, assigned_gt_inds):
        """Select up to ``num*pos_fraction`` positives and fill with
        negatives (ref: random_sampler.py + base_sampler.sample).

        Args:
            key: PRNG key.
            assigned_gt_inds: (N,) -1/0/k assigner output.
        Returns:
            dict(inds (num,) int32 candidate indices,
                 is_pos (num,) bool, valid (num,) bool)
        """
        n = assigned_gt_inds.shape[0]
        kp, kn, kc = jax.random.split(key, 3)
        pos_cand = assigned_gt_inds > 0
        neg_cand = assigned_gt_inds == 0

        num_expected_pos = int(self.num * self.pos_fraction)
        pos_priority = jnp.where(pos_cand, jax.random.uniform(kp, (n,)),
                                 jnp.inf)
        pos_rank = _rank_of(pos_priority)
        num_pos_avail = pos_cand.sum()
        num_pos = jnp.minimum(num_expected_pos, num_pos_avail)
        sel_pos = pos_cand & (pos_rank < num_pos)

        num_neg_avail = neg_cand.sum()
        num_neg_expected = self.num - num_pos
        if self.neg_pos_ub >= 0:
            num_neg_expected = jnp.minimum(
                num_neg_expected, jnp.maximum(1, num_pos * self.neg_pos_ub))
        neg_priority = jnp.where(neg_cand, jax.random.uniform(kn, (n,)),
                                 jnp.inf)
        neg_rank = _rank_of(neg_priority)
        num_neg = jnp.minimum(num_neg_expected, num_neg_avail)
        sel_neg = neg_cand & (neg_rank < num_neg)

        # compress selected candidates into `num` fixed slots
        score = (2.0 * sel_pos + 1.0 * sel_neg
                 + 1e-4 * jax.random.uniform(kc, (n,)))
        k = min(self.num, n)
        _, inds = jax.lax.top_k(score, k)
        if k < self.num:
            inds = jnp.concatenate(
                [inds, jnp.zeros((self.num - k,), inds.dtype)])
        picked = score[inds]
        is_pos = picked >= 2.0
        valid = picked >= 1.0
        if k < self.num:
            slot_ok = jnp.arange(self.num) < k
            is_pos = is_pos & slot_ok
            valid = valid & slot_ok
        return dict(inds=inds.astype(jnp.int32), is_pos=is_pos, valid=valid)


@BBOX_SAMPLERS.register_module()
class RandomSamplerPrior(RandomSampler):
    """ARFE variant (ref: samplers/random_sampler_prior.py:9) — same sampling
    behavior in its final state; kept as a registered alias for config
    compatibility."""


@BBOX_SAMPLERS.register_module()
class PseudoSampler:
    """Select everything (ref: samplers/pseudo_sampler.py): positives are
    assigned>0, negatives assigned==0, no subsampling."""

    def __init__(self, **kwargs):
        pass

    def sample(self, key, assigned_gt_inds):
        n = assigned_gt_inds.shape[0]
        inds = jnp.arange(n, dtype=jnp.int32)
        return dict(inds=inds, is_pos=assigned_gt_inds > 0,
                    valid=assigned_gt_inds >= 0)
