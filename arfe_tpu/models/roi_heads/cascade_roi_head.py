"""Cascade RoI head (ref: mmdet/models/roi_heads/cascade_roi_head.py:14-460):
multi-stage refinement with per-stage assigners/samplers at increasing IoU
thresholds; test-time ensemble averages stage classification logits before
the final decode+NMS.

Static-shape notes: refinement keeps the fixed sampled-roi capacity between
stages; gt rows injected by add_gt_as_proposals are tracked with an
``is_gt`` mask and excluded from refinement (ref: bbox_head.refine_bboxes
excludes gt inds, bbox_head.py:245-323).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ...registry import (BBOX_ASSIGNERS, BBOX_SAMPLERS, HEADS,
                         build_from_cfg)
from ..builder import build_head, build_roi_extractor
from ..layers import Module, take_rows


@HEADS.register_module()
class CascadeRoIHead(Module):
    def __init__(self, num_stages, stage_loss_weights, bbox_roi_extractor=None,
                 bbox_head=None, mask_roi_extractor=None, mask_head=None,
                 shared_head=None, train_cfg=None, test_cfg=None):
        assert shared_head is None
        self.num_stages = num_stages
        self.stage_loss_weights = list(stage_loss_weights)
        if not isinstance(bbox_roi_extractor, list):
            bbox_roi_extractor = [bbox_roi_extractor] * num_stages
        if not isinstance(bbox_head, list):
            bbox_head = [bbox_head] * num_stages
        self.bbox_roi_extractor = [build_roi_extractor(c)
                                   for c in bbox_roi_extractor]
        self.bbox_head = [build_head(dict(c)) for c in bbox_head]
        self.with_mask = mask_head is not None
        if self.with_mask:
            if mask_roi_extractor is not None:
                if not isinstance(mask_roi_extractor, list):
                    mask_roi_extractor = [mask_roi_extractor] * num_stages
                self.mask_roi_extractor = [build_roi_extractor(c)
                                           for c in mask_roi_extractor]
            else:
                self.mask_roi_extractor = self.bbox_roi_extractor
            if not isinstance(mask_head, list):
                mask_head = [mask_head] * num_stages
            self.mask_head = [build_head(dict(c)) for c in mask_head]
        self.train_cfg = train_cfg
        self.test_cfg = test_cfg
        if train_cfg is not None:
            stages = train_cfg if isinstance(train_cfg, list) else \
                [train_cfg] * num_stages
            self.stage_cfgs = stages
            self.assigners = [build_from_cfg(c['assigner'], BBOX_ASSIGNERS)
                              for c in stages]
            self.samplers = [build_from_cfg(c['sampler'], BBOX_SAMPLERS)
                             for c in stages]

    def init(self, key):
        keys = jax.random.split(key, 2 * self.num_stages)
        p = {'bbox_head': {str(i): h.init(keys[i])
                           for i, h in enumerate(self.bbox_head)}}
        if self.with_mask:
            p['mask_head'] = {
                str(i): h.init(keys[self.num_stages + i])
                for i, h in enumerate(self.mask_head)}
        return p

    # ------------------------------------------------------------------
    def _bbox_forward(self, params, stage, feats, rois):
        extractor = self.bbox_roi_extractor[stage]
        bbox_feats = extractor({}, feats[:extractor.num_inputs], rois)
        head = self.bbox_head[stage]
        cls_score, bbox_pred = head(params['bbox_head'][str(stage)],
                                    bbox_feats)
        return cls_score, bbox_pred

    def _assign_sample_stage(self, stage, key, boxes, box_valid, gt_bboxes,
                             gt_valid, gt_labels, add_gt):
        if add_gt:
            boxes = jnp.concatenate([gt_bboxes, boxes], axis=0)
            box_valid = jnp.concatenate([gt_valid, box_valid], axis=0)
            is_gt_cand = jnp.concatenate(
                [jnp.ones(gt_bboxes.shape[0], bool),
                 jnp.zeros(boxes.shape[0] - gt_bboxes.shape[0], bool)])
        else:
            is_gt_cand = jnp.zeros(boxes.shape[0], bool)
        assign = self.assigners[stage].assign(boxes, gt_bboxes, gt_valid,
                                              gt_labels,
                                              box_valid=box_valid)
        sample = self.samplers[stage].sample(key, assign['assigned_gt_inds'])
        inds = sample['inds']
        assigned = assign['assigned_gt_inds'][inds]
        safe_gt = jnp.clip(assigned - 1, 0, gt_bboxes.shape[0] - 1)
        return dict(boxes=boxes[inds], gt_boxes=take_rows(gt_bboxes, safe_gt),
                    gt_inds=safe_gt,
                    labels=take_rows(gt_labels.astype(jnp.int32), safe_gt),
                    is_pos=sample['is_pos'], valid=sample['valid'],
                    is_gt=is_gt_cand[inds])

    def forward_train(self, params, feats, proposals, prop_valid, gt_bboxes,
                      gt_valid, gt_labels, key, gt_mask_crops=None,
                      img_shapes=None):
        """(ref: cascade_roi_head.py:192-283)."""
        b = proposals.shape[0]
        losses = {}
        cur_boxes = proposals[..., :4]
        cur_valid = prop_valid
        for stage in range(self.num_stages):
            key, sub = jax.random.split(key)
            keys = jax.random.split(sub, b)
            add_gt = self.samplers[stage].add_gt_as_proposals

            def sample_one(k, bx, bv, gb, gv, gl):
                return self._assign_sample_stage(stage, k, bx, bv, gb, gv,
                                                 gl, add_gt)

            sampled = jax.vmap(sample_one)(keys, cur_boxes, cur_valid,
                                           gt_bboxes, gt_valid, gt_labels)
            s = sampled['boxes'].shape[1]
            batch_inds = jnp.broadcast_to(
                jnp.arange(b, dtype=jnp.float32)[:, None], (b, s))
            rois = jnp.concatenate([batch_inds[..., None],
                                    sampled['boxes']], axis=-1
                                   ).reshape(b * s, 5)
            cls_score, bbox_pred = self._bbox_forward(params, stage, feats,
                                                      rois)
            head = self.bbox_head[stage]
            pos_weight = self.stage_cfgs[stage].get('pos_weight', -1)

            def tgt(boxes, gts, labels, is_pos, valid):
                return head.get_targets(boxes, gts, labels, is_pos, valid,
                                        pos_weight)

            labels, lw, bt, bw = jax.vmap(tgt)(
                sampled['boxes'], sampled['gt_boxes'], sampled['labels'],
                sampled['is_pos'], sampled['valid'])
            stage_losses = head.loss(cls_score, bbox_pred,
                                     labels.reshape(-1), lw.reshape(-1),
                                     bt.reshape(-1, 4), bw.reshape(-1, 4))
            w = self.stage_loss_weights[stage]
            for name, value in stage_losses.items():
                losses[f's{stage}.{name}'] = value * w if 'loss' in name \
                    else value
            if self.with_mask and gt_mask_crops is not None:
                from ...core.mask.mask_target import mask_target_from_crops
                extractor = self.mask_roi_extractor[stage]
                # positives-only mask branch: the sampler packs positives
                # into the leading slots (see StandardRoIHead)
                smp = self.samplers[stage]
                cap = s
                if hasattr(smp, 'num') and hasattr(smp, 'pos_fraction'):
                    cap = min(s, int(smp.num * smp.pos_fraction))
                rois_m = rois.reshape(b, s, 5)[:, :cap].reshape(b * cap, 5)
                mask_feats = extractor({}, feats[:extractor.num_inputs],
                                       rois_m)
                mask_pred = self.mask_head[stage](
                    params['mask_head'][str(stage)], mask_feats)
                m = mask_pred.shape[1]

                def mtgt(crops, gt_inds, gt_bx, bx):
                    return mask_target_from_crops(take_rows(crops, gt_inds),
                                                  gt_bx, bx,
                                                  mask_size=m)

                targets = jax.vmap(mtgt)(gt_mask_crops,
                                         sampled['gt_inds'][:, :cap],
                                         sampled['gt_boxes'][:, :cap],
                                         sampled['boxes'][:, :cap])
                pos = (sampled['is_pos'][:, :cap]
                       & sampled['valid'][:, :cap]).reshape(b * cap)
                ml = self.mask_head[stage].loss(
                    mask_pred, targets.reshape(b * cap, m, m),
                    sampled['labels'][:, :cap].reshape(b * cap), pos)
                losses[f's{stage}.loss_mask'] = ml['loss_mask'] * w
            # refine proposals for the next stage (gradients stopped,
            # gt-injected rows dropped — ref refine_bboxes semantics)
            if stage < self.num_stages - 1:
                cls3 = jax.lax.stop_gradient(cls_score.reshape(b, s, -1))
                bp3 = jax.lax.stop_gradient(bbox_pred.reshape(b, s, -1))
                if img_shapes is not None:
                    cur_boxes = jax.vmap(head.decoded_boxes_for_refine)(
                        sampled['boxes'], cls3, bp3, img_shapes)
                else:
                    cur_boxes = jax.vmap(
                        lambda bx, c, r: head.decoded_boxes_for_refine(
                            bx, c, r, None))(sampled['boxes'], cls3, bp3)
                cur_valid = sampled['valid'] & ~sampled['is_gt']
        return losses

    # ------------------------------------------------------------------
    def simple_test(self, params, feats, proposals, prop_valid, img_shapes,
                    scale_factors, rescale=False):
        """(ref: cascade_roi_head.py:285-350). Average stage logits, decode
        with the last stage's regression."""
        cfg = self.test_cfg
        b, p, _ = proposals.shape
        boxes = proposals[..., :4]
        ms_scores = []
        cls_score = bbox_pred = None
        for stage in range(self.num_stages):
            batch_inds = jnp.broadcast_to(
                jnp.arange(b, dtype=jnp.float32)[:, None], (b, p))
            rois = jnp.concatenate([batch_inds[..., None], boxes],
                                   axis=-1).reshape(b * p, 5)
            cls_score, bbox_pred = self._bbox_forward(params, stage, feats,
                                                      rois)
            cls_score = cls_score.reshape(b, p, -1)
            bbox_pred = bbox_pred.reshape(b, p, -1)
            ms_scores.append(cls_score)
            if stage < self.num_stages - 1:
                head = self.bbox_head[stage]
                boxes = jax.vmap(
                    lambda bx, cs_, bp_, sh: head.decoded_boxes_for_refine(
                        bx, cs_, bp_, sh))(boxes, cls_score, bbox_pred,
                                           img_shapes)
        avg_score = sum(ms_scores) / self.num_stages
        head = self.bbox_head[-1]

        def _one(prop, cs, bp, shape, sf, vm):
            return head.get_bboxes(prop, cs, bp, shape, sf,
                                   rescale=rescale, cfg=cfg, valid_mask=vm)

        return jax.vmap(_one)(boxes, avg_score, bbox_pred, img_shapes,
                              scale_factors, prop_valid)
