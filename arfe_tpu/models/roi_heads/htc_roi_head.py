"""Hybrid Task Cascade RoI head (ref:
mmdet/models/roi_heads/htc_roi_head.py:11-498).

Cascade with (a) an optional fused semantic branch whose pooled embedding is
added to bbox/mask RoI features, (b) interleaved execution (mask branch
trains on the bbox branch's refined + re-sampled proposals), and (c) mask
information flow (each stage's mask head consumes the previous stages'
mask features through a 1x1 conv_res chain).

Static-shape port: per-stage re-assignment/sampling keeps the fixed S-slot
layout; semantic seg training is optional (gt_semantic_seg=None skips the
seg loss, since the COCO-stuff maps need the with_seg pipeline).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ...layers import take_rows
from ...registry import HEADS
from ..builder import build_head, build_roi_extractor
from .cascade_roi_head import CascadeRoIHead


def _adaptive_avg_to(x, size):
    """NHWC mean-pool to a smaller (h, w) that divides the input."""
    n, h, w, c = x.shape
    oh, ow = size
    if (h, w) == (oh, ow):
        return x
    assert h % oh == 0 and w % ow == 0, (h, w, oh, ow)
    return x.reshape(n, oh, h // oh, ow, w // ow, c).mean(axis=(2, 4))


@HEADS.register_module()
class HybridTaskCascadeRoIHead(CascadeRoIHead):
    def __init__(self, num_stages, stage_loss_weights,
                 semantic_roi_extractor=None, semantic_head=None,
                 semantic_fusion=('bbox', 'mask'), interleaved=True,
                 mask_info_flow=True, **kwargs):
        super().__init__(num_stages, stage_loss_weights, **kwargs)
        self.with_semantic = semantic_head is not None
        if self.with_semantic:
            self.semantic_roi_extractor = build_roi_extractor(
                semantic_roi_extractor)
            self.semantic_head = build_head(semantic_head)
        self.semantic_fusion = tuple(semantic_fusion)
        self.interleaved = interleaved
        self.mask_info_flow = mask_info_flow

    def init(self, key):
        k1, k2 = jax.random.split(key)
        p = super().init(k1)
        if self.with_semantic:
            p['semantic_head'] = self.semantic_head.init(k2)
        return p

    # ------------------------------------------------------------------
    def _semantic(self, params, feats):
        if not self.with_semantic:
            return None, None
        return self.semantic_head(params['semantic_head'], feats)

    def _pool_semantic(self, semantic_feat, rois, target_hw):
        sem = self.semantic_roi_extractor({}, [semantic_feat], rois)
        return _adaptive_avg_to(sem, target_hw)

    def _bbox_forward(self, params, stage, feats, rois, semantic_feat=None):
        """(ref: htc_roi_head.py:155-170)."""
        extractor = self.bbox_roi_extractor[stage]
        bbox_feats = extractor({}, feats[:extractor.num_inputs], rois)
        if semantic_feat is not None and 'bbox' in self.semantic_fusion:
            bbox_feats = bbox_feats + self._pool_semantic(
                semantic_feat, rois, bbox_feats.shape[1:3])
        head = self.bbox_head[stage]
        cls_score, bbox_pred = head(params['bbox_head'][str(stage)],
                                    bbox_feats)
        return cls_score, bbox_pred

    def _mask_feats(self, params, stage, feats, rois, semantic_feat):
        extractor = self.mask_roi_extractor[stage]
        mask_feats = extractor({}, feats[:extractor.num_inputs], rois)
        if semantic_feat is not None and 'mask' in self.semantic_fusion:
            mask_feats = mask_feats + self._pool_semantic(
                semantic_feat, rois, mask_feats.shape[1:3])
        return mask_feats

    def _mask_pred_train(self, params, stage, mask_feats):
        """Mask information flow at train time
        (ref: htc_roi_head.py:135-145)."""
        if self.mask_info_flow:
            last_feat = None
            for i in range(stage):
                last_feat = self.mask_head[i](
                    params['mask_head'][str(i)], mask_feats, last_feat,
                    return_logits=False)
            return self.mask_head[stage](params['mask_head'][str(stage)],
                                         mask_feats, last_feat,
                                         return_feat=False)
        return self.mask_head[stage](params['mask_head'][str(stage)],
                                     mask_feats, return_feat=False)

    # ------------------------------------------------------------------
    def forward_train(self, params, feats, proposals, prop_valid, gt_bboxes,
                      gt_valid, gt_labels, key, gt_mask_crops=None,
                      img_shapes=None, gt_semantic_seg=None):
        """(ref: htc_roi_head.py:200-295)."""
        from ...core.mask.mask_target import mask_target_from_crops

        b = proposals.shape[0]
        losses = {}
        semantic_pred, semantic_feat = self._semantic(params, feats)
        if self.with_semantic and gt_semantic_seg is not None:
            losses['loss_semantic_seg'] = self.semantic_head.loss(
                semantic_pred, gt_semantic_seg)

        cur_boxes = proposals[..., :4]
        cur_valid = prop_valid
        for stage in range(self.num_stages):
            key, k_bbox, k_mask = jax.random.split(key, 3)
            add_gt = self.samplers[stage].add_gt_as_proposals
            w = self.stage_loss_weights[stage]
            head = self.bbox_head[stage]
            pos_weight = self.stage_cfgs[stage].get('pos_weight', -1)

            def sample_one(k, bx, bv, gb, gv, gl):
                return self._assign_sample_stage(stage, k, bx, bv, gb, gv,
                                                 gl, add_gt)

            sampled = jax.vmap(sample_one)(
                jax.random.split(k_bbox, b), cur_boxes, cur_valid, gt_bboxes,
                gt_valid, gt_labels)
            s = sampled['boxes'].shape[1]
            binds = jnp.broadcast_to(
                jnp.arange(b, dtype=jnp.float32)[:, None], (b, s))
            rois = jnp.concatenate([binds[..., None], sampled['boxes']],
                                   axis=-1).reshape(b * s, 5)
            cls_score, bbox_pred = self._bbox_forward(
                params, stage, feats, rois, semantic_feat)

            def tgt(boxes, gts, labels, is_pos, valid):
                return head.get_targets(boxes, gts, labels, is_pos, valid,
                                        pos_weight)

            labels, lw, bt, bw = jax.vmap(tgt)(
                sampled['boxes'], sampled['gt_boxes'], sampled['labels'],
                sampled['is_pos'], sampled['valid'])
            stage_losses = head.loss(cls_score, bbox_pred, labels.reshape(-1),
                                     lw.reshape(-1), bt.reshape(-1, 4),
                                     bw.reshape(-1, 4))
            for name, value in stage_losses.items():
                losses[f's{stage}.{name}'] = value * w if 'loss' in name \
                    else value

            # interleaved: refine + re-sample BEFORE the mask branch
            # (ref :258-279)
            refined = None
            if stage < self.num_stages - 1 or self.interleaved:
                cls3 = jax.lax.stop_gradient(cls_score.reshape(b, s, -1))
                bp3 = jax.lax.stop_gradient(bbox_pred.reshape(b, s, -1))
                refined = jax.vmap(
                    lambda bx, c, r, sh: head.decoded_boxes_for_refine(
                        bx, c, r, sh))(
                    sampled['boxes'], cls3, bp3,
                    img_shapes if img_shapes is not None
                    else jnp.full((b, 2), 1e8, jnp.float32))
                refined_valid = sampled['valid'] & ~sampled['is_gt']

            mask_sampled = sampled
            if self.with_mask and self.interleaved:
                mask_sampled = jax.vmap(sample_one)(
                    jax.random.split(k_mask, b), refined, refined_valid,
                    gt_bboxes, gt_valid, gt_labels)

            if self.with_mask and gt_mask_crops is not None:
                ms = mask_sampled['boxes'].shape[1]
                smp = self.samplers[stage]
                if hasattr(smp, 'num') and hasattr(smp, 'pos_fraction'):
                    # positives-only mask branch (see StandardRoIHead)
                    cap = min(ms, int(smp.num * smp.pos_fraction))
                    mask_sampled = {
                        k: (v[:, :cap] if v.ndim >= 2 and v.shape[1] == ms
                            else v) for k, v in mask_sampled.items()}
                    ms = cap
                mbinds = jnp.broadcast_to(
                    jnp.arange(b, dtype=jnp.float32)[:, None], (b, ms))
                mrois = jnp.concatenate(
                    [mbinds[..., None], mask_sampled['boxes']],
                    axis=-1).reshape(b * ms, 5)
                mask_feats = self._mask_feats(params, stage, feats, mrois,
                                              semantic_feat)
                mask_pred = self._mask_pred_train(params, stage, mask_feats)
                m = mask_pred.shape[1]

                def mtgt(crops, gt_inds, gt_bx, bx):
                    return mask_target_from_crops(take_rows(crops, gt_inds),
                                                  gt_bx, bx,
                                                  mask_size=m)

                targets = jax.vmap(mtgt)(
                    gt_mask_crops, mask_sampled['gt_inds'],
                    mask_sampled['gt_boxes'], mask_sampled['boxes'])
                pos = (mask_sampled['is_pos']
                       & mask_sampled['valid']).reshape(b * ms)
                ml = self.mask_head[stage].loss(
                    mask_pred, targets.reshape(b * ms, m, m),
                    mask_sampled['labels'].reshape(b * ms), pos)
                losses[f's{stage}.loss_mask'] = ml['loss_mask'] * w

            if stage < self.num_stages - 1:
                cur_boxes = refined
                cur_valid = refined_valid
        return losses

    # ------------------------------------------------------------------
    def simple_test(self, params, feats, proposals, prop_valid, img_shapes,
                    scale_factors, rescale=False):
        """(ref: htc_roi_head.py:297-377): stage-ensembled cls scores; mask
        preds averaged over stages (sigmoid space) with info flow."""
        _, semantic_feat = self._semantic(params, feats)
        cfg = self.test_cfg
        b, p, _ = proposals.shape
        boxes = proposals[..., :4]
        ms_scores = []
        cls_score = bbox_pred = None
        for stage in range(self.num_stages):
            binds = jnp.broadcast_to(
                jnp.arange(b, dtype=jnp.float32)[:, None], (b, p))
            rois = jnp.concatenate([binds[..., None], boxes],
                                   axis=-1).reshape(b * p, 5)
            cls_score, bbox_pred = self._bbox_forward(params, stage, feats,
                                                      rois, semantic_feat)
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
            return head.get_bboxes(prop, cs, bp, shape, sf, rescale=rescale,
                                   cfg=cfg, valid_mask=vm)

        dets, labels, valid = jax.vmap(_one)(boxes, avg_score, bbox_pred,
                                             img_shapes, scale_factors,
                                             prop_valid)
        if not self.with_mask:
            return dets, labels, valid

        n = dets.shape[1]
        det_boxes = dets[..., :4]
        if rescale:
            det_boxes = det_boxes * scale_factors[:, None, :4]
        binds = jnp.broadcast_to(
            jnp.arange(b, dtype=det_boxes.dtype)[:, None], (b, n))
        mrois = jnp.concatenate([binds[..., None], det_boxes],
                                axis=-1).reshape(b * n, 5)
        mask_feats = self._mask_feats(params, self.num_stages - 1, feats,
                                      mrois, semantic_feat)
        probs = 0.0
        last_feat = None
        for i in range(self.num_stages):
            if self.mask_info_flow:
                mask_pred, last_feat = self.mask_head[i](
                    params['mask_head'][str(i)], mask_feats, last_feat)
            else:
                mask_pred = self.mask_head[i](params['mask_head'][str(i)],
                                              mask_feats)
            probs = probs + jax.nn.sigmoid(mask_pred.astype(jnp.float32))
        probs = probs / self.num_stages
        mh, mw = probs.shape[1:3]
        probs = probs.reshape(b, n, mh, mw, -1)
        cls_mask = jnp.take_along_axis(
            probs, labels[:, :, None, None, None], axis=-1)[..., 0]
        # NOTE: probabilities (stage-averaged), unlike FCN simple_test's
        # logits; the host pipeline detects HTC via with_mask_probs
        return dets, labels, valid, cls_mask

    with_mask_probs = True
