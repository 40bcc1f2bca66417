"""Standard RoI head (ref:
mmdet/models/roi_heads/standard_roi_head.py:1-313 and test mixins
roi_heads/test_mixins.py:52-71).

Inference path only in this module's first milestone; training (assign /
sample / loss) attaches in the train step. All shapes static: proposals come
in as (B, P, 5) with a validity mask.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ...registry import (BBOX_ASSIGNERS, BBOX_SAMPLERS, HEADS,
                         build_from_cfg)
from ..builder import build_head, build_roi_extractor
from ..layers import Module, take_rows


@HEADS.register_module()
class StandardRoIHead(Module):
    def __init__(self, bbox_roi_extractor=None, bbox_head=None,
                 mask_roi_extractor=None, mask_head=None, shared_head=None,
                 multi_rois=None, adaptive_scale_fac=1.0, train_cfg=None,
                 test_cfg=None):
        """``multi_rois``: enable AR-RFF triple RoI extraction (original +
        adaptively stretched, concatenated channel-wise). Defaults to True
        when the bbox head declares ``num_roi_groups == 3`` (MultiBBoxHead
        family) — the composable equivalent of the reference's
        comment-toggled extraction (ref: standard_roi_head.py:137-157)."""
        self.with_shared_head = shared_head is not None
        if self.with_shared_head:
            self.shared_head = build_head(shared_head)
        self.with_bbox = bbox_head is not None
        self.with_mask = mask_head is not None
        if self.with_bbox:
            self.bbox_roi_extractor = build_roi_extractor(bbox_roi_extractor)
            self.bbox_head = build_head(bbox_head)
        if multi_rois is None:
            multi_rois = getattr(self.bbox_head, 'num_roi_groups', 1) == 3 \
                if self.with_bbox else False
        self.multi_rois = multi_rois
        self.adaptive_scale_fac = adaptive_scale_fac
        self.with_multi_cls = getattr(self.bbox_head, 'with_multi_cls',
                                      False) if self.with_bbox else False
        if self.with_mask:
            if mask_roi_extractor is not None:
                self.mask_roi_extractor = build_roi_extractor(
                    mask_roi_extractor)
                self.share_roi_extractor = False
            else:
                self.mask_roi_extractor = self.bbox_roi_extractor
                self.share_roi_extractor = True
            self.mask_head = build_head(mask_head)
        self.train_cfg = train_cfg
        self.test_cfg = test_cfg
        if train_cfg is not None:
            self.assigner = build_from_cfg(train_cfg['assigner'],
                                           BBOX_ASSIGNERS)
            # some research configs (faster_fsaf) omit the sampler; fall
            # back to taking assignments as-is
            self.sampler = build_from_cfg(
                train_cfg.get('sampler', dict(type='PseudoSampler')),
                BBOX_SAMPLERS)

    def init(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        p = {}
        if self.with_bbox:
            p['bbox_head'] = self.bbox_head.init(k1)
        if self.with_mask:
            p['mask_head'] = self.mask_head.init(k2)
        if self.with_shared_head:
            p['shared_head'] = self.shared_head.init(k3)
        return p

    # ------------------------------------------------------------------
    # training (ref: standard_roi_head.py:64-223)
    # ------------------------------------------------------------------

    def _assign_single(self, proposals, prop_valid, gt_bboxes, gt_valid,
                       gt_labels):
        """Per-image assignment over the candidate set (gt-prepended when
        add_gt_as_proposals). Returns (boxes, assigned, max_overlaps)."""
        if self.sampler.add_gt_as_proposals:
            boxes = jnp.concatenate([gt_bboxes, proposals[:, :4]], axis=0)
            box_valid = jnp.concatenate([gt_valid, prop_valid], axis=0)
        else:
            boxes = proposals[:, :4]
            box_valid = prop_valid
        assign = self.assigner.assign(boxes, gt_bboxes, gt_valid,
                                      gt_labels, box_valid=box_valid)
        mo = assign.get('max_overlaps')
        if mo is None:
            mo = jnp.zeros(boxes.shape[:1], jnp.float32)
        return boxes, assign['assigned_gt_inds'], mo

    def _sample_single(self, key, boxes, assigned, max_overlaps, hard_scores,
                       gt_bboxes, gt_labels):
        """Per-image sampling into S fixed slots
        (ref: standard_roi_head.py:104-114)."""
        sample = self.sampler.sample(
            key, assigned, max_overlaps=max_overlaps,
            hard_scores=hard_scores, num_gts=gt_bboxes.shape[0])
        inds = sample['inds']
        assigned_s = assigned[inds]
        safe_gt = jnp.clip(assigned_s - 1, 0, gt_bboxes.shape[0] - 1)
        return dict(
            boxes=boxes[inds],
            gt_boxes=take_rows(gt_bboxes, safe_gt),
            gt_inds=safe_gt,
            labels=take_rows(gt_labels.astype(jnp.int32), safe_gt),
            is_pos=sample['is_pos'],
            valid=sample['valid'],
        )

    def _assign_sample_single(self, key, proposals, prop_valid, gt_bboxes,
                              gt_valid, gt_labels):
        """Per-image assign + sample (kept for simple samplers)."""
        boxes, assigned, mo = self._assign_single(proposals, prop_valid,
                                                  gt_bboxes, gt_valid,
                                                  gt_labels)
        return self._sample_single(key, boxes, assigned, mo, None,
                                   gt_bboxes, gt_labels)

    def _candidate_hard_scores(self, params, feats, boxes, assigned,
                               gt_labels):
        """OHEM hard-mining scores: per-candidate stop-gradient cls loss
        (ref: samplers/ohem_sampler.py:34-50 hard_mining)."""
        b, n = boxes.shape[:2]
        binds = jnp.broadcast_to(
            jnp.arange(b, dtype=jnp.float32)[:, None], (b, n))
        rois = jnp.concatenate([binds[..., None], boxes],
                               axis=-1).reshape(b * n, 5)
        out = self._bbox_forward(params, feats, rois, num_imgs=b)
        cls_score = jax.lax.stop_gradient(out[0]).reshape(b, n, -1)
        nc = self.bbox_head.num_classes
        safe = jnp.clip(assigned - 1, 0, gt_labels.shape[1] - 1)
        labels = jnp.where(assigned > 0,
                           jnp.take_along_axis(gt_labels, safe, axis=1), nc)
        loss = self.bbox_head.loss_cls(
            cls_score.reshape(b * n, -1), labels.reshape(b * n),
            reduction_override='none')
        return loss.reshape(b, n)

    def _sample_for_train(self, params, feats, proposals, prop_valid,
                          gt_bboxes, gt_valid, gt_labels, key):
        """Batched assign+sample; exposed for subclass heads (grid/PISA)."""
        b = proposals.shape[0]
        keys = jax.random.split(key, b)
        if getattr(self.sampler, 'needs_hard_scores', False):
            boxes_all, assigned_all, mo_all = jax.vmap(self._assign_single)(
                proposals, prop_valid, gt_bboxes, gt_valid, gt_labels)
            hard = self._candidate_hard_scores(params, feats, boxes_all,
                                               assigned_all, gt_labels)
            sampled = jax.vmap(self._sample_single)(
                keys, boxes_all, assigned_all, mo_all, hard, gt_bboxes,
                gt_labels)
        else:
            sampled = jax.vmap(self._assign_sample_single)(
                keys, proposals, prop_valid, gt_bboxes, gt_valid, gt_labels)
        return sampled

    def forward_train(self, params, feats, proposals, prop_valid, gt_bboxes,
                      gt_valid, gt_labels, key, gt_mask_crops=None,
                      img_shapes=None):
        """Batched RoI training step (ref: standard_roi_head.py:64-133,
        172-187).

        Args:
            proposals: (B, P, 5); prop_valid (B, P).
            gt_bboxes: (B, G, 4); gt_valid (B, G); gt_labels (B, G).
        Returns:
            dict of losses.
        """
        b = proposals.shape[0]
        sampled = self._sample_for_train(params, feats, proposals,
                                         prop_valid, gt_bboxes, gt_valid,
                                         gt_labels, key)
        s = sampled['boxes'].shape[1]
        batch_inds = jnp.broadcast_to(
            jnp.arange(b, dtype=jnp.float32)[:, None], (b, s))
        rois = jnp.concatenate(
            [batch_inds[..., None], sampled['boxes']], axis=-1
        ).reshape(b * s, 5)
        out = self._bbox_forward(params, feats, rois, num_imgs=b)
        cls_score, bbox_pred = out[0], out[1]
        multi_cls = out[3] if self.with_multi_cls else None

        pos_weight = self.train_cfg.get('pos_weight', -1) \
            if self.train_cfg else -1

        def tgt(boxes, gts, labels, is_pos, valid):
            return self.bbox_head.get_targets(boxes, gts, labels, is_pos,
                                              valid, pos_weight)

        labels, label_weights, bbox_targets, bbox_weights = jax.vmap(tgt)(
            sampled['boxes'], sampled['gt_boxes'], sampled['labels'],
            sampled['is_pos'], sampled['valid'])
        loss_kw = {}
        if self.with_multi_cls:
            # per-image class-presence multi-hot from the sampled labels
            # (includes the bg index — ref ori[labels]=1 semantics,
            # cross_entropy_loss.py:74-80)
            c1 = self.bbox_head.num_classes + 1
            onehot = jax.nn.one_hot(labels, c1, dtype=jnp.float32)
            presence = ((onehot * label_weights[..., None]).sum(axis=1)
                        > 0).astype(jnp.int32)
            loss_kw = dict(multi_cls=multi_cls, presence=presence)
        losses = self.bbox_head.loss(
            cls_score, bbox_pred, labels.reshape(-1),
            label_weights.reshape(-1), bbox_targets.reshape(-1, 4),
            bbox_weights.reshape(-1, 4), **loss_kw)
        if self.with_mask:
            losses.update(self._mask_forward_train(
                params, feats, rois, sampled, gt_mask_crops))
        return losses

    def _mask_forward_train(self, params, feats, rois, sampled,
                            gt_mask_crops):
        """Mask branch training (ref: standard_roi_head.py:189-223). Targets
        come from fixed-size gt mask crops resampled per sampled RoI
        (core/mask/mask_target.py) — static-shape equivalent of the
        reference's per-roi CPU rasterization."""
        from ...core.mask.mask_target import mask_target_from_crops

        assert gt_mask_crops is not None, \
            'mask training requires gt_mask_crops in the batch'
        b, s = sampled['boxes'].shape[:2]
        # the reference trains the mask branch on POSITIVE rois only
        # (ref: standard_roi_head.py:196-205 pos_rois); the sampler packs
        # selected positives into the leading slots (samplers.py top_k on
        # 2.0/1.0 scores), so the first num*pos_fraction slots statically
        # contain every positive — extract/deconv only those (4x less
        # mask-branch work at pos_fraction=0.25)
        cap = s
        if hasattr(self.sampler, 'num') and hasattr(self.sampler,
                                                    'pos_fraction'):
            cap = min(s, int(self.sampler.num * self.sampler.pos_fraction))
        rois_m = rois.reshape(b, s, 5)[:, :cap].reshape(b * cap, 5)
        mask_feats = self.mask_roi_extractor(
            {}, feats[:self.mask_roi_extractor.num_inputs], rois_m)
        if self.with_shared_head:
            mask_feats = self.shared_head(params['shared_head'], mask_feats)
        mask_pred = self.mask_head(params['mask_head'], mask_feats)
        m = mask_pred.shape[1]

        def tgt_one(crops, gt_inds, gt_boxes, boxes):
            return mask_target_from_crops(take_rows(crops, gt_inds),
                                          gt_boxes, boxes, mask_size=m)

        targets = jax.vmap(tgt_one)(gt_mask_crops,
                                    sampled['gt_inds'][:, :cap],
                                    sampled['gt_boxes'][:, :cap],
                                    sampled['boxes'][:, :cap])
        labels = sampled['labels'][:, :cap].reshape(b * cap)
        pos = (sampled['is_pos'][:, :cap]
               & sampled['valid'][:, :cap]).reshape(b * cap)
        return self.mask_head.loss(mask_pred,
                                   targets.reshape(b * cap, m, m),
                                   labels, pos)

    # ------------------------------------------------------------------
    def _bbox_forward(self, params, feats, rois, num_imgs=1, **extract_kw):
        """Extract roi feats + run bbox head
        (ref: standard_roi_head.py:135-170). With ``multi_rois``, extract at
        original + adaptively stretched boxes and concat channel-wise (the
        AR-RFF path, ref docstring block :137-157, channel order
        [ori, lw, lh])."""
        from ..utils.additional import get_adaptive_scale_rois

        extractor = self.bbox_roi_extractor
        lvl_feats = feats[:extractor.num_inputs]
        if self.multi_rois:
            lh_rois, lw_rois = get_adaptive_scale_rois(
                rois, self.adaptive_scale_fac)
            # one batched extraction (vs 3 separate gather graphs): the
            # packed-table gather is roi-count agnostic, so stacking the
            # three roi sets compiles one kernel and splits after
            all_rois = jnp.concatenate([rois, lw_rois, lh_rois], axis=0)
            all_feats = extractor({}, lvl_feats, all_rois, **extract_kw)
            r = rois.shape[0]
            bbox_feats = jnp.concatenate(
                [all_feats[:r], all_feats[r:2 * r], all_feats[2 * r:]],
                axis=-1)
        else:
            bbox_feats = extractor({}, lvl_feats, rois, **extract_kw)
        if self.with_shared_head:
            bbox_feats = self.shared_head(params['shared_head'], bbox_feats)
        if self.with_multi_cls:
            cls_score, bbox_pred, multi_cls = self.bbox_head(
                params['bbox_head'], bbox_feats, num_imgs=num_imgs)
            return cls_score, bbox_pred, bbox_feats, multi_cls
        cls_score, bbox_pred = self.bbox_head(params['bbox_head'], bbox_feats)
        return cls_score, bbox_pred, bbox_feats

    def simple_test_bboxes(self, params, feats, proposals, proposal_valid,
                           img_shapes, scale_factors, rescale=False,
                           cfg=None):
        """Batched bbox branch inference (ref: test_mixins.py:52-71).

        Args:
            proposals: (B, P, 5) [x1,y1,x2,y2,score] with padding.
            proposal_valid: (B, P) bool.
        Returns:
            dets (B, max_per_img, 5), labels, valid.
        """
        cfg = self.test_cfg if cfg is None else cfg
        b, p, _ = proposals.shape
        batch_inds = jnp.broadcast_to(
            jnp.arange(b, dtype=proposals.dtype)[:, None], (b, p))
        rois = jnp.concatenate(
            [batch_inds[..., None], proposals[..., :4]], axis=-1
        ).reshape(b * p, 5)
        out = self._bbox_forward(params, feats, rois, num_imgs=b)
        cls_score, bbox_pred = out[0], out[1]
        cls_score = cls_score.reshape(b, p, -1)
        bbox_pred = bbox_pred.reshape(b, p, -1) \
            if bbox_pred is not None else None

        def _one(prop, cs, bp, shape, sf, vm):
            return self.bbox_head.get_bboxes(
                prop[:, :4], cs, bp, shape, sf, rescale=rescale, cfg=cfg,
                valid_mask=vm)

        return jax.vmap(_one)(proposals, cls_score, bbox_pred, img_shapes,
                              scale_factors, proposal_valid)

    def simple_test(self, params, feats, proposals, proposal_valid,
                    img_shapes, scale_factors, rescale=False):
        """(ref: standard_roi_head.py:266-285)."""
        out = self.simple_test_bboxes(params, feats, proposals,
                                      proposal_valid, img_shapes,
                                      scale_factors, rescale=rescale)
        if not self.with_mask:
            return out
        dets, labels, valid = out
        masks = self.simple_test_mask(params, feats, dets, labels, valid,
                                      img_shapes, scale_factors,
                                      rescale=rescale)
        return dets, labels, valid, masks

    def aug_test(self, params, aug_feats, merged_props, merged_valid,
                 aug_img_shapes, aug_scale_factors, aug_flips, rescale=True):
        """TTA bbox (+mask) path (ref: standard_roi_head.py:287-313,
        test_mixins.py:73-104 aug_test_bboxes / :175-207 aug_test_mask).

        The merged proposals live in the ORIGINAL image frame; per aug they
        are mapped into that aug's frame, scored, decoded, mapped back, then
        boxes/scores are averaged over augs before one final NMS.
        """
        from ...core.bbox.transforms import bbox_mapping
        from ...core.post.bbox_nms import multiclass_nms
        from ...core.post.merge_augs import merge_aug_bboxes, merge_aug_masks

        cfg = self.test_cfg
        b, p, _ = merged_props.shape
        batch_inds = jnp.broadcast_to(
            jnp.arange(b, dtype=merged_props.dtype)[:, None], (b, p))
        aug_bboxes, aug_scores = [], []
        for x, shapes, sfs, flip in zip(aug_feats, aug_img_shapes,
                                        aug_scale_factors, aug_flips):
            props_aug = jax.vmap(
                lambda bx, sh, sf: bbox_mapping(bx, sh, sf, flip))(
                merged_props[..., :4], shapes, sfs)
            rois = jnp.concatenate(
                [batch_inds[..., None], props_aug], -1).reshape(b * p, 5)
            out = self._bbox_forward(params, x, rois, num_imgs=b)
            cls_score = out[0].astype(jnp.float32).reshape(b, p, -1)
            bbox_pred = out[1].astype(jnp.float32).reshape(b, p, -1)
            scores = jax.nn.softmax(cls_score, axis=-1)
            boxes = jax.vmap(
                lambda r, bp, sh: self.bbox_head.bbox_coder.decode(
                    r, bp, max_shape=sh))(props_aug, bbox_pred, shapes)
            aug_bboxes.append(boxes)
            aug_scores.append(scores)
        boxes, scores = merge_aug_bboxes(aug_bboxes, aug_scores,
                                         aug_img_shapes, aug_scale_factors,
                                         aug_flips)

        def _one(bb, ss, vm):
            return multiclass_nms(bb, ss, cfg['score_thr'], cfg['nms'],
                                  cfg['max_per_img'],
                                  pre_nms_cap=cfg.get('nms_cap', 2000),
                                  valid_mask=vm)

        dets, labels, valid = jax.vmap(_one)(boxes, scores, merged_valid)
        if not rescale:
            dets = dets.at[..., :4].multiply(
                aug_scale_factors[0][:, None, :4])
        if not self.with_mask:
            return dets, labels, valid

        # masks: dets are original-frame; per aug map in, predict, sigmoid,
        # un-flip, average probabilities (ref: merge_aug_masks)
        n = dets.shape[1]
        det_boxes = dets[..., :4] if rescale else \
            dets[..., :4] / aug_scale_factors[0][:, None, :4]
        binds = jnp.broadcast_to(
            jnp.arange(b, dtype=det_boxes.dtype)[:, None], (b, n))
        aug_masks = []
        for x, shapes, sfs, flip in zip(aug_feats, aug_img_shapes,
                                        aug_scale_factors, aug_flips):
            boxes_aug = jax.vmap(
                lambda bx, sh, sf: bbox_mapping(bx, sh, sf, flip))(
                det_boxes, shapes, sfs)
            rois = jnp.concatenate(
                [binds[..., None], boxes_aug], -1).reshape(b * n, 5)
            mask_feats = self.mask_roi_extractor(
                {}, x[:self.mask_roi_extractor.num_inputs], rois)
            mask_pred = self.mask_head(params['mask_head'], mask_feats)
            mh, mw = mask_pred.shape[1:3]
            mask_pred = mask_pred.reshape(b, n, mh, mw, -1)
            cls_mask = jnp.take_along_axis(
                mask_pred, labels[:, :, None, None, None], axis=-1)[..., 0]
            aug_masks.append(jax.nn.sigmoid(cls_mask.astype(jnp.float32)))
        masks = merge_aug_masks(aug_masks, aug_flips)
        return dets, labels, valid, masks

    def simple_test_mask(self, params, feats, dets, labels, valid,
                         img_shapes, scale_factors, rescale=False):
        """Mask branch on final detections (ref: test_mixins.py:110-146).
        Returns per-detection mask logits at mask_head output resolution
        (B, max_per_img, mh, mw); pasting to image space happens host-side
        or in the seg postprocess op."""
        b, n, _ = dets.shape
        boxes = dets[..., :4]
        if rescale:
            # detections are in original-image scale; map back to input scale
            boxes = boxes * scale_factors[:, None, :4]
        batch_inds = jnp.broadcast_to(
            jnp.arange(b, dtype=boxes.dtype)[:, None], (b, n))
        rois = jnp.concatenate([batch_inds[..., None], boxes],
                               axis=-1).reshape(b * n, 5)
        mask_feats = self.mask_roi_extractor(
            {}, feats[:self.mask_roi_extractor.num_inputs], rois)
        if self.with_shared_head:
            mask_feats = self.shared_head(params['shared_head'], mask_feats)
        mask_pred = self.mask_head(params['mask_head'], mask_feats)
        mh, mw = mask_pred.shape[1:3]
        mask_pred = mask_pred.reshape(b, n, mh, mw, -1)
        # select the predicted class's mask
        flat_labels = labels.reshape(b, n)
        cls_mask = jnp.take_along_axis(
            mask_pred, flat_labels[:, :, None, None, None], axis=-1)
        return cls_mask[..., 0]


@HEADS.register_module()
class StandardRoIHeadPrior(StandardRoIHead):
    """ARFE variant with clean 2-output _bbox_forward and RandomSamplerPrior
    (ref: mmdet/models/roi_heads/standard_roi_head_prior.py:149-187); its
    final-state behavior matches StandardRoIHead, kept as a config alias."""
