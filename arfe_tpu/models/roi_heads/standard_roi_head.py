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

from ...registry import HEADS
from ..builder import build_head, build_roi_extractor
from ..layers import Module


@HEADS.register_module()
class StandardRoIHead(Module):
    def __init__(self, bbox_roi_extractor=None, bbox_head=None,
                 mask_roi_extractor=None, mask_head=None, shared_head=None,
                 train_cfg=None, test_cfg=None):
        assert shared_head is None, 'shared_head not yet supported'
        self.with_bbox = bbox_head is not None
        self.with_mask = mask_head is not None
        if self.with_bbox:
            self.bbox_roi_extractor = build_roi_extractor(bbox_roi_extractor)
            self.bbox_head = build_head(bbox_head)
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

    def init(self, key):
        k1, k2 = jax.random.split(key)
        p = {}
        if self.with_bbox:
            p['bbox_head'] = self.bbox_head.init(k1)
        if self.with_mask:
            p['mask_head'] = self.mask_head.init(k2)
        return p

    # ------------------------------------------------------------------
    def _bbox_forward(self, params, feats, rois, **extract_kw):
        """Extract roi feats + run bbox head
        (ref: standard_roi_head.py:135-170)."""
        bbox_feats = self.bbox_roi_extractor(
            {}, feats[:self.bbox_roi_extractor.num_inputs], rois,
            **extract_kw)
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
        cls_score, bbox_pred, _ = self._bbox_forward(params, feats, rois)
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
        mask_pred = self.mask_head(params['mask_head'], mask_feats)
        mh, mw = mask_pred.shape[1:3]
        mask_pred = mask_pred.reshape(b, n, mh, mw, -1)
        # select the predicted class's mask
        flat_labels = labels.reshape(b, n)
        cls_mask = jnp.take_along_axis(
            mask_pred, flat_labels[:, :, None, None, None], axis=-1)
        return cls_mask[..., 0]
