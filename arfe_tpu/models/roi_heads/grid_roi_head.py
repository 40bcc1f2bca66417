"""Grid R-CNN RoI head (ref: mmdet/models/roi_heads/grid_roi_head.py:8-157).

Replaces the bbox-delta regression at test time with grid-point heatmap
voting; training adds a grid-heatmap loss on jittered positives.

Static-shape departures: the reference's dynamic positive gathering +
randperm subsample becomes a stable partition of the fixed sample slots
(positives first) truncated to ``max_num_grid`` with a validity mask.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ...registry import HEADS
from ..builder import build_head, build_roi_extractor
from .standard_roi_head import StandardRoIHead


@HEADS.register_module()
class GridRoIHead(StandardRoIHead):
    def __init__(self, grid_roi_extractor=None, grid_head=None, **kwargs):
        assert grid_head is not None
        super().__init__(**kwargs)
        if grid_roi_extractor is not None:
            self.grid_roi_extractor = build_roi_extractor(grid_roi_extractor)
            self.share_grid_extractor = False
        else:
            self.grid_roi_extractor = self.bbox_roi_extractor
            self.share_grid_extractor = True
        self.grid_head = build_head(grid_head)

    def init(self, key):
        k1, k2 = jax.random.split(key)
        p = super().init(k1)
        p['grid_head'] = self.grid_head.init(k2)
        return p

    def _random_jitter(self, key, boxes, img_shapes, amplitude=0.15):
        """Jitter boxes (B, S, 4) (ref: grid_roi_head.py:32-55)."""
        b, s = boxes.shape[:2]
        off = jax.random.uniform(key, (b, s, 4), jnp.float32, -amplitude,
                                 amplitude)
        cxcy = (boxes[..., 2:4] + boxes[..., :2]) / 2
        wh = jnp.abs(boxes[..., 2:4] - boxes[..., :2])
        new_cxcy = cxcy + wh * off[..., :2]
        new_wh = wh * (1 + off[..., 2:])
        x1y1 = new_cxcy - new_wh / 2
        x2y2 = new_cxcy + new_wh / 2
        new = jnp.concatenate([x1y1, x2y2], -1)
        hw = img_shapes[:, None, :]                       # (B, 1, 2)
        return jnp.stack([
            jnp.clip(new[..., 0], 0, hw[..., 1] - 1),
            jnp.clip(new[..., 1], 0, hw[..., 0] - 1),
            jnp.clip(new[..., 2], 0, hw[..., 1] - 1),
            jnp.clip(new[..., 3], 0, hw[..., 0] - 1)], -1)

    def forward_train(self, params, feats, proposals, prop_valid, gt_bboxes,
                      gt_valid, gt_labels, key, gt_mask_crops=None,
                      img_shapes=None):
        k_main, k_jit = jax.random.split(key)
        losses = super().forward_train(params, feats, proposals, prop_valid,
                                       gt_bboxes, gt_valid, gt_labels,
                                       k_main, gt_mask_crops=gt_mask_crops,
                                       img_shapes=img_shapes)
        # identical key -> identical sampling; XLA CSEs the repeat
        sampled = self._sample_for_train(params, feats, proposals,
                                         prop_valid, gt_bboxes, gt_valid,
                                         gt_labels, k_main)
        b, s = sampled['boxes'].shape[:2]
        pos = sampled['is_pos'] & sampled['valid']        # (B, S)
        boxes = self._random_jitter(k_jit, sampled['boxes'], img_shapes)

        # flatten and take positives-first into K fixed grid slots
        # (ref: max_num_grid subsampling, grid_roi_head.py:102-106)
        k_cap = min(self.train_cfg.get('max_num_grid', 192), b * s)
        flat_pos = pos.reshape(-1)
        order = jnp.argsort(~flat_pos, stable=True)[:k_cap]
        slot_valid = flat_pos[order]
        binds = jnp.broadcast_to(
            jnp.arange(b, dtype=jnp.float32)[:, None], (b, s)).reshape(-1)
        flat_boxes = boxes.reshape(-1, 4)
        flat_gts = sampled['gt_boxes'].reshape(-1, 4)
        rois = jnp.concatenate(
            [binds[order][:, None], flat_boxes[order]], -1)
        grid_feats = self.grid_roi_extractor(
            {}, feats[:self.grid_roi_extractor.num_inputs], rois)
        if self.with_shared_head:
            grid_feats = self.shared_head(params['shared_head'], grid_feats)
        grid_pred = self.grid_head(params['grid_head'], grid_feats,
                                   training=True)
        targets = self.grid_head.get_targets(
            flat_boxes[order], flat_gts[order],
            pos_radius=self.train_cfg.get('pos_radius', 1))
        losses.update(self.grid_head.loss(grid_pred, targets,
                                          valid=slot_valid))
        return losses

    def simple_test(self, params, feats, proposals, proposal_valid,
                    img_shapes, scale_factors, rescale=False):
        """(ref: grid_roi_head.py:119-156): NMS first, then grid-refine the
        surviving boxes."""
        dets, labels, valid = self.simple_test_bboxes(
            params, feats, proposals, proposal_valid, img_shapes,
            scale_factors, rescale=False)
        b, n = dets.shape[:2]
        binds = jnp.broadcast_to(
            jnp.arange(b, dtype=dets.dtype)[:, None], (b, n))
        rois = jnp.concatenate(
            [binds[..., None], dets[..., :4]], -1).reshape(b * n, 5)
        grid_feats = self.grid_roi_extractor(
            {}, feats[:self.grid_roi_extractor.num_inputs], rois)
        if self.with_shared_head:
            grid_feats = self.shared_head(params['shared_head'], grid_feats)
        grid_pred = self.grid_head(params['grid_head'], grid_feats,
                                   training=False)
        fused = grid_pred['fused'].reshape(
            b, n, *grid_pred['fused'].shape[1:])

        def refine(d, f, shape):
            return self.grid_head.get_bboxes(d, f, shape)

        dets = jax.vmap(refine)(dets, fused, img_shapes)
        if rescale:
            dets = dets.at[..., :4].divide(scale_factors[:, None, :4])
        if not self.with_mask:
            return dets, labels, valid
        masks = self.simple_test_mask(params, feats, dets, labels, valid,
                                      img_shapes, scale_factors,
                                      rescale=rescale)
        return dets, labels, valid, masks
