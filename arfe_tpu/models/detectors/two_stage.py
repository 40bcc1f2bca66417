"""Two-stage detector (ref: mmdet/models/detectors/two_stage.py:67-342)."""
from __future__ import annotations

import jax

from ...registry import DETECTORS
from ..builder import build_backbone, build_head, build_neck
from ..layers import Module


@DETECTORS.register_module()
class TwoStageDetector(Module):
    def __init__(self, backbone, neck=None, rpn_head=None, roi_head=None,
                 train_cfg=None, test_cfg=None, pretrained=None):
        self.backbone = build_backbone(backbone)
        self.with_neck = neck is not None
        if self.with_neck:
            self.neck = build_neck(neck)
        self.with_rpn = rpn_head is not None
        if self.with_rpn:
            rpn_head = dict(rpn_head)
            rpn_train_cfg = train_cfg.get('rpn') if train_cfg else None
            rpn_head.update(train_cfg=rpn_train_cfg,
                            test_cfg=test_cfg.get('rpn') if test_cfg
                            else None)
            self.rpn_head = build_head(rpn_head)
        if roi_head is not None:
            roi_head = dict(roi_head)
            roi_head.update(train_cfg=train_cfg.get('rcnn')
                            if train_cfg else None,
                            test_cfg=test_cfg.get('rcnn') if test_cfg
                            else None)
            self.roi_head = build_head(roi_head)
        self.train_cfg = train_cfg
        self.test_cfg = test_cfg
        self.pretrained = pretrained

    def init(self, key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        params = {'backbone': self.backbone.init(k1)}
        if self.with_neck:
            params['neck'] = self.neck.init(k2)
        if self.with_rpn:
            params['rpn_head'] = self.rpn_head.init(k3)
        params['roi_head'] = self.roi_head.init(k4)
        return params

    def extract_feat(self, params, img):
        x = self.backbone(params['backbone'], img)
        if self.with_neck:
            x = self.neck(params['neck'], x)
        return x

    def forward_train(self, params, img, img_shapes, gt_bboxes, gt_valid,
                      gt_labels, key, gt_mask_crops=None,
                      gt_semantic_seg=None):
        """Training losses (ref: two_stage.py:155-217)."""
        import jax.numpy as jnp

        x = self.extract_feat(params, img)
        losses = {}
        k_rpn, k_rcnn = jax.random.split(key)
        if self.with_rpn:
            proposal_cfg = (self.train_cfg.get('rpn_proposal')
                            if self.train_cfg else None) \
                or (self.test_cfg.get('rpn') if self.test_cfg else None)
            if hasattr(self.rpn_head, 'get_proposals'):
                # channel-major loss + proposal paths sharing the 3x3 conv
                # (see RPNHead.get_proposals / loss_from_shared)
                shared = [self.rpn_head.shared_single(params['rpn_head'], f)
                          for f in x]
                losses.update(self.rpn_head.loss_from_shared(
                    params['rpn_head'], shared, gt_bboxes, gt_valid,
                    img_shapes, k_rpn))
                props, prop_valid = self.rpn_head.get_proposals(
                    params['rpn_head'], x, img_shapes, cfg=proposal_cfg,
                    shared=[jax.lax.stop_gradient(s) for s in shared])
            else:
                # generic path (e.g. GARPNHead returns 4 per-level tuples:
                # cls, bbox, shape, loc — loss/get_bboxes take them all)
                outs = self.rpn_head(params['rpn_head'], x)
                losses.update(self.rpn_head.loss(*outs, gt_bboxes, gt_valid,
                                                 img_shapes, k_rpn))
                outs_sg = tuple(
                    [jax.lax.stop_gradient(t) for t in branch]
                    for branch in outs)
                props, prop_valid = self.rpn_head.get_bboxes(
                    *outs_sg, img_shapes, cfg=proposal_cfg)
        else:
            raise ValueError('forward_train without RPN requires proposals')
        extra = {}
        if gt_semantic_seg is not None:
            extra['gt_semantic_seg'] = gt_semantic_seg
        losses.update(self.roi_head.forward_train(
            params['roi_head'], x, props, prop_valid, gt_bboxes, gt_valid,
            gt_labels, k_rcnn, gt_mask_crops=gt_mask_crops,
            img_shapes=img_shapes, **extra))
        return losses

    def simple_test(self, params, img, img_shapes, scale_factors,
                    rescale=False, proposals=None):
        """Batched two-stage inference (ref: two_stage.py:236-330)."""
        x = self.extract_feat(params, img)
        if proposals is None:
            if not self.with_rpn:
                raise ValueError(
                    'this detector has no RPN head (e.g. FastRCNN): pass '
                    'precomputed proposals=(props, valid) to simple_test '
                    '(ref: fast_rcnn.py external-proposal contract)')
            if hasattr(self.rpn_head, 'get_proposals'):
                props, prop_valid = self.rpn_head.get_proposals(
                    params['rpn_head'], x, img_shapes)
            else:
                outs = self.rpn_head(params['rpn_head'], x)
                props, prop_valid = self.rpn_head.get_bboxes(*outs,
                                                             img_shapes)
        else:
            props, prop_valid = proposals
        return self.roi_head.simple_test(params['roi_head'], x, props,
                                         prop_valid, img_shapes,
                                         scale_factors, rescale=rescale)

    def aug_test(self, params, aug_imgs, aug_img_shapes, aug_scale_factors,
                 aug_flips, rescale=True):
        """Test-time augmentation (ref: two_stage.py:332-342 +
        detectors/test_mixins.py:32-56 aug_test_rpn).

        Args:
            aug_imgs: list per aug of (B, H_a, W_a, 3) (static shapes may
                differ per aug).
            aug_img_shapes / aug_scale_factors: lists of (B, 2) / (B, 4).
            aug_flips: list of static bools (MultiScaleFlipAug aug order).
        """
        from ...core.post.merge_augs import merge_aug_proposals

        feats = [self.extract_feat(params, img) for img in aug_imgs]
        aug_props, aug_valid = [], []
        for x, shapes in zip(feats, aug_img_shapes):
            if hasattr(self.rpn_head, 'get_proposals'):
                props, valid = self.rpn_head.get_proposals(
                    params['rpn_head'], x, shapes)
            else:
                outs = self.rpn_head(params['rpn_head'], x)
                props, valid = self.rpn_head.get_bboxes(*outs, shapes)
            aug_props.append(props)
            aug_valid.append(valid)
        merged, mvalid = merge_aug_proposals(
            aug_props, aug_valid, aug_img_shapes, aug_scale_factors,
            aug_flips, self.test_cfg['rpn'])
        return self.roi_head.aug_test(
            params['roi_head'], feats, merged, mvalid, aug_img_shapes,
            aug_scale_factors, aug_flips, rescale=rescale)


@DETECTORS.register_module()
class FasterRCNN(TwoStageDetector):
    """ref: mmdet/models/detectors/faster_rcnn.py"""


@DETECTORS.register_module()
class MaskRCNN(TwoStageDetector):
    """ref: mmdet/models/detectors/mask_rcnn.py"""


@DETECTORS.register_module()
class FastRCNN(TwoStageDetector):
    """External-proposal variant (ref: mmdet/models/detectors/fast_rcnn.py)."""


@DETECTORS.register_module()
class CascadeRCNN(TwoStageDetector):
    """ref: mmdet/models/detectors/cascade_rcnn.py"""


@DETECTORS.register_module()
class HybridTaskCascade(CascadeRCNN):
    """ref: mmdet/models/detectors/htc.py"""


@DETECTORS.register_module()
class GridRCNN(TwoStageDetector):
    """ref: mmdet/models/detectors/grid_rcnn.py (grid head pending)."""


@DETECTORS.register_module()
class MaskScoringRCNN(TwoStageDetector):
    """ref: mmdet/models/detectors/mask_scoring_rcnn.py (ms head pending)."""


@DETECTORS.register_module()
class RPN(Module):
    """Standalone RPN (ref: mmdet/models/detectors/rpn.py)."""

    def __init__(self, backbone, neck=None, rpn_head=None, train_cfg=None,
                 test_cfg=None, pretrained=None, roi_head=None):
        # roi_head accepted (and required None) so two-stage base configs
        # can be retargeted to RPN-only with ``roi_head=None``
        assert roi_head is None
        self.backbone = build_backbone(backbone)
        self.with_neck = neck is not None
        if self.with_neck:
            self.neck = build_neck(neck)
        rpn_head = dict(rpn_head)
        rpn_head.update(train_cfg=train_cfg.get('rpn') if train_cfg else None,
                        test_cfg=test_cfg.get('rpn') if test_cfg else None)
        self.rpn_head = build_head(rpn_head)
        self.train_cfg = train_cfg
        self.test_cfg = test_cfg

    def init(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        params = {'backbone': self.backbone.init(k1)}
        if self.with_neck:
            params['neck'] = self.neck.init(k2)
        params['rpn_head'] = self.rpn_head.init(k3)
        return params

    def extract_feat(self, params, img):
        x = self.backbone(params['backbone'], img)
        if self.with_neck:
            x = self.neck(params['neck'], x)
        return x

    def forward_train(self, params, img, img_shapes, gt_bboxes, gt_valid,
                      gt_labels, key, **kwargs):
        """RPN training is class-agnostic: gt_labels are ignored
        (ref: mmdet/models/detectors/rpn.py:58-73)."""
        x = self.extract_feat(params, img)
        if hasattr(self.rpn_head, 'loss_from_shared'):
            shared = [self.rpn_head.shared_single(params['rpn_head'], f)
                      for f in x]
            return self.rpn_head.loss_from_shared(
                params['rpn_head'], shared, gt_bboxes, gt_valid, img_shapes,
                key)
        outs = self.rpn_head(params['rpn_head'], x)
        return self.rpn_head.loss(*outs, gt_bboxes, gt_valid, img_shapes,
                                  key)

    def simple_test(self, params, img, img_shapes, scale_factors,
                    rescale=False):
        x = self.extract_feat(params, img)
        if hasattr(self.rpn_head, 'get_proposals'):
            props, valid = self.rpn_head.get_proposals(
                params['rpn_head'], x, img_shapes)
        else:
            outs = self.rpn_head(params['rpn_head'], x)
            props, valid = self.rpn_head.get_bboxes(*outs, img_shapes)
        if rescale:
            props = props.at[..., :4].divide(scale_factors[:, None, :4])
        return props, valid
