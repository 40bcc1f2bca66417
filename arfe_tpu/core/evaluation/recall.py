"""Proposal recall evaluation (ref: mmdet/core/evaluation/recall.py)."""
from __future__ import annotations

import numpy as np

from .mean_ap import bbox_overlaps_np


def _recalls(all_ious, proposal_nums, thrs):
    img_num = all_ious.shape[0]
    total_gt_num = sum(ious.shape[0] for ious in all_ious)
    ious_list = []
    for k in proposal_nums:
        tmp_ious = np.zeros(0)
        for i in range(img_num):
            ious = all_ious[i][:, :k].copy()
            gt_ious = np.zeros(ious.shape[0])
            if ious.size == 0:
                ious_list.append(gt_ious)
                continue
            for j in range(ious.shape[0]):
                gt_max_overlaps = ious.argmax(axis=1)
                max_ious = ious[np.arange(0, ious.shape[0]),
                                gt_max_overlaps]
                gt_idx = max_ious.argmax()
                gt_ious[j] = max_ious[gt_idx]
                box_idx = gt_max_overlaps[gt_idx]
                ious[gt_idx, :] = -1
                ious[:, box_idx] = -1
            tmp_ious = np.hstack((tmp_ious, gt_ious))
        ious_list.append(tmp_ious)
    recalls = np.zeros((len(proposal_nums), len(thrs)))
    for i, tious in enumerate(ious_list[:len(proposal_nums)]):
        recalls[i, :] = [(np.asarray(tious) >= thr).sum() /
                         max(total_gt_num, 1) for thr in thrs]
    return recalls


def eval_recalls(gts, proposals, proposal_nums=None, iou_thrs=0.5):
    """Per-proposal-budget recall (ref: recall.py:65-110).

    Args:
        gts: list of (m, 4) gt arrays per image.
        proposals: list of (n, 4) or (n, 5) proposal arrays.
    """
    if proposal_nums is None:
        proposal_nums = [100, 300, 1000]
    proposal_nums = np.array(proposal_nums, dtype=np.int32)
    if isinstance(iou_thrs, float):
        iou_thrs = np.array([iou_thrs])
    else:
        iou_thrs = np.asarray(iou_thrs)
    img_num = len(gts)
    assert img_num == len(proposals)
    all_ious = []
    for i in range(img_num):
        img_proposal = proposals[i]
        if img_proposal.shape[1] == 5:
            order = np.argsort(-img_proposal[:, 4])
            img_proposal = img_proposal[order, :4]
        prop_num = min(img_proposal.shape[0], proposal_nums[-1])
        if gts[i] is None or gts[i].shape[0] == 0:
            ious = np.zeros((0, img_proposal.shape[0]), dtype=np.float32)
        else:
            ious = bbox_overlaps_np(gts[i], img_proposal[:prop_num, :4])
        all_ious.append(ious)
    all_ious = np.array(all_ious, dtype=object)
    return _recalls(all_ious, proposal_nums, iou_thrs)
