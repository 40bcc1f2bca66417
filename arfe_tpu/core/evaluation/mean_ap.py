"""VOC-style mAP evaluation (numpy, host-side).

TPU-native counterpart of ref: mmdet/core/evaluation/mean_ap.py:1-392
(eval_map with area ranges, tpfp_default, average_precision with 'area' and
'11points' modes).
"""
from __future__ import annotations

import numpy as np


def bbox_overlaps_np(bboxes1, bboxes2, mode='iou'):
    bboxes1 = bboxes1.astype(np.float64)
    bboxes2 = bboxes2.astype(np.float64)
    rows, cols = bboxes1.shape[0], bboxes2.shape[0]
    ious = np.zeros((rows, cols))
    if rows * cols == 0:
        return ious
    x1 = np.maximum(bboxes1[:, None, 0], bboxes2[None, :, 0])
    y1 = np.maximum(bboxes1[:, None, 1], bboxes2[None, :, 1])
    x2 = np.minimum(bboxes1[:, None, 2], bboxes2[None, :, 2])
    y2 = np.minimum(bboxes1[:, None, 3], bboxes2[None, :, 3])
    overlap = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
    area1 = (bboxes1[:, 2] - bboxes1[:, 0]) * (bboxes1[:, 3] - bboxes1[:, 1])
    area2 = (bboxes2[:, 2] - bboxes2[:, 0]) * (bboxes2[:, 3] - bboxes2[:, 1])
    if mode == 'iou':
        union = area1[:, None] + area2[None, :] - overlap
    else:
        union = area1[:, None]
    return overlap / np.maximum(union, np.finfo(np.float64).eps)


def average_precision(recalls, precisions, mode='area'):
    """(ref: mean_ap.py:8-57)."""
    no_scale = recalls.ndim == 1
    if no_scale:
        recalls = recalls[None, :]
        precisions = precisions[None, :]
    num_scales = recalls.shape[0]
    ap = np.zeros(num_scales, dtype=np.float64)
    if mode == 'area':
        zeros = np.zeros((num_scales, 1))
        ones = np.ones((num_scales, 1))
        mrec = np.hstack((zeros, recalls, ones))
        mpre = np.hstack((zeros, precisions, zeros))
        for i in range(mpre.shape[1] - 1, 0, -1):
            mpre[:, i - 1] = np.maximum(mpre[:, i - 1], mpre[:, i])
        for i in range(num_scales):
            ind = np.where(mrec[i, 1:] != mrec[i, :-1])[0]
            ap[i] = np.sum(
                (mrec[i, ind + 1] - mrec[i, ind]) * mpre[i, ind + 1])
    elif mode == '11points':
        for i in range(num_scales):
            for thr in np.arange(0, 1.1, 0.1):
                precs = precisions[i, recalls[i, :] >= thr]
                ap[i] += precs.max() if precs.size else 0
            ap[i] /= 11
    else:
        raise ValueError(f'unrecognized mode {mode}')
    return ap[0] if no_scale else ap


def tpfp_default(det_bboxes, gt_bboxes, gt_bboxes_ignore=None,
                 iou_thr=0.5, area_ranges=None):
    """Check tp/fp of detections in one image for one class
    (ref: mean_ap.py:60-151)."""
    gt_bboxes_ignore = gt_bboxes_ignore if gt_bboxes_ignore is not None \
        else np.empty((0, 4))
    num_dets = det_bboxes.shape[0]
    num_gts = gt_bboxes.shape[0]
    if area_ranges is None:
        area_ranges = [(None, None)]
    num_scales = len(area_ranges)
    tp = np.zeros((num_scales, num_dets), dtype=np.float32)
    fp = np.zeros((num_scales, num_dets), dtype=np.float32)
    if num_gts == 0:
        if area_ranges == [(None, None)]:
            fp[...] = 1
        else:
            det_areas = (det_bboxes[:, 2] - det_bboxes[:, 0]) * (
                det_bboxes[:, 3] - det_bboxes[:, 1])
            for i, (mn, mx) in enumerate(area_ranges):
                fp[i, (det_areas >= mn) & (det_areas < mx)] = 1
        return tp, fp
    ious = bbox_overlaps_np(det_bboxes[:, :4], gt_bboxes)
    ious_max = ious.max(axis=1)
    ious_argmax = ious.argmax(axis=1)
    sort_inds = np.argsort(-det_bboxes[:, -1])
    for k, (mn, mx) in enumerate(area_ranges):
        gt_covered = np.zeros(num_gts, dtype=bool)
        if mn is None:
            gt_area_ignore = np.zeros_like(gt_covered)
        else:
            gt_areas = (gt_bboxes[:, 2] - gt_bboxes[:, 0]) * (
                gt_bboxes[:, 3] - gt_bboxes[:, 1])
            gt_area_ignore = (gt_areas < mn) | (gt_areas >= mx)
        for i in sort_inds:
            if ious_max[i] >= iou_thr:
                matched_gt = ious_argmax[i]
                if not gt_area_ignore[matched_gt]:
                    if not gt_covered[matched_gt]:
                        gt_covered[matched_gt] = True
                        tp[k, i] = 1
                    else:
                        fp[k, i] = 1
                # otherwise ignore this detection
            elif mn is None:
                fp[k, i] = 1
            else:
                area = (det_bboxes[i, 2] - det_bboxes[i, 0]) * (
                    det_bboxes[i, 3] - det_bboxes[i, 1])
                if mn <= area < mx:
                    fp[k, i] = 1
        # detections inside ignore boxes
        if gt_bboxes_ignore.shape[0] > 0:
            iofs = bbox_overlaps_np(det_bboxes[:, :4], gt_bboxes_ignore,
                                    mode='iof')
            for i in range(num_dets):
                if fp[k, i] == 1 and iofs[i].max() >= iou_thr:
                    fp[k, i] = 0
                    tp[k, i] = 0
    return tp, fp


def get_cls_results(det_results, annotations, class_id):
    cls_dets = [img_res[class_id] for img_res in det_results]
    cls_gts, cls_gts_ignore = [], []
    for ann in annotations:
        gt_inds = ann['labels'] == class_id
        cls_gts.append(ann['bboxes'][gt_inds, :])
        if ann.get('labels_ignore') is not None:
            ignore_inds = ann['labels_ignore'] == class_id
            cls_gts_ignore.append(ann['bboxes_ignore'][ignore_inds, :])
        else:
            cls_gts_ignore.append(np.empty((0, 4), dtype=np.float32))
    return cls_dets, cls_gts, cls_gts_ignore


def eval_map(det_results, annotations, scale_ranges=None, iou_thr=0.5,
             dataset=None, logger=None):
    """VOC-style mAP (ref: mean_ap.py:267-392).

    Args:
        det_results: list[list[np.ndarray]] — per image, per class (n, 5).
        annotations: list[dict(bboxes, labels, bboxes_ignore?,
            labels_ignore?)].
    Returns:
        (mean_ap, per-class eval results)
    """
    assert len(det_results) == len(annotations)
    num_classes = len(det_results[0])
    area_ranges = ([(r[0] ** 2, r[1] ** 2) for r in scale_ranges]
                   if scale_ranges is not None else None)
    num_scales = len(scale_ranges) if scale_ranges is not None else 1
    eval_results = []
    for i in range(num_classes):
        cls_dets, cls_gts, cls_gts_ignore = get_cls_results(
            det_results, annotations, i)
        tpfp = [tpfp_default(d, g, gi, iou_thr, area_ranges)
                for d, g, gi in zip(cls_dets, cls_gts, cls_gts_ignore)]
        tp_list, fp_list = tuple(zip(*tpfp))
        num_gts = np.zeros(num_scales, dtype=int)
        for j, bbox in enumerate(cls_gts):
            if area_ranges is None:
                num_gts[0] += bbox.shape[0]
            else:
                gt_areas = (bbox[:, 2] - bbox[:, 0]) * (
                    bbox[:, 3] - bbox[:, 1])
                for k, (mn, mx) in enumerate(area_ranges):
                    num_gts[k] += int(((gt_areas >= mn)
                                       & (gt_areas < mx)).sum())
        cls_dets_all = np.vstack(cls_dets)
        num_dets = cls_dets_all.shape[0]
        sort_inds = np.argsort(-cls_dets_all[:, -1])
        tp = np.hstack(tp_list)[:, sort_inds]
        fp = np.hstack(fp_list)[:, sort_inds]
        tp = np.cumsum(tp, axis=1)
        fp = np.cumsum(fp, axis=1)
        eps = np.finfo(np.float32).eps
        recalls = tp / np.maximum(num_gts[:, np.newaxis], eps)
        precisions = tp / np.maximum((tp + fp), eps)
        if scale_ranges is None:
            recalls = recalls[0, :]
            precisions = precisions[0, :]
            num_gts = num_gts.item()
        mode = 'area' if dataset != 'voc07' else '11points'
        ap = average_precision(recalls, precisions, mode)
        eval_results.append({
            'num_gts': num_gts,
            'num_dets': num_dets,
            'recall': recalls[..., -1] if num_dets > 0 else 0.0,
            'ap': ap,
        })
    if scale_ranges is not None:
        all_ap = np.vstack([r['ap'] for r in eval_results])
        all_num_gts = np.vstack([r['num_gts'] for r in eval_results])
        mean_ap = [all_ap[all_num_gts[:, i] > 0, i].mean()
                   if np.any(all_num_gts[:, i] > 0) else 0.0
                   for i in range(num_scales)]
    else:
        aps = [r['ap'] for r in eval_results if r['num_gts'] > 0]
        mean_ap = float(np.mean(aps)) if aps else 0.0
    return mean_ap, eval_results


def print_map_summary(mean_ap, results, dataset=None, scale_ranges=None):
    """(ref: mean_ap.py print_map_summary) — plain text table."""
    num_classes = len(results)
    if dataset is None:
        label_names = [str(i) for i in range(num_classes)]
    else:
        label_names = dataset
    rows = []
    for i, res in enumerate(results):
        recall = res['recall']
        recall = float(np.asarray(recall).reshape(-1)[-1]) \
            if np.size(recall) else 0.0
        ap = float(np.asarray(res['ap']).reshape(-1)[-1]) \
            if np.size(res['ap']) else 0.0
        rows.append((label_names[i], res['num_gts'], res['num_dets'],
                     round(recall, 3), round(ap, 3)))
    header = f'{"class":20s} {"gts":>8s} {"dets":>8s} {"recall":>8s} ' \
        f'{"ap":>8s}'
    lines = [header]
    for name, gts, dets, recall, ap in rows:
        lines.append(f'{str(name)[:20]:20s} {str(gts):>8s} {str(dets):>8s} '
                     f'{recall:8.3f} {ap:8.3f}')
    lines.append(f'{"mAP":20s} {"":>8s} {"":>8s} {"":>8s} '
                 f'{float(np.mean(mean_ap)):8.3f}')
    text = '\n'.join(lines)
    print(text)
    return text
