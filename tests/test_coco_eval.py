"""From-scratch COCO evaluator vs hand-checkable golden cases."""
import numpy as np

from arfe_tpu.core.evaluation import COCOEvaluator, eval_map, eval_recalls
from arfe_tpu.data.coco_api import COCO


def make_gt(annotations, num_imgs=2, num_cats=2):
    return COCO.from_dict({
        'images': [{'id': i, 'width': 100, 'height': 100,
                    'file_name': f'{i}.jpg'} for i in range(num_imgs)],
        'categories': [{'id': c + 1, 'name': f'c{c}'}
                       for c in range(num_cats)],
        'annotations': [dict(a, id=i + 1, area=a['bbox'][2] * a['bbox'][3],
                             iscrowd=a.get('iscrowd', 0))
                        for i, a in enumerate(annotations)],
    })


def test_perfect_predictions_ap1():
    gts = [
        dict(image_id=0, category_id=1, bbox=[10, 10, 20, 20]),
        dict(image_id=0, category_id=2, bbox=[50, 50, 30, 10]),
        dict(image_id=1, category_id=1, bbox=[5, 5, 40, 40]),
    ]
    coco_gt = make_gt(gts)
    dets = [dict(g, score=0.9) for g in gts]
    ev = COCOEvaluator(coco_gt)
    stats = ev.evaluate(coco_gt.loadRes(dets))['stats']
    assert abs(stats['AP'] - 1.0) < 1e-6
    assert abs(stats['AP50'] - 1.0) < 1e-6
    assert abs(stats['AR@100'] - 1.0) < 1e-6


def test_iou_060_matches_three_thresholds():
    # one gt, one det with IoU exactly 0.6 -> matched at thr .5/.55/.6
    coco_gt = make_gt([dict(image_id=0, category_id=1,
                            bbox=[0, 0, 10, 10])], num_imgs=1, num_cats=1)
    # det [0,0,6,10] vs gt [0,0,10,10]: inter 60, union 100 -> IoU 0.6
    dets = [dict(image_id=0, category_id=1, bbox=[0, 0, 6, 10], score=0.9)]
    stats = COCOEvaluator(coco_gt).evaluate(coco_gt.loadRes(dets))['stats']
    assert abs(stats['AP'] - 0.3) < 1e-6
    assert abs(stats['AP50'] - 1.0) < 1e-6
    assert abs(stats['AP75']) < 1e-6


def test_false_positive_halves_precision():
    coco_gt = make_gt([dict(image_id=0, category_id=1,
                            bbox=[0, 0, 10, 10])], num_imgs=1, num_cats=1)
    dets = [
        dict(image_id=0, category_id=1, bbox=[0, 0, 10, 10], score=0.9),
        dict(image_id=0, category_id=1, bbox=[50, 50, 10, 10], score=0.8),
    ]
    stats = COCOEvaluator(coco_gt).evaluate(coco_gt.loadRes(dets))['stats']
    # recall 1.0 at precision 1.0 (fp comes after the tp) -> AP still 1.0
    assert abs(stats['AP50'] - 1.0) < 1e-6
    # flip scores: fp first -> precision at recall>0 is 0.5
    dets[0]['score'], dets[1]['score'] = 0.8, 0.9
    stats = COCOEvaluator(coco_gt).evaluate(coco_gt.loadRes(dets))['stats']
    assert abs(stats['AP50'] - 0.5) < 1e-2


def test_crowd_gt_not_fp():
    coco_gt = make_gt([
        dict(image_id=0, category_id=1, bbox=[0, 0, 10, 10]),
        dict(image_id=0, category_id=1, bbox=[40, 40, 20, 20], iscrowd=1),
    ], num_imgs=1, num_cats=1)
    dets = [
        dict(image_id=0, category_id=1, bbox=[0, 0, 10, 10], score=0.9),
        # overlaps the crowd region -> ignored, not a false positive
        dict(image_id=0, category_id=1, bbox=[42, 42, 16, 16], score=0.8),
    ]
    stats = COCOEvaluator(coco_gt).evaluate(coco_gt.loadRes(dets))['stats']
    assert abs(stats['AP'] - 1.0) < 1e-6


def test_area_ranges():
    # small gt (16x16=256 < 32^2) only
    coco_gt = make_gt([dict(image_id=0, category_id=1,
                            bbox=[0, 0, 16, 16])], num_imgs=1, num_cats=1)
    dets = [dict(image_id=0, category_id=1, bbox=[0, 0, 16, 16], score=0.9)]
    stats = COCOEvaluator(coco_gt).evaluate(coco_gt.loadRes(dets))['stats']
    assert abs(stats['APs'] - 1.0) < 1e-6
    assert stats['APm'] == -1.0  # no medium gts
    assert stats['APl'] == -1.0


def test_voc_eval_map_basic():
    dets = [[np.array([[0, 0, 10, 10, 0.9]], np.float32)]]
    anns = [dict(bboxes=np.array([[0, 0, 10, 10]], np.float32),
                 labels=np.array([0]))]
    mean_ap, results = eval_map(dets, anns, iou_thr=0.5)
    assert abs(mean_ap - 1.0) < 1e-6

    # miss -> 0
    dets = [[np.array([[50, 50, 60, 60, 0.9]], np.float32)]]
    mean_ap, _ = eval_map(dets, anns, iou_thr=0.5)
    assert mean_ap < 1e-6


def test_eval_recalls():
    gts = [np.array([[0, 0, 10, 10], [20, 20, 40, 40]], np.float32)]
    proposals = [np.array([[0, 0, 10, 10, 0.9], [100, 100, 110, 110, 0.8]],
                          np.float32)]
    rec = eval_recalls(gts, proposals, proposal_nums=[2], iou_thrs=0.5)
    assert abs(rec[0, 0] - 0.5) < 1e-6
