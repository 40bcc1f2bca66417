"""Self-contained RLE utilities + COCO segm-metric evaluation
(ref: pycocotools maskUtils + mmdet/datasets/coco.py segm branch)."""
import numpy as np

from arfe_tpu.core.mask import (ann_to_mask, mask_iou, mask_to_rle,
                                rle_area, rle_to_bbox, rle_to_mask)
from arfe_tpu.data.coco_api import COCO
from arfe_tpu.core.evaluation import COCOEvaluator


def test_rle_roundtrip_and_area():
    rng = np.random.RandomState(0)
    for _ in range(5):
        m = (rng.rand(17, 23) > 0.6).astype(np.uint8)
        rle = mask_to_rle(m)
        assert rle['size'] == [17, 23]
        np.testing.assert_array_equal(rle_to_mask(rle), m)
        assert rle_area(rle) == int(m.sum())
    # empty and full masks
    for m in (np.zeros((4, 4), np.uint8), np.ones((4, 4), np.uint8)):
        np.testing.assert_array_equal(mask_to_rle(m) and
                                      rle_to_mask(mask_to_rle(m)), m)


def test_rle_bbox_and_polygon_raster():
    m = np.zeros((20, 30), np.uint8)
    m[5:10, 8:20] = 1
    assert rle_to_bbox(mask_to_rle(m)) == [8.0, 5.0, 12.0, 5.0]
    # polygon covering the same rect rasterizes to roughly the same mask
    poly = [[8, 5, 19, 5, 19, 9, 8, 9]]
    pm = ann_to_mask({'segmentation': poly}, 20, 30)
    assert pm[7, 10] == 1 and pm[0, 0] == 0


def test_mask_iou_crowd_semantics():
    a = np.zeros((10, 10), bool)
    a[:5] = True            # area 50
    b = np.zeros((10, 10), bool)
    b[3:8] = True           # area 50, inter 20
    iou = mask_iou([a], [b], iscrowd=[0])[0, 0]
    assert abs(iou - 20 / 80) < 1e-9
    iof = mask_iou([a], [b], iscrowd=[1])[0, 0]
    assert abs(iof - 20 / 50) < 1e-9


def _square_rle(x, y, s, h=60, w=60):
    m = np.zeros((h, w), np.uint8)
    m[y:y + s, x:x + s] = 1
    return mask_to_rle(m)


def test_segm_evaluator_perfect_and_shifted():
    gt_rles = [_square_rle(10, 10, 20), _square_rle(35, 30, 16)]
    gt = COCO.from_dict({
        'images': [{'id': 0, 'width': 60, 'height': 60,
                    'file_name': '0.jpg'}],
        'categories': [{'id': 1, 'name': 'c'}],
        'annotations': [
            {'id': i + 1, 'image_id': 0, 'category_id': 1,
             'segmentation': r, 'area': rle_area(r),
             'bbox': rle_to_bbox(r), 'iscrowd': 0}
            for i, r in enumerate(gt_rles)],
    })
    # perfect masks -> AP 1
    dt = gt.loadRes([dict(image_id=0, category_id=1, segmentation=r,
                          score=0.9) for r in gt_rles])
    stats = COCOEvaluator(gt, iou_type='segm').evaluate(dt)['stats']
    assert abs(stats['AP'] - 1.0) < 1e-6
    # one mask shifted so IoU = (20*10)/(2*400-200) = 1/3 -> matched at
    # 0.5? no -> that det is a FP and its gt unmatched
    shifted = _square_rle(10, 20, 20)
    dt2 = gt.loadRes([
        dict(image_id=0, category_id=1, segmentation=gt_rles[1], score=0.9),
        dict(image_id=0, category_id=1, segmentation=shifted, score=0.8)])
    stats2 = COCOEvaluator(gt, iou_type='segm').evaluate(dt2)['stats']
    assert abs(stats2['AP50'] - 0.5) < 1e-2


def test_dataset_segm_metric_end_to_end(tmp_path):
    import json
    from arfe_tpu.data.coco import CocoDataset
    rle1 = _square_rle(10, 10, 20)
    rle2 = _square_rle(35, 30, 16)
    ann = {
        'images': [{'id': 0, 'width': 60, 'height': 60,
                    'file_name': '0.jpg'}],
        'categories': [{'id': 1, 'name': 'thing'}],
        'annotations': [
            {'id': i + 1, 'image_id': 0, 'category_id': 1,
             'segmentation': r, 'area': rle_area(r),
             'bbox': rle_to_bbox(r), 'iscrowd': 0}
            for i, r in enumerate((rle1, rle2))],
    }
    af = tmp_path / 'ann.json'
    af.write_text(json.dumps(ann))
    ds = CocoDataset(str(af), pipeline=[], img_prefix='', test_mode=True)
    ds.CLASSES = ('thing',)
    # results: one image, one class, (bbox, segm) with full-size masks
    bboxes = np.array([[10, 10, 30, 30, 0.9], [35, 30, 51, 46, 0.8]],
                      np.float32)
    masks = [rle_to_mask(rle1), rle_to_mask(rle2)]
    results = [([bboxes], [masks])]
    out = ds.evaluate(results, metric=['bbox', 'segm'])
    assert abs(out['segm_mAP'] - 1.0) < 1e-6
    assert abs(out['bbox_mAP'] - 1.0) < 1e-6
    # encode_mask_results keeps evaluation identical
    from arfe_tpu.apis import encode_mask_results
    enc = encode_mask_results(results)
    assert isinstance(enc[0][1][0][0], dict)
    out2 = ds.evaluate(enc, metric='segm')
    assert abs(out2['segm_mAP'] - 1.0) < 1e-6
