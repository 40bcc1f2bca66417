"""COCO dataset (ref: mmdet/datasets/coco.py:19-430), on the bundled
coco_api + from-scratch COCOEvaluator (pycocotools is unavailable here; the
evaluator reimplements its protocol — see core/evaluation/coco_eval.py).
"""
from __future__ import annotations

import numpy as np

from ..core.evaluation import COCOEvaluator
from ..registry import DATASETS
from .coco_api import COCO
from .custom import CustomDataset


@DATASETS.register_module()
class CocoDataset(CustomDataset):
    CLASSES = (
        'person', 'bicycle', 'car', 'motorcycle', 'airplane', 'bus',
        'train', 'truck', 'boat', 'traffic light', 'fire hydrant',
        'stop sign', 'parking meter', 'bench', 'bird', 'cat', 'dog',
        'horse', 'sheep', 'cow', 'elephant', 'bear', 'zebra', 'giraffe',
        'backpack', 'umbrella', 'handbag', 'tie', 'suitcase', 'frisbee',
        'skis', 'snowboard', 'sports ball', 'kite', 'baseball bat',
        'baseball glove', 'skateboard', 'surfboard', 'tennis racket',
        'bottle', 'wine glass', 'cup', 'fork', 'knife', 'spoon', 'bowl',
        'banana', 'apple', 'sandwich', 'orange', 'broccoli', 'carrot',
        'hot dog', 'pizza', 'donut', 'cake', 'chair', 'couch',
        'potted plant', 'bed', 'dining table', 'toilet', 'tv', 'laptop',
        'mouse', 'remote', 'keyboard', 'cell phone', 'microwave', 'oven',
        'toaster', 'sink', 'refrigerator', 'book', 'clock', 'vase',
        'scissors', 'teddy bear', 'hair drier', 'toothbrush')

    def load_annotations(self, ann_file):
        """(ref: coco.py:33-52)."""
        self.coco = COCO(ann_file)
        self.cat_ids = self.coco.getCatIds(catNms=self.CLASSES) \
            if self.CLASSES else self.coco.getCatIds()
        if not self.cat_ids:
            self.cat_ids = self.coco.getCatIds()
        self.cat2label = {cat_id: i for i, cat_id in enumerate(self.cat_ids)}
        self.img_ids = self.coco.getImgIds()
        data_infos = []
        for i in self.img_ids:
            info = self.coco.loadImgs([i])[0]
            info['filename'] = info['file_name']
            data_infos.append(info)
        return data_infos

    def get_ann_info(self, idx):
        img_id = self.data_infos[idx]['id']
        ann_ids = self.coco.getAnnIds(imgIds=[img_id])
        ann_info = self.coco.loadAnns(ann_ids)
        return self._parse_ann_info(self.data_infos[idx], ann_info)

    def _filter_imgs(self, min_size=32):
        """(ref: coco.py:78-96)."""
        valid_inds = []
        ids_with_ann = set(a['image_id'] for a in self.coco.anns.values())
        ids_in_cat = set()
        for cat_id in self.cat_ids:
            ids_in_cat |= set(self.coco.cat_img_map[cat_id])
        ids_in_cat &= ids_with_ann
        valid_img_ids = []
        for i, img_info in enumerate(self.data_infos):
            img_id = self.img_ids[i]
            if self.filter_empty_gt and img_id not in ids_in_cat:
                continue
            if min(img_info['width'], img_info['height']) >= min_size:
                valid_inds.append(i)
                valid_img_ids.append(img_id)
        self.img_ids = valid_img_ids
        return valid_inds

    def _parse_ann_info(self, img_info, ann_info):
        """(ref: coco.py:98-162)."""
        gt_bboxes = []
        gt_labels = []
        gt_bboxes_ignore = []
        gt_masks_ann = []
        for ann in ann_info:
            if ann.get('ignore', False):
                continue
            x1, y1, w, h = ann['bbox']
            inter_w = max(0, min(x1 + w, img_info['width']) - max(x1, 0))
            inter_h = max(0, min(y1 + h, img_info['height']) - max(y1, 0))
            if inter_w * inter_h == 0:
                continue
            if ann['area'] <= 0 or w < 1 or h < 1:
                continue
            if ann['category_id'] not in self.cat2label:
                continue
            bbox = [x1, y1, x1 + w, y1 + h]
            if ann.get('iscrowd', False):
                gt_bboxes_ignore.append(bbox)
            else:
                gt_bboxes.append(bbox)
                gt_labels.append(self.cat2label[ann['category_id']])
                gt_masks_ann.append(ann.get('segmentation'))
        gt_bboxes = np.array(gt_bboxes, dtype=np.float32).reshape(-1, 4)
        gt_labels = np.array(gt_labels, dtype=np.int64)
        gt_bboxes_ignore = np.array(gt_bboxes_ignore,
                                    dtype=np.float32).reshape(-1, 4)
        return dict(bboxes=gt_bboxes, labels=gt_labels,
                    bboxes_ignore=gt_bboxes_ignore, masks=gt_masks_ann,
                    seg_map=img_info['filename'].replace('jpg', 'png'))

    # ------------------------------------------------------------------
    def _det2json(self, results):
        """Per-class numpy results -> COCO json dicts
        (ref: coco.py:182-227 _det2json)."""
        json_results = []
        for idx, result in enumerate(results):
            img_id = self.img_ids[idx]
            if isinstance(result, tuple):  # (bbox, segm) mask models
                result = result[0]
            for label, bboxes in enumerate(result):
                for bbox in bboxes:
                    x1, y1, x2, y2, score = bbox[:5].tolist()
                    json_results.append(dict(
                        image_id=img_id,
                        bbox=[x1, y1, x2 - x1, y2 - y1],
                        score=float(score),
                        category_id=self.cat_ids[label]))
        return json_results

    def _segm2json(self, results):
        """(bbox, segm) results -> COCO segm json dicts with
        uncompressed RLE (ref: coco.py _segm2json; pycocotools-free)."""
        from ..core.mask.rle import mask_to_rle
        json_results = []
        for idx, result in enumerate(results):
            img_id = self.img_ids[idx]
            if not isinstance(result, tuple):
                raise ValueError('segm metric needs (bbox, segm) results')
            det, seg = result
            for label, bboxes in enumerate(det):
                segms = seg[label]
                for i, bbox in enumerate(bboxes):
                    if i >= len(segms):
                        break
                    rle = segms[i]
                    if not isinstance(rle, dict):
                        rle = mask_to_rle(np.asarray(rle))
                    json_results.append(dict(
                        image_id=img_id,
                        segmentation=rle,
                        score=float(bbox[4]),
                        category_id=self.cat_ids[label]))
        return json_results

    def results2json(self, results, outfile_prefix=None):
        """(ref: coco.py:229-267)."""
        import json
        json_results = self._det2json(results)
        if outfile_prefix is not None:
            path = f'{outfile_prefix}.bbox.json'
            with open(path, 'w') as f:
                json.dump(json_results, f)
            return {'bbox': path}
        return json_results

    def evaluate(self, results, metric='bbox', logger=None, jsonfile_prefix=None,
                 classwise=False, proposal_nums=(100, 300, 1000),
                 iou_thrs=None):
        """COCO protocol evaluation (ref: coco.py:320-430)."""
        metrics = metric if isinstance(metric, list) else [metric]
        eval_results = {}
        for m in metrics:
            if m not in ('bbox', 'segm', 'proposal', 'proposal_fast'):
                raise KeyError(f'metric {m} is not supported')
        json_results = self._det2json(results)
        coco_dt = self.coco.loadRes(json_results) if json_results \
            else COCO.from_dict({'images': [], 'annotations': [],
                                 'categories': []})
        if 'bbox' in metrics:
            ev = COCOEvaluator(self.coco, iou_type='bbox',
                               iou_thrs=iou_thrs)
            ev.img_ids = self.img_ids
            stats = ev.evaluate(coco_dt)['stats']
            for k in ('AP', 'AP50', 'AP75', 'APs', 'APm', 'APl'):
                eval_results[f'bbox_m{k}' if k == 'AP' else f'bbox_{k}'] = \
                    stats[k]
        if 'segm' in metrics:
            segm_json = self._segm2json(results)
            segm_dt = self.coco.loadRes(segm_json) if segm_json \
                else COCO.from_dict({'images': [], 'annotations': [],
                                     'categories': []})
            ev = COCOEvaluator(self.coco, iou_type='segm',
                               iou_thrs=iou_thrs)
            ev.img_ids = self.img_ids
            stats = ev.evaluate(segm_dt)['stats']
            for k in ('AP', 'AP50', 'AP75', 'APs', 'APm', 'APl'):
                eval_results[f'segm_m{k}' if k == 'AP' else f'segm_{k}'] = \
                    stats[k]
        if 'proposal' in metrics or 'proposal_fast' in metrics:
            from ..core.evaluation import eval_recalls
            gt_bboxes = [self.get_ann_info(i)['bboxes']
                         for i in range(len(self))]
            props = [np.vstack(r) if isinstance(r, list) else r
                     for r in results]
            recalls = eval_recalls(gt_bboxes, props, list(proposal_nums),
                                   np.arange(0.5, 0.96, 0.05))
            ar = recalls.mean(axis=1)
            for i, num in enumerate(proposal_nums):
                eval_results[f'AR@{num}'] = float(ar[i])
        return eval_results


@DATASETS.register_module()
class VisdroneDataset(CocoDataset):
    """(ref: mmdet/datasets/visdrone.py:5-11)."""
    CLASSES = ('ignored-regions', 'pedestrian', 'people', 'bicycle', 'car',
               'van', 'truck', 'tricycle', 'awning-tricycle', 'bus', 'motor',
               'others')


@DATASETS.register_module()
class BaiduDataset(CocoDataset):
    """(ref: mmdet/datasets/baidu.py:5)."""
    CLASSES = ('plate',)


@DATASETS.register_module()
class CityscapesDataset(CocoDataset):
    """(ref: mmdet/datasets/cityscapes.py:19-333; COCO-format annotations
    from the standard cityscapes conversion)."""

    CLASSES = ('person', 'rider', 'car', 'truck', 'bus', 'train',
               'motorcycle', 'bicycle')
