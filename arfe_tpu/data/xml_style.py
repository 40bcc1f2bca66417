"""Pascal-VOC XML dataset (ref: mmdet/datasets/xml_style.py + voc.py)."""
from __future__ import annotations

import os.path as osp
import xml.etree.ElementTree as ET

import numpy as np

from ..registry import DATASETS
from .custom import CustomDataset


@DATASETS.register_module()
class XMLDataset(CustomDataset):
    def __init__(self, min_size=None, **kwargs):
        self.min_size = min_size
        super().__init__(**kwargs)
        self.cat2label = {cat: i for i, cat in enumerate(self.CLASSES)}

    def load_annotations(self, ann_file):
        data_infos = []
        with open(ann_file) as f:
            img_ids = [line.strip() for line in f if line.strip()]
        for img_id in img_ids:
            filename = f'JPEGImages/{img_id}.jpg'
            xml_path = osp.join(self.img_prefix, 'Annotations',
                                f'{img_id}.xml')
            tree = ET.parse(xml_path)
            root = tree.getroot()
            size = root.find('size')
            width = int(size.find('width').text)
            height = int(size.find('height').text)
            data_infos.append(dict(id=img_id, filename=filename,
                                   width=width, height=height))
        return data_infos

    def get_ann_info(self, idx):
        img_id = self.data_infos[idx]['id']
        xml_path = osp.join(self.img_prefix, 'Annotations', f'{img_id}.xml')
        tree = ET.parse(xml_path)
        root = tree.getroot()
        cat2label = {cat: i for i, cat in enumerate(self.CLASSES)}
        bboxes, labels, bboxes_ignore, labels_ignore = [], [], [], []
        for obj in root.findall('object'):
            name = obj.find('name').text
            if name not in cat2label:
                continue
            label = cat2label[name]
            difficult = int(obj.find('difficult').text) \
                if obj.find('difficult') is not None else 0
            bnd_box = obj.find('bndbox')
            bbox = [int(float(bnd_box.find(t).text))
                    for t in ('xmin', 'ymin', 'xmax', 'ymax')]
            ignore = False
            if self.min_size:
                w = bbox[2] - bbox[0]
                h = bbox[3] - bbox[1]
                if w < self.min_size or h < self.min_size:
                    ignore = True
            if difficult or ignore:
                bboxes_ignore.append(bbox)
                labels_ignore.append(label)
            else:
                bboxes.append(bbox)
                labels.append(label)
        return dict(
            bboxes=np.array(bboxes, dtype=np.float32).reshape(-1, 4),
            labels=np.array(labels, dtype=np.int64),
            bboxes_ignore=np.array(bboxes_ignore,
                                   dtype=np.float32).reshape(-1, 4),
            labels_ignore=np.array(labels_ignore, dtype=np.int64))


@DATASETS.register_module()
class VOCDataset(XMLDataset):
    CLASSES = ('aeroplane', 'bicycle', 'bird', 'boat', 'bottle', 'bus',
               'car', 'cat', 'chair', 'cow', 'diningtable', 'dog', 'horse',
               'motorbike', 'person', 'pottedplant', 'sheep', 'sofa',
               'train', 'tvmonitor')

    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        if 'VOC2007' in self.img_prefix:
            self.year = 2007
        elif 'VOC2012' in self.img_prefix:
            self.year = 2012
        else:
            self.year = None

    def evaluate(self, results, metric='mAP', logger=None, iou_thr=0.5,
                 scale_ranges=None, proposal_nums=(100, 300, 1000)):
        from ..core.evaluation import eval_map
        annotations = [self.get_ann_info(i) for i in range(len(self))]
        ds_name = 'voc07' if self.year == 2007 else self.CLASSES
        mean_ap, _ = eval_map(results, annotations,
                              scale_ranges=scale_ranges, iou_thr=iou_thr,
                              dataset=ds_name)
        return {'mAP': mean_ap}


@DATASETS.register_module()
class WIDERFaceDataset(XMLDataset):
    """WIDER Face in PASCAL-VOC layout
    (ref: mmdet/datasets/wider_face.py:11-57): images live under
    ``<folder>/<img_id>.jpg`` as recorded in each annotation's XML."""

    CLASSES = ('face',)

    def load_annotations(self, ann_file):
        data_infos = []
        with open(ann_file) as f:
            img_ids = [line.strip() for line in f if line.strip()]
        for img_id in img_ids:
            xml_path = osp.join(self.img_prefix, 'Annotations',
                                f'{img_id}.xml')
            tree = ET.parse(xml_path)
            root = tree.getroot()
            size = root.find('size')
            width = int(size.find('width').text)
            height = int(size.find('height').text)
            folder = root.find('folder').text
            data_infos.append(dict(
                id=img_id, filename=osp.join(folder, f'{img_id}.jpg'),
                width=width, height=height))
        return data_infos
