from .class_names import (coco_classes, dataset_aliases, get_classes,
                          visdrone_classes, voc_classes)
from .coco_eval import COCOEvaluator
from .mean_ap import average_precision, eval_map, print_map_summary, \
    tpfp_default
from .recall import eval_recalls

__all__ = ['COCOEvaluator', 'eval_map', 'average_precision', 'tpfp_default',
           'print_map_summary', 'eval_recalls', 'get_classes',
           'coco_classes', 'voc_classes', 'visdrone_classes',
           'dataset_aliases']
