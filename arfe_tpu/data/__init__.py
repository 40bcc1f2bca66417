from .builder import (DetDataLoader, GroupBatchSampler, build_dataloader,
                      build_dataset, collate_detection)
from .coco import (BaiduDataset, CityscapesDataset, CocoDataset,
                   VisdroneDataset)
from .coco_api import COCO
from .custom import CustomDataset
from .dataset_wrappers import (ClassBalancedDataset, ConcatDataset,
                               RepeatDataset)
from .pipelines import Compose
from .xml_style import VOCDataset, WIDERFaceDataset, XMLDataset

__all__ = [
    'COCO', 'CustomDataset', 'CocoDataset', 'VisdroneDataset',
    'BaiduDataset', 'VOCDataset', 'XMLDataset', 'ConcatDataset',
    'CityscapesDataset', 'WIDERFaceDataset',
    'RepeatDataset', 'ClassBalancedDataset', 'Compose', 'build_dataset',
    'build_dataloader', 'DetDataLoader', 'GroupBatchSampler',
    'collate_detection',
]
