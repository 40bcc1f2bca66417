from .accuracy import Accuracy, accuracy
from .cross_entropy_loss import (CrossEntropyLoss, binary_cross_entropy,
                                 cross_entropy, distribution_loss,
                                 mask_cross_entropy, multi_classes_loss)
from .focal_loss import FocalLoss, py_sigmoid_focal_loss
from .ghm_loss import GHMC, GHMR
from .iou_loss import (AIoULoss, BoundedIoULoss, GIoULoss, IoULoss,
                       aiou_loss, bounded_iou_loss, giou_loss, iou_loss)
from .smooth_l1_loss import (BalancedL1Loss, L1Loss, MSELoss, SmoothL1Loss,
                             balanced_l1_loss, l1_loss, smooth_l1_loss)
from .utils import reduce_loss, weight_reduce_loss

__all__ = [
    'CrossEntropyLoss', 'cross_entropy', 'binary_cross_entropy',
    'mask_cross_entropy', 'distribution_loss', 'multi_classes_loss',
    'FocalLoss', 'py_sigmoid_focal_loss', 'GHMC', 'GHMR', 'SmoothL1Loss', 'L1Loss',
    'BalancedL1Loss', 'MSELoss', 'smooth_l1_loss', 'l1_loss',
    'balanced_l1_loss', 'IoULoss', 'GIoULoss', 'AIoULoss', 'BoundedIoULoss',
    'iou_loss', 'giou_loss', 'aiou_loss', 'bounded_iou_loss', 'Accuracy',
    'accuracy', 'reduce_loss', 'weight_reduce_loss',
]


def build_loss(cfg):
    from ...registry import LOSSES, build_from_cfg
    return build_from_cfg(cfg, LOSSES)
