from .bbox_head import (BBoxHead, ConvFCBBoxHead, Shared2FCBBoxHead,
                        Shared4Conv1FCBBoxHead)
from .double_bbox_head import DoubleConvFCBBoxHead
from .multi_classes_bbox_head import (MultiClassesBBoxHead,
                                      Shared2FCMultiClassesBBoxHead)
from .multirois_bbox_head import MultiBBoxHead, MultiRoIsBBoxHead

__all__ = ['BBoxHead', 'ConvFCBBoxHead', 'Shared2FCBBoxHead',
           'Shared4Conv1FCBBoxHead', 'DoubleConvFCBBoxHead', 'MultiBBoxHead',
           'MultiRoIsBBoxHead',
           'MultiClassesBBoxHead', 'Shared2FCMultiClassesBBoxHead']
