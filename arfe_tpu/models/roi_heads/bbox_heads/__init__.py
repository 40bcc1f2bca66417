from .bbox_head import (BBoxHead, ConvFCBBoxHead, Shared2FCBBoxHead,
                        Shared4Conv1FCBBoxHead)
from .double_bbox_head import DoubleConvFCBBoxHead
from .multi_classes_bbox_head import (MultiClassesBBoxHead,
                                      Shared2FCMultiClassesBBoxHead)
from .multirois_bbox_head import MultiBBoxHead, MultiRoIsBBoxHead
from .multirois_variants import (AttRoIsBBoxHead, MultiBBoxHeadConvs,
                                 MultiBBoxHeadDeform, MultiBBoxHeadDualWS,
                                 MultiBBoxHeadOffset, MultiBBoxHeadPool,
                                 MultiRoIsBBoxHeadConvs,
                                 MultiRoIsBBoxHeadDeform,
                                 MultiRoIsBBoxHeadDualWS,
                                 MultiRoIsBBoxHeadOffset,
                                 MultiRoIsBBoxHeadPool)

__all__ = ['BBoxHead', 'ConvFCBBoxHead', 'Shared2FCBBoxHead',
           'Shared4Conv1FCBBoxHead', 'DoubleConvFCBBoxHead', 'MultiBBoxHead',
           'MultiRoIsBBoxHead',
           'MultiClassesBBoxHead', 'Shared2FCMultiClassesBBoxHead',
           'MultiBBoxHeadPool', 'MultiRoIsBBoxHeadPool',
           'MultiBBoxHeadConvs', 'MultiRoIsBBoxHeadConvs',
           'MultiBBoxHeadOffset', 'MultiRoIsBBoxHeadOffset',
           'MultiBBoxHeadDualWS', 'MultiRoIsBBoxHeadDualWS',
           'MultiBBoxHeadDeform', 'MultiRoIsBBoxHeadDeform',
           'AttRoIsBBoxHead']
