from .bbox_heads import (BBoxHead, ConvFCBBoxHead, DoubleConvFCBBoxHead,
                         MultiBBoxHead,
                         MultiClassesBBoxHead, MultiRoIsBBoxHead,
                         Shared2FCBBoxHead, Shared2FCMultiClassesBBoxHead,
                         Shared4Conv1FCBBoxHead)
from .cascade_roi_head import CascadeRoIHead
from .grid_roi_head import GridRoIHead
from .htc_roi_head import HybridTaskCascadeRoIHead
from .double_roi_head import DoubleHeadRoIHead
from .mask_heads import (FCNMaskHead, FusedSemanticHead, GridHead,
                         HTCMaskHead, MaskIoUHead)
from .mask_scoring_roi_head import MaskScoringRoIHead
from .pisa_roi_head import PISARoIHead
from .roi_extractors import SingleRoIExtractor
from .shared_heads import ResLayer
from .standard_roi_head import StandardRoIHead, StandardRoIHeadPrior

__all__ = ['BBoxHead', 'ConvFCBBoxHead', 'Shared2FCBBoxHead',
           'Shared4Conv1FCBBoxHead', 'MultiBBoxHead', 'MultiRoIsBBoxHead',
           'MultiClassesBBoxHead', 'Shared2FCMultiClassesBBoxHead',
           'SingleRoIExtractor', 'StandardRoIHead', 'StandardRoIHeadPrior',
           'CascadeRoIHead', 'HybridTaskCascadeRoIHead', 'FCNMaskHead',
           'DoubleHeadRoIHead', 'DoubleConvFCBBoxHead', 'MaskIoUHead',
           'MaskScoringRoIHead', 'HTCMaskHead', 'FusedSemanticHead',
           'GridHead', 'GridRoIHead', 'PISARoIHead', 'ResLayer']
