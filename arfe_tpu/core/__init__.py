from .anchor import AnchorGenerator, LegacyAnchorGenerator, PointGenerator
from .bbox import (DeltaXYWHBBoxCoder, PseudoBBoxCoder, TBLRBBoxCoder,
                   bbox2delta, bbox2result, bbox2roi, bbox_flip, bbox_mapping,
                   bbox_mapping_back, bbox_overlaps, delta2bbox,
                   distance2bbox)
from .post import multiclass_nms

__all__ = [
    'AnchorGenerator', 'LegacyAnchorGenerator', 'PointGenerator',
    'DeltaXYWHBBoxCoder', 'PseudoBBoxCoder', 'TBLRBBoxCoder', 'bbox2delta',
    'delta2bbox', 'bbox_overlaps', 'bbox2roi', 'bbox2result', 'bbox_flip',
    'bbox_mapping', 'bbox_mapping_back', 'distance2bbox', 'multiclass_nms',
]
