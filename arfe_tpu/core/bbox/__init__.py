from .assigners import (ATSSAssigner, CenterRegionAssigner,
                        MaxIoUAssigner)
from .coder import (DeltaXYWHBBoxCoder, PseudoBBoxCoder, TBLRBBoxCoder,
                    bbox2delta, delta2bbox)
from .iou import bbox_overlaps
from .samplers import (CombinedSampler, InstanceBalancedPosSampler,
                       IoUBalancedNegSampler, OHEMSampler, PseudoSampler,
                       RandomSampler, RandomSamplerPrior, ScoreHLRSampler)
from .transforms import (bbox2result, bbox2roi, bbox_area, bbox_center_wh,
                         bbox_flip, bbox_mapping, bbox_mapping_back,
                         distance2bbox, roi2bbox_list)

__all__ = [
    'MaxIoUAssigner', 'ATSSAssigner', 'CenterRegionAssigner',
    'RandomSampler', 'RandomSamplerPrior', 'PseudoSampler', 'OHEMSampler',
    'InstanceBalancedPosSampler', 'IoUBalancedNegSampler', 'ScoreHLRSampler',
    'CombinedSampler',
    'DeltaXYWHBBoxCoder', 'PseudoBBoxCoder', 'TBLRBBoxCoder', 'bbox2delta',
    'delta2bbox', 'bbox_overlaps', 'bbox2roi', 'bbox2result', 'bbox_flip',
    'bbox_mapping', 'bbox_mapping_back', 'distance2bbox', 'roi2bbox_list',
    'bbox_area', 'bbox_center_wh',
]
