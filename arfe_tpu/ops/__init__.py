from .attention_ops import (CARAFEPack, ContextBlock, ConvWS2d,
                            GeneralizedAttention, MaskedConv2d, carafe)
from .deform_conv import DeformConv2d, ModulatedDeformConv2d, deform_conv2d
from .deform_pool import (DeformRoIPooling, DeformRoIPoolingPack,
                          ModulatedDeformRoIPoolingPack, deform_roi_pooling)
from .nms import batched_nms, nms, nms_match, soft_nms
from .non_local import NonLocal2D
from .roi_align import map_roi_levels, roi_align, roi_align_pyramid, roi_pool

__all__ = ['DeformRoIPooling', 'DeformRoIPoolingPack',
           'ModulatedDeformRoIPoolingPack', 'deform_roi_pooling',
           'nms', 'soft_nms', 'batched_nms', 'nms_match', 'NonLocal2D',
           'roi_align', 'roi_align_pyramid', 'roi_pool', 'map_roi_levels',
           'DeformConv2d', 'ModulatedDeformConv2d', 'deform_conv2d',
           'ContextBlock', 'GeneralizedAttention', 'ConvWS2d',
           'MaskedConv2d', 'carafe', 'CARAFEPack']
