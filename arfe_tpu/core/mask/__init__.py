from .mask_target import mask_target_from_crops, paste_masks_np
from .structures import BitmapMasks, PolygonMasks

__all__ = ['BitmapMasks', 'PolygonMasks', 'mask_target_from_crops',
           'paste_masks_np']
