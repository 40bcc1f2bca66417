from .mask_target import mask_target_from_crops, paste_masks_np
from .rle import (ann_to_mask, mask_iou, mask_to_rle, rle_area,
                  rle_to_bbox, rle_to_mask, split_combined_polys)
from .structures import BitmapMasks, PolygonMasks

__all__ = ['BitmapMasks', 'PolygonMasks', 'mask_to_rle', 'rle_to_mask',
           'rle_area', 'rle_to_bbox', 'ann_to_mask', 'mask_iou',
           'mask_target_from_crops',
           'paste_masks_np', 'split_combined_polys']
