"""Mask containers (host-side numpy).

TPU-native counterpart of ref: mmdet/core/mask/structures.py:59-533
(BitmapMasks / PolygonMasks with rescale/resize/flip/crop/crop_and_resize/
expand). The TPU-relevant addition is :meth:`BitmapMasks.to_fixed_crops`,
which converts per-instance masks into fixed-size per-gt-box crops so mask
targets become a static-shape device-side resample (the TF-TPU Mask R-CNN
formulation) instead of the reference's per-roi CPU rasterization
(ref: core/mask/mask_target.py).
"""
from __future__ import annotations

import cv2
import numpy as np


class BitmapMasks:
    """(ref: structures.py:59-283)."""

    def __init__(self, masks, height, width):
        self.height = height
        self.width = width
        if len(masks) == 0:
            self.masks = np.empty((0, height, width), dtype=np.uint8)
        else:
            masks = np.stack(masks).reshape(-1, height, width) \
                if isinstance(masks, (list, tuple)) else masks
            self.masks = masks.astype(np.uint8)

    def __getitem__(self, index):
        masks = self.masks[index].reshape(-1, self.height, self.width)
        return BitmapMasks(masks, self.height, self.width)

    def __len__(self):
        return len(self.masks)

    @property
    def areas(self):
        return self.masks.sum((1, 2))

    def rescale(self, scale, interpolation='nearest'):
        if len(self.masks) == 0:
            if isinstance(scale, (int, float)):
                f = scale
            else:
                max_long, max_short = max(scale), min(scale)
                f = min(max_long / max(self.height, self.width),
                        max_short / min(self.height, self.width))
            new_h = int(self.height * f + 0.5)
            new_w = int(self.width * f + 0.5)
            return BitmapMasks(np.empty((0, new_h, new_w), np.uint8),
                               new_h, new_w)
        new = [self._imrescale(m, scale) for m in self.masks]
        h, w = new[0].shape
        return BitmapMasks(np.stack(new), h, w)

    @staticmethod
    def _imrescale(img, scale):
        h, w = img.shape
        if isinstance(scale, (int, float)):
            f = scale
        else:
            max_long, max_short = max(scale), min(scale)
            f = min(max_long / max(h, w), max_short / min(h, w))
        return cv2.resize(img, (int(w * f + 0.5), int(h * f + 0.5)),
                          interpolation=cv2.INTER_NEAREST)

    def resize(self, out_shape, interpolation='nearest'):
        if len(self.masks) == 0:
            return BitmapMasks(np.empty((0, *out_shape), np.uint8),
                               *out_shape)
        new = np.stack([
            cv2.resize(m, (out_shape[1], out_shape[0]),
                       interpolation=cv2.INTER_NEAREST)
            for m in self.masks])
        return BitmapMasks(new, *out_shape)

    def flip(self, flip_direction='horizontal'):
        assert flip_direction in ('horizontal', 'vertical')
        axis = 2 if flip_direction == 'horizontal' else 1
        return BitmapMasks(np.flip(self.masks, axis=axis).copy(),
                           self.height, self.width)

    def pad(self, out_shape, pad_val=0):
        padded = np.full((len(self.masks), *out_shape), pad_val, np.uint8)
        padded[:, :self.height, :self.width] = self.masks
        return BitmapMasks(padded, *out_shape)

    def crop(self, bbox):
        x1, y1, x2, y2 = bbox.astype(int)
        w = max(x2 - x1, 1)
        h = max(y2 - y1, 1)
        cropped = self.masks[:, y1:y1 + h, x1:x1 + w]
        return BitmapMasks(cropped, h, w)

    def crop_and_resize(self, bboxes, out_shape, inds=None):
        """Crop each mask by its box and resize (the mask-target op,
        ref: structures.py:204-243)."""
        if inds is None:
            inds = np.arange(len(bboxes))
        out = np.zeros((len(bboxes), *out_shape), np.float32)
        for i, (box, ind) in enumerate(zip(bboxes, inds)):
            x1, y1, x2, y2 = box
            w = max(x2 - x1, 1e-2)
            h = max(y2 - y1, 1e-2)
            mask = self.masks[int(ind)]
            xi1 = int(np.clip(np.floor(x1), 0, self.width))
            yi1 = int(np.clip(np.floor(y1), 0, self.height))
            xi2 = int(np.clip(np.ceil(x2), 0, self.width))
            yi2 = int(np.clip(np.ceil(y2), 0, self.height))
            patch = mask[yi1:max(yi2, yi1 + 1), xi1:max(xi2, xi1 + 1)]
            out[i] = cv2.resize(patch.astype(np.float32),
                                (out_shape[1], out_shape[0]),
                                interpolation=cv2.INTER_LINEAR)
        return out

    def expand(self, expanded_h, expanded_w, top, left):
        expanded = np.zeros((len(self.masks), expanded_h, expanded_w),
                            np.uint8)
        expanded[:, top:top + self.height, left:left + self.width] = \
            self.masks
        return BitmapMasks(expanded, expanded_h, expanded_w)

    def to_ndarray(self):
        return self.masks

    def to_fixed_crops(self, gt_bboxes, crop_size=112):
        """Per-gt fixed-size mask crops for static-shape TPU mask targets:
        each gt mask cropped to its gt box and resized to
        (crop_size, crop_size) float32."""
        return self.crop_and_resize(gt_bboxes, (crop_size, crop_size))


class PolygonMasks:
    """(ref: structures.py:284-533). Stored as lists of polygons; rasterize
    via :meth:`to_bitmap`."""

    def __init__(self, masks, height, width):
        self.height = height
        self.width = width
        self.masks = masks  # list[list[np.ndarray]] per instance

    def __len__(self):
        return len(self.masks)

    def __getitem__(self, index):
        if isinstance(index, np.ndarray):
            index = np.where(index)[0].tolist() \
                if index.dtype == bool else index.tolist()
        if isinstance(index, list):
            masks = [self.masks[i] for i in index]
        else:
            masks = [self.masks[index]]
        return PolygonMasks(masks, self.height, self.width)

    def rescale(self, scale):
        if isinstance(scale, (int, float)):
            f = scale
        else:
            max_long, max_short = max(scale), min(scale)
            f = min(max_long / max(self.height, self.width),
                    max_short / min(self.height, self.width))
        new_h = int(self.height * f + 0.5)
        new_w = int(self.width * f + 0.5)
        masks = [[p * f for p in poly] for poly in self.masks]
        return PolygonMasks(masks, new_h, new_w)

    def resize(self, out_shape):
        h_scale = out_shape[0] / self.height
        w_scale = out_shape[1] / self.width
        masks = []
        for poly in self.masks:
            new_poly = []
            for p in poly:
                p = p.copy()
                p[0::2] *= w_scale
                p[1::2] *= h_scale
                new_poly.append(p)
            masks.append(new_poly)
        return PolygonMasks(masks, *out_shape)

    def flip(self, flip_direction='horizontal'):
        masks = []
        for poly in self.masks:
            new_poly = []
            for p in poly:
                p = p.copy()
                if flip_direction == 'horizontal':
                    p[0::2] = self.width - p[0::2]
                else:
                    p[1::2] = self.height - p[1::2]
                new_poly.append(p)
            masks.append(new_poly)
        return PolygonMasks(masks, self.height, self.width)

    def to_bitmap(self):
        bitmaps = []
        for poly in self.masks:
            m = np.zeros((self.height, self.width), np.uint8)
            pts = [np.asarray(p).reshape(-1, 2).astype(np.int32)
                   for p in poly]
            cv2.fillPoly(m, pts, 1)
            bitmaps.append(m)
        return BitmapMasks(bitmaps if bitmaps else
                           np.empty((0, self.height, self.width), np.uint8),
                           self.height, self.width)

    def to_ndarray(self):
        return self.to_bitmap().masks
