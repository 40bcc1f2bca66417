"""Data pipeline transforms (host-side numpy/cv2).

TPU-native counterpart of ref: mmdet/datasets/pipelines/ (loading.py,
transforms.py, formating.py, test_aug.py, compose.py). Transforms operate on
mmdet-style ``results`` dicts so reference pipeline configs load unchanged.
The device boundary differs from the reference by design: the host pipeline
produces *statically padded* arrays (pad buckets bound XLA recompilation),
and normalization can optionally be deferred to the device.
"""
from __future__ import annotations

import os.path as osp

import cv2
import numpy as np

from ..registry import PIPELINES, build_from_cfg


class Compose:
    """(ref: pipelines/compose.py:9)."""

    def __init__(self, transforms):
        self.transforms = []
        for t in transforms:
            if isinstance(t, dict):
                self.transforms.append(build_from_cfg(t, PIPELINES))
            elif callable(t):
                self.transforms.append(t)
            else:
                raise TypeError('transform must be callable or a dict')

    def __call__(self, results):
        for t in self.transforms:
            results = t(results)
            if results is None:
                return None
        return results


@PIPELINES.register_module()
class LoadImageFromFile:
    """(ref: pipelines/loading.py:12-60). Loads BGR uint8 like mmcv."""

    def __init__(self, to_float32=False, color_type='color'):
        self.to_float32 = to_float32
        self.color_type = color_type

    def __call__(self, results):
        if results.get('img_prefix') is not None:
            filename = osp.join(results['img_prefix'],
                                results['img_info']['filename'])
        else:
            filename = results['img_info']['filename']
        flag = cv2.IMREAD_COLOR if self.color_type == 'color' \
            else cv2.IMREAD_GRAYSCALE
        img = cv2.imread(filename, flag)
        if img is None:
            raise FileNotFoundError(filename)
        if self.to_float32:
            img = img.astype(np.float32)
        results['filename'] = filename
        results['ori_filename'] = results['img_info']['filename']
        results['img'] = img
        results['img_shape'] = img.shape
        results['ori_shape'] = img.shape
        results['img_fields'] = ['img']
        return results


@PIPELINES.register_module()
class LoadImage:
    """Direct ndarray input (ref: apis/inference.py:51-66 LoadImage)."""

    def __call__(self, results):
        img = results['img']
        if isinstance(img, str):
            results['filename'] = img
            results['ori_filename'] = img
            img = cv2.imread(img, cv2.IMREAD_COLOR)
            results['img'] = img
        else:
            results['filename'] = None
            results['ori_filename'] = None
        results['img_shape'] = results['img'].shape
        results['ori_shape'] = results['img'].shape
        results['img_fields'] = ['img']
        return results


@PIPELINES.register_module()
class LoadAnnotations:
    """(ref: pipelines/loading.py:153-283)."""

    def __init__(self, with_bbox=True, with_label=True, with_mask=False,
                 with_seg=False, poly2mask=True):
        self.with_bbox = with_bbox
        self.with_label = with_label
        self.with_mask = with_mask
        self.with_seg = with_seg

    def __call__(self, results):
        ann = results['ann_info']
        if self.with_bbox:
            results['gt_bboxes'] = ann['bboxes'].copy()
            if ann.get('bboxes_ignore') is not None:
                results['gt_bboxes_ignore'] = ann['bboxes_ignore'].copy()
                results.setdefault('bbox_fields', []).append(
                    'gt_bboxes_ignore')
            results.setdefault('bbox_fields', []).append('gt_bboxes')
        if self.with_label:
            results['gt_labels'] = ann['labels'].copy()
        if self.with_mask:
            from ..core.mask import BitmapMasks, PolygonMasks
            h = results['img_info']['height']
            w = results['img_info']['width']
            raw = ann.get('masks') or []
            if raw and isinstance(raw[0], np.ndarray) and raw[0].ndim == 2:
                gt_masks = BitmapMasks(raw, h, w)
            else:
                polys = [[np.asarray(p, np.float32) for p in (m or [])]
                         for m in raw]
                gt_masks = PolygonMasks(polys, h, w).to_bitmap()
            results['gt_masks'] = gt_masks
            results.setdefault('mask_fields', []).append('gt_masks')
        return results


def _rescale_size(old_size, scale):
    """mmcv rescale semantics: scale=(long, short) max constraint."""
    w, h = old_size
    if isinstance(scale, (int, float)):
        scale_factor = scale
    else:
        max_long, max_short = max(scale), min(scale)
        scale_factor = min(max_long / max(h, w), max_short / min(h, w))
    new_w = int(w * scale_factor + 0.5)
    new_h = int(h * scale_factor + 0.5)
    return (new_w, new_h), scale_factor


@PIPELINES.register_module()
class Resize:
    """(ref: pipelines/transforms.py:25-190). Supports value/range multiscale
    and keep_ratio."""

    def __init__(self, img_scale=None, multiscale_mode='range',
                 ratio_range=None, keep_ratio=True):
        if img_scale is None:
            self.img_scale = None
        elif isinstance(img_scale, list):
            self.img_scale = [tuple(s) for s in img_scale]
        else:
            self.img_scale = [tuple(img_scale)]
        assert multiscale_mode in ('value', 'range')
        self.multiscale_mode = multiscale_mode
        self.ratio_range = ratio_range
        self.keep_ratio = keep_ratio

    def _random_scale(self, results):
        if self.ratio_range is not None:
            scale = self.img_scale[0]
            ratio = np.random.uniform(*self.ratio_range)
            scale = (int(scale[0] * ratio), int(scale[1] * ratio))
        elif len(self.img_scale) == 1:
            scale = self.img_scale[0]
        elif self.multiscale_mode == 'range':
            longs = [max(s) for s in self.img_scale]
            shorts = [min(s) for s in self.img_scale]
            long_edge = np.random.randint(min(longs), max(longs) + 1)
            short_edge = np.random.randint(min(shorts), max(shorts) + 1)
            scale = (long_edge, short_edge)
        else:  # value
            scale = self.img_scale[np.random.randint(len(self.img_scale))]
        results['scale'] = scale

    def __call__(self, results):
        if 'scale' not in results:
            self._random_scale(results)
        img = results['img']
        h, w = img.shape[:2]
        if self.keep_ratio:
            (new_w, new_h), _ = _rescale_size((w, h), results['scale'])
        else:
            new_w, new_h = results['scale']
        resized = cv2.resize(img, (new_w, new_h),
                             interpolation=cv2.INTER_LINEAR)
        w_scale = new_w / w
        h_scale = new_h / h
        results['img'] = resized
        results['img_shape'] = resized.shape
        results['pad_shape'] = resized.shape
        results['scale_factor'] = np.array(
            [w_scale, h_scale, w_scale, h_scale], dtype=np.float32)
        results['keep_ratio'] = self.keep_ratio
        for key in results.get('bbox_fields', []):
            bboxes = results[key] * results['scale_factor']
            bboxes[:, 0::2] = np.clip(bboxes[:, 0::2], 0, new_w)
            bboxes[:, 1::2] = np.clip(bboxes[:, 1::2], 0, new_h)
            results[key] = bboxes
        for key in results.get('mask_fields', []):
            if results.get(key) is not None:
                results[key] = results[key].resize((new_h, new_w))
        return results


@PIPELINES.register_module()
class RandomFlip:
    """(ref: pipelines/transforms.py:192-260)."""

    def __init__(self, flip_ratio=None, direction='horizontal'):
        self.flip_ratio = flip_ratio
        self.direction = direction

    def __call__(self, results):
        if 'flip' not in results:
            results['flip'] = (self.flip_ratio is not None
                               and np.random.rand() < self.flip_ratio)
        if 'flip_direction' not in results:
            results['flip_direction'] = self.direction
        if results['flip']:
            axis = 1 if results['flip_direction'] == 'horizontal' else 0
            results['img'] = np.flip(results['img'], axis=axis).copy()
            h, w = results['img'].shape[:2]
            for key in results.get('bbox_fields', []):
                bboxes = results[key].copy()
                if results['flip_direction'] == 'horizontal':
                    bboxes[:, 0::4] = w - results[key][:, 2::4]
                    bboxes[:, 2::4] = w - results[key][:, 0::4]
                else:
                    bboxes[:, 1::4] = h - results[key][:, 3::4]
                    bboxes[:, 3::4] = h - results[key][:, 1::4]
                results[key] = bboxes
            for key in results.get('mask_fields', []):
                if results.get(key) is not None:
                    results[key] = results[key].flip(
                        results['flip_direction'])
        return results


@PIPELINES.register_module()
class Normalize:
    """(ref: pipelines/transforms.py:319-347)."""

    def __init__(self, mean, std, to_rgb=True):
        self.mean = np.array(mean, dtype=np.float32)
        self.std = np.array(std, dtype=np.float32)
        self.to_rgb = to_rgb

    def __call__(self, results):
        img = results['img'].astype(np.float32)
        if self.to_rgb:
            img = img[..., ::-1]
        img = (img - self.mean) / self.std
        results['img'] = img
        results['img_norm_cfg'] = dict(mean=self.mean, std=self.std,
                                       to_rgb=self.to_rgb)
        return results


@PIPELINES.register_module()
class Pad:
    """(ref: pipelines/transforms.py:262-317). Pads bottom/right to ``size``
    or to a multiple of ``size_divisor``."""

    def __init__(self, size=None, size_divisor=None, pad_val=0):
        self.size = size
        self.size_divisor = size_divisor
        self.pad_val = pad_val
        assert (size is None) != (size_divisor is None)

    def __call__(self, results):
        img = results['img']
        h, w = img.shape[:2]
        if self.size is not None:
            th, tw = self.size
        else:
            th = ((h + self.size_divisor - 1)
                  // self.size_divisor) * self.size_divisor
            tw = ((w + self.size_divisor - 1)
                  // self.size_divisor) * self.size_divisor
        padded = np.full((th, tw) + img.shape[2:], self.pad_val,
                         dtype=img.dtype)
        padded[:h, :w] = img
        results['img'] = padded
        results['pad_shape'] = padded.shape
        results['pad_fixed_size'] = self.size
        results['pad_size_divisor'] = self.size_divisor
        return results


@PIPELINES.register_module()
class RandomCrop:
    """(ref: pipelines/transforms.py:349-410)."""

    def __init__(self, crop_size):
        self.crop_size = crop_size

    def __call__(self, results):
        img = results['img']
        margin_h = max(img.shape[0] - self.crop_size[0], 0)
        margin_w = max(img.shape[1] - self.crop_size[1], 0)
        offset_h = np.random.randint(0, margin_h + 1)
        offset_w = np.random.randint(0, margin_w + 1)
        crop_y1, crop_y2 = offset_h, offset_h + self.crop_size[0]
        crop_x1, crop_x2 = offset_w, offset_w + self.crop_size[1]
        img = img[crop_y1:crop_y2, crop_x1:crop_x2, ...]
        results['img'] = img
        results['img_shape'] = img.shape
        for key in results.get('bbox_fields', []):
            offset = np.array([offset_w, offset_h] * 2, dtype=np.float32)
            bboxes = results[key] - offset
            bboxes[:, 0::2] = np.clip(bboxes[:, 0::2], 0, img.shape[1])
            bboxes[:, 1::2] = np.clip(bboxes[:, 1::2], 0, img.shape[0])
            results[key] = bboxes
        if 'gt_bboxes' in results:
            gt = results['gt_bboxes']
            valid = (gt[:, 2] > gt[:, 0]) & (gt[:, 3] > gt[:, 1])
            if not valid.any():
                return None
            results['gt_bboxes'] = gt[valid]
            if 'gt_labels' in results:
                results['gt_labels'] = results['gt_labels'][valid]
        return results


@PIPELINES.register_module()
class PhotoMetricDistortion:
    """(ref: pipelines/transforms.py:434-526)."""

    def __init__(self, brightness_delta=32, contrast_range=(0.5, 1.5),
                 saturation_range=(0.5, 1.5), hue_delta=18):
        self.brightness_delta = brightness_delta
        self.contrast_lower, self.contrast_upper = contrast_range
        self.saturation_lower, self.saturation_upper = saturation_range
        self.hue_delta = hue_delta

    def __call__(self, results):
        img = results['img'].astype(np.float32)
        if np.random.randint(2):
            img += np.random.uniform(-self.brightness_delta,
                                     self.brightness_delta)
        mode = np.random.randint(2)
        if mode == 1 and np.random.randint(2):
            img *= np.random.uniform(self.contrast_lower,
                                     self.contrast_upper)
        hsv = cv2.cvtColor(np.clip(img, 0, 255).astype(np.uint8),
                           cv2.COLOR_BGR2HSV).astype(np.float32)
        if np.random.randint(2):
            hsv[..., 1] *= np.random.uniform(self.saturation_lower,
                                             self.saturation_upper)
        if np.random.randint(2):
            hsv[..., 0] = (hsv[..., 0] + np.random.uniform(
                -self.hue_delta, self.hue_delta)) % 180
        hsv[..., 1] = np.clip(hsv[..., 1], 0, 255)
        img = cv2.cvtColor(hsv.astype(np.uint8),
                           cv2.COLOR_HSV2BGR).astype(np.float32)
        if mode == 0 and np.random.randint(2):
            img *= np.random.uniform(self.contrast_lower,
                                     self.contrast_upper)
        results['img'] = img
        return results


@PIPELINES.register_module()
class Expand:
    """(ref: pipelines/transforms.py:528-596)."""

    def __init__(self, mean=(0, 0, 0), to_rgb=True, ratio_range=(1, 4)):
        self.mean = mean if not to_rgb else mean[::-1]
        self.ratio_range = ratio_range

    def __call__(self, results):
        if np.random.randint(2):
            return results
        img = results['img']
        h, w, c = img.shape
        ratio = np.random.uniform(*self.ratio_range)
        expand_img = np.full((int(h * ratio), int(w * ratio), c),
                             self.mean, dtype=img.dtype)
        left = int(np.random.uniform(0, w * ratio - w))
        top = int(np.random.uniform(0, h * ratio - h))
        expand_img[top:top + h, left:left + w] = img
        results['img'] = expand_img
        results['img_shape'] = expand_img.shape
        for key in results.get('bbox_fields', []):
            results[key] = results[key] + np.array(
                [left, top] * 2, dtype=np.float32)
        return results


@PIPELINES.register_module()
class MinIoURandomCrop:
    """(ref: pipelines/transforms.py:598-690)."""

    def __init__(self, min_ious=(0.1, 0.3, 0.5, 0.7, 0.9), min_crop_size=0.3):
        self.min_ious = (1, *min_ious, 0)
        self.min_crop_size = min_crop_size

    def __call__(self, results):
        from ..core.evaluation.mean_ap import bbox_overlaps_np
        img = results['img']
        h, w, _ = img.shape
        boxes = results.get('gt_bboxes', np.empty((0, 4)))
        while True:
            mode = self.min_ious[np.random.randint(len(self.min_ious))]
            if mode == 1:
                return results
            for _ in range(50):
                new_w = np.random.uniform(self.min_crop_size * w, w)
                new_h = np.random.uniform(self.min_crop_size * h, h)
                if new_h / new_w < 0.5 or new_h / new_w > 2:
                    continue
                left = np.random.uniform(w - new_w)
                top = np.random.uniform(h - new_h)
                patch = np.array([int(left), int(top), int(left + new_w),
                                  int(top + new_h)])
                if len(boxes) and bbox_overlaps_np(
                        patch[None].astype(float), boxes).min() < mode:
                    continue
                if len(boxes):
                    ctr = (boxes[:, :2] + boxes[:, 2:]) / 2
                    mask = ((ctr[:, 0] > patch[0]) & (ctr[:, 1] > patch[1])
                            & (ctr[:, 0] < patch[2])
                            & (ctr[:, 1] < patch[3]))
                    if not mask.any():
                        continue
                    boxes_c = boxes[mask].copy()
                    boxes_c[:, 2:] = boxes_c[:, 2:].clip(max=patch[2:])
                    boxes_c[:, :2] = boxes_c[:, :2].clip(min=patch[:2])
                    boxes_c -= np.tile(patch[:2], 2)
                    results['gt_bboxes'] = boxes_c
                    if 'gt_labels' in results:
                        results['gt_labels'] = results['gt_labels'][mask]
                results['img'] = img[patch[1]:patch[3],
                                     patch[0]:patch[2]]
                results['img_shape'] = results['img'].shape
                return results


@PIPELINES.register_module()
class DefaultFormatBundle:
    """(ref: pipelines/formating.py:101-140) — arrays stay numpy (no
    DataContainer on TPU); images stay HWC (NHWC is the device layout)."""

    def __call__(self, results):
        if 'img' in results:
            results['img'] = np.ascontiguousarray(
                results['img'].astype(np.float32))
        for key in ('gt_bboxes', 'gt_bboxes_ignore'):
            if key in results:
                results[key] = results[key].astype(np.float32)
        if 'gt_labels' in results:
            results['gt_labels'] = results['gt_labels'].astype(np.int32)
        return results


@PIPELINES.register_module()
class ImageToTensor:
    """Test-path formatting (ref: formating.py) — keeps HWC numpy."""

    def __init__(self, keys=('img',)):
        self.keys = keys

    def __call__(self, results):
        for key in self.keys:
            results[key] = np.ascontiguousarray(
                results[key].astype(np.float32))
        return results


@PIPELINES.register_module()
class Collect:
    """(ref: pipelines/formating.py:141-189)."""

    DEFAULT_META = ('filename', 'ori_filename', 'ori_shape', 'img_shape',
                    'pad_shape', 'scale_factor', 'flip', 'flip_direction',
                    'img_norm_cfg')

    def __init__(self, keys, meta_keys=DEFAULT_META):
        self.keys = keys
        self.meta_keys = meta_keys

    def __call__(self, results):
        data = {}
        img_meta = {k: results.get(k) for k in self.meta_keys}
        data['img_metas'] = img_meta
        for key in self.keys:
            data[key] = results[key]
        return data


@PIPELINES.register_module()
class MultiScaleFlipAug:
    """(ref: pipelines/test_aug.py:8-78)."""

    def __init__(self, transforms, img_scale, flip=False,
                 flip_direction='horizontal'):
        self.transforms = Compose(transforms)
        self.img_scale = img_scale if isinstance(img_scale, list) \
            else [img_scale]
        self.img_scale = [tuple(s) for s in self.img_scale]
        self.flip = flip
        self.flip_direction = flip_direction if isinstance(
            flip_direction, list) else [flip_direction]

    def __call__(self, results):
        aug_data = []
        flip_args = [(False, None)]
        if self.flip:
            flip_args += [(True, d) for d in self.flip_direction]
        for scale in self.img_scale:
            for flip, direction in flip_args:
                _results = dict(results)
                _results['scale'] = scale
                _results['flip'] = flip
                _results['flip_direction'] = direction
                aug_data.append(self.transforms(_results))
        # collate list of dicts -> dict of lists
        return {k: [d[k] for d in aug_data] for k in aug_data[0]}


@PIPELINES.register_module()
class Corrupt:
    """Apply an ImageNet-C-style corruption
    (ref: datasets/pipelines/transforms.py:692-711; corruption math in
    data/corruptions.py — self-contained, no imagecorruptions dep)."""

    def __init__(self, corruption, severity=1):
        self.corruption = corruption
        self.severity = severity

    def __call__(self, results):
        from .corruptions import corrupt
        results['img'] = corrupt(results['img'].astype(np.uint8),
                                 corruption_name=self.corruption,
                                 severity=self.severity)
        return results

    def __repr__(self):
        return (f'{self.__class__.__name__}(corruption={self.corruption}, '
                f'severity={self.severity})')


@PIPELINES.register_module()
class SegRescale:
    """Rescale the semantic segmentation map by ``scale_factor``
    (ref: transforms.py SegRescale; used by HTC)."""

    def __init__(self, scale_factor=1):
        self.scale_factor = scale_factor

    def __call__(self, results):
        for key in results.get('seg_fields', ['gt_semantic_seg']):
            if key in results and self.scale_factor != 1:
                seg = results[key]
                h, w = seg.shape[:2]
                results[key] = cv2.resize(
                    seg, (int(w * self.scale_factor),
                          int(h * self.scale_factor)),
                    interpolation=cv2.INTER_NEAREST)
        return results


@PIPELINES.register_module()
class LoadProposals:
    """Load precomputed proposals from results['proposals']
    (ref: pipelines/loading.py:284-310)."""

    def __init__(self, num_max_proposals=None):
        self.num_max_proposals = num_max_proposals

    def __call__(self, results):
        proposals = results['proposals']
        if proposals.shape[1] not in (4, 5):
            raise AssertionError(
                'proposals should have shapes (n, 4) or (n, 5), '
                f'but found {proposals.shape}')
        proposals = proposals[:, :4]
        if self.num_max_proposals is not None:
            proposals = proposals[:self.num_max_proposals]
        if len(proposals) == 0:
            proposals = np.array([[0, 0, 0, 0]], dtype=np.float32)
        results['proposals'] = proposals.astype(np.float32)
        results.setdefault('bbox_fields', []).append('proposals')
        return results


@PIPELINES.register_module()
class Transpose:
    """(ref: pipelines/formating.py Transpose)."""

    def __init__(self, keys, order):
        self.keys = keys
        self.order = order

    def __call__(self, results):
        for key in self.keys:
            results[key] = results[key].transpose(self.order)
        return results


@PIPELINES.register_module()
class ToDataContainer:
    """Compatibility shim (ref: formating.py ToDataContainer) — the TPU
    pipeline has no DataContainer; fields pass through unchanged so
    reference configs load."""

    def __init__(self, fields=None):
        self.fields = fields

    def __call__(self, results):
        return results


@PIPELINES.register_module()
class ToTensor:
    """(ref: formating.py ToTensor) — numpy arrays are the device format."""

    def __init__(self, keys):
        self.keys = keys

    def __call__(self, results):
        for key in self.keys:
            results[key] = np.asarray(results[key])
        return results


@PIPELINES.register_module()
class WrapFieldsToLists:
    """Wrap every field into a single-element list
    (ref: formating.py WrapFieldsToLists)."""

    def __call__(self, results):
        return {k: [v] for k, v in results.items()}


@PIPELINES.register_module()
class Albu:
    """Albumentations wrapper (ref: transforms.py:715-830). The
    ``albumentations`` package is not available in this environment; this
    raises at build time with a clear message rather than silently
    skipping augmentation."""

    def __init__(self, *args, **kwargs):
        try:
            import albumentations  # noqa: F401
        except ImportError as e:
            raise ImportError(
                'the Albu transform requires the albumentations package, '
                'which is not installed in this environment') from e


@PIPELINES.register_module()
class InstaBoost:
    """InstaBoost wrapper (ref: pipelines/instaboost.py). Requires the
    ``instaboostfast`` package, not available here; raises at build time."""

    def __init__(self, *args, **kwargs):
        try:
            import instaboostfast  # noqa: F401
        except ImportError as e:
            raise ImportError(
                'the InstaBoost transform requires instaboostfast, '
                'which is not installed in this environment') from e
