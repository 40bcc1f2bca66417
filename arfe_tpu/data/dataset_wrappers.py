"""Dataset wrappers (ref: mmdet/datasets/dataset_wrappers.py:11-180)."""
from __future__ import annotations

import bisect
import math
from collections import defaultdict

import numpy as np

from ..registry import DATASETS


@DATASETS.register_module()
class ConcatDataset:
    def __init__(self, datasets):
        self.datasets = list(datasets)
        self.CLASSES = self.datasets[0].CLASSES
        self.cumulative_sizes = np.cumsum(
            [len(d) for d in self.datasets]).tolist()
        if all(hasattr(d, 'flag') for d in self.datasets):
            self.flag = np.concatenate([d.flag for d in self.datasets])

    def __len__(self):
        return self.cumulative_sizes[-1]

    def __getitem__(self, idx):
        ds = bisect.bisect_right(self.cumulative_sizes, idx)
        local = idx if ds == 0 else idx - self.cumulative_sizes[ds - 1]
        return self.datasets[ds][local]

    def get_ann_info(self, idx):
        ds = bisect.bisect_right(self.cumulative_sizes, idx)
        local = idx if ds == 0 else idx - self.cumulative_sizes[ds - 1]
        return self.datasets[ds].get_ann_info(local)


@DATASETS.register_module()
class RepeatDataset:
    def __init__(self, dataset, times):
        self.dataset = dataset
        self.times = times
        self.CLASSES = dataset.CLASSES
        if hasattr(dataset, 'flag'):
            self.flag = np.tile(dataset.flag, times)
        self._ori_len = len(dataset)

    def __len__(self):
        return self.times * self._ori_len

    def __getitem__(self, idx):
        return self.dataset[idx % self._ori_len]

    def get_ann_info(self, idx):
        return self.dataset.get_ann_info(idx % self._ori_len)


@DATASETS.register_module()
class ClassBalancedDataset:
    """Oversample images containing rare categories
    (ref: dataset_wrappers.py:82-180)."""

    def __init__(self, dataset, oversample_thr):
        self.dataset = dataset
        self.oversample_thr = oversample_thr
        self.CLASSES = dataset.CLASSES
        repeat_factors = self._get_repeat_factors(dataset, oversample_thr)
        repeat_indices = []
        for idx, rf in enumerate(repeat_factors):
            repeat_indices.extend([idx] * math.ceil(rf))
        self.repeat_indices = repeat_indices
        if hasattr(dataset, 'flag'):
            self.flag = np.asarray(
                [dataset.flag[i] for i in repeat_indices], dtype=np.uint8)

    def _get_repeat_factors(self, dataset, repeat_thr):
        category_freq = defaultdict(float)
        num_images = len(dataset)
        for idx in range(num_images):
            cat_ids = set(dataset.get_ann_info(idx)['labels'].tolist())
            for cat_id in cat_ids:
                category_freq[cat_id] += 1
        for k in category_freq:
            category_freq[k] /= num_images
        category_repeat = {
            cat_id: max(1.0, math.sqrt(repeat_thr / cat_freq))
            for cat_id, cat_freq in category_freq.items()}
        repeat_factors = []
        for idx in range(num_images):
            cat_ids = set(dataset.get_ann_info(idx)['labels'].tolist())
            rf = max([category_repeat[c] for c in cat_ids], default=1.0)
            repeat_factors.append(rf)
        return repeat_factors

    def __len__(self):
        return len(self.repeat_indices)

    def __getitem__(self, idx):
        return self.dataset[self.repeat_indices[idx]]

    def get_ann_info(self, idx):
        return self.dataset.get_ann_info(self.repeat_indices[idx])
