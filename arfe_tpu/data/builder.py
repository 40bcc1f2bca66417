"""Dataset / dataloader construction.

TPU-native counterpart of ref: mmdet/datasets/builder.py:49-135 +
samplers/group_sampler.py. Differences by design:
- batches are padded to STATIC shape buckets (one per aspect-ratio group,
  SURVEY.md §7) so XLA compiles at most two programs instead of per-shape;
- gt arrays are padded to ``max_gt`` with validity masks;
- loading/decoding runs in a thread pool (cv2 releases the GIL) with a
  prefetch queue instead of forked worker processes.
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from ..registry import DATASETS, build_from_cfg


def build_dataset(cfg, default_args=None):
    """(ref: datasets/builder.py:49-66)."""
    from .dataset_wrappers import (ClassBalancedDataset, ConcatDataset,
                                   RepeatDataset)
    if isinstance(cfg, (list, tuple)):
        return ConcatDataset([build_dataset(c, default_args) for c in cfg])
    if cfg['type'] == 'RepeatDataset':
        return RepeatDataset(build_dataset(cfg['dataset'], default_args),
                             cfg['times'])
    if cfg['type'] == 'ClassBalancedDataset':
        return ClassBalancedDataset(
            build_dataset(cfg['dataset'], default_args),
            cfg['oversample_thr'])
    return build_from_cfg(cfg, DATASETS, default_args)


class GroupBatchSampler:
    """Aspect-ratio-grouped batch index sampler
    (ref: samplers/group_sampler.py:10-49): batches come from one group;
    each group's indices are shuffled per epoch and padded to a multiple of
    the batch size."""

    def __init__(self, flags, samples_per_batch, shuffle=True, seed=0):
        self.flags = np.asarray(flags)
        self.bs = samples_per_batch
        self.shuffle = shuffle
        self.seed = seed
        self.epoch = 0

    def __iter__(self):
        rng = np.random.RandomState(self.seed + self.epoch)
        batches = []
        for flag in np.unique(self.flags):
            inds = np.where(self.flags == flag)[0]
            if self.shuffle:
                inds = inds[rng.permutation(len(inds))]
            pad = (-len(inds)) % self.bs
            if pad and self.shuffle:
                inds = np.concatenate([inds, inds[:pad]])
            for i in range(0, len(inds) - self.bs + 1, self.bs):
                batches.append(inds[i:i + self.bs])
            if not self.shuffle and len(inds) % self.bs:
                batches.append(inds[len(inds) - len(inds) % self.bs:])
        if self.shuffle:
            batches = [batches[i] for i in rng.permutation(len(batches))]
        return iter(batches)

    def __len__(self):
        n = 0
        for flag in np.unique(self.flags):
            cnt = int((self.flags == flag).sum())
            if self.shuffle:
                n += (cnt + self.bs - 1) // self.bs
            else:
                n += (cnt + self.bs - 1) // self.bs
        return n


def _pad_image(img, shape):
    th, tw = shape
    h, w = img.shape[:2]
    assert h <= th and w <= tw, f'image {h}x{w} exceeds bucket {th}x{tw}'
    out = np.zeros((th, tw, img.shape[2]), dtype=np.float32)
    out[:h, :w] = img
    return out


def collate_detection(samples, static_shapes=None, max_gt=100,
                      test_mode=False, mask_crop_size=112):
    """Stack pipeline outputs into a static-shape batch dict.

    Returns dict(img (B,H,W,3), img_shape (B,2), scale_factor (B,4),
    gt_bboxes (B,G,4), gt_valid (B,G), gt_labels (B,G), img_metas list).
    """
    # MultiScaleFlipAug emits dict-of-lists; with >1 aug, collate each aug
    # position into its own batch and return them under 'augs' (the TTA
    # driver feeds them to model.aug_test)
    n_augs = 1
    if samples and isinstance(samples[0].get('img'), list):
        n_augs = len(samples[0]['img'])
    if n_augs > 1:
        aug_batches = []
        for a in range(n_augs):
            aug_samples = [{k: (v[a] if isinstance(v, list) else v)
                            for k, v in s.items()} for s in samples]
            aug_batches.append(collate_detection(
                aug_samples, static_shapes, max_gt, test_mode,
                mask_crop_size))
        return {'augs': aug_batches,
                'img_metas': aug_batches[0]['img_metas']}
    # unwrap single-aug MultiScaleFlipAug outputs (lists of length 1)
    samples = [
        {k: (v[0] if isinstance(v, list) and len(v) == 1 else v)
         for k, v in s.items()} for s in samples]
    metas = [s['img_metas'] for s in samples]
    imgs = [s['img'] for s in samples]
    hmax = max(i.shape[0] for i in imgs)
    wmax = max(i.shape[1] for i in imgs)
    if static_shapes is not None:
        # pick the smallest bucket that fits
        fitting = [s for s in static_shapes
                   if s[0] >= hmax and s[1] >= wmax]
        assert fitting, f'no bucket fits {hmax}x{wmax} in {static_shapes}'
        shape = min(fitting, key=lambda s: s[0] * s[1])
    else:
        shape = (((hmax + 31) // 32) * 32, ((wmax + 31) // 32) * 32)
    batch = {
        'img': np.stack([_pad_image(i, shape) for i in imgs]),
        'img_shape': np.array([m['img_shape'][:2] for m in metas],
                              dtype=np.float32),
        'scale_factor': np.stack([
            np.asarray(m['scale_factor'], dtype=np.float32).reshape(-1)[:4]
            if m.get('scale_factor') is not None
            else np.ones(4, np.float32) for m in metas]),
        'img_metas': metas,
    }
    if not test_mode:
        b = len(samples)
        gt_bboxes = np.zeros((b, max_gt, 4), np.float32)
        gt_valid = np.zeros((b, max_gt), bool)
        gt_labels = np.zeros((b, max_gt), np.int32)
        for i, s in enumerate(samples):
            boxes = s.get('gt_bboxes', np.zeros((0, 4), np.float32))
            labels = s.get('gt_labels', np.zeros((0,), np.int32))
            n = min(len(boxes), max_gt)
            gt_bboxes[i, :n] = boxes[:n]
            gt_valid[i, :n] = True
            gt_labels[i, :n] = labels[:n]
        batch['gt_bboxes'] = gt_bboxes
        batch['gt_valid'] = gt_valid
        batch['gt_labels'] = gt_labels
        if any('gt_masks' in s for s in samples):
            crops = np.zeros((b, max_gt, mask_crop_size, mask_crop_size),
                             np.float32)
            for i, s in enumerate(samples):
                gm = s.get('gt_masks')
                if gm is None or len(gm) == 0:
                    continue
                boxes = s['gt_bboxes'][:max_gt]
                n = len(boxes)
                crops[i, :n] = gm[list(range(min(len(gm), n)))] \
                    .to_fixed_crops(boxes[:min(len(gm), n)],
                                    mask_crop_size)
            batch['gt_mask_crops'] = crops
    return batch


class DetDataLoader:
    """Iterable yielding static-shape batches with threaded prefetch."""

    def __init__(self, dataset, samples_per_batch=2, num_workers=4,
                 shuffle=True, seed=0, static_shapes='auto', max_gt=100,
                 test_mode=False, prefetch=2, num_replicas=1, rank=0):
        """``num_replicas``/``rank``: multi-host sharding — the sampler
        builds GLOBAL batches (deterministic per epoch seed on every
        process, ref DistributedGroupSampler semantics,
        samplers/group_sampler.py:51-100) and each process loads only its
        ``samples_per_batch / num_replicas`` slice of every batch."""
        self.dataset = dataset
        self.bs = samples_per_batch
        self.num_workers = max(1, num_workers)
        self.test_mode = test_mode
        self.max_gt = max_gt
        assert samples_per_batch % max(num_replicas, 1) == 0, (
            'global batch size must divide evenly across processes')
        self.num_replicas = max(num_replicas, 1)
        self.rank = rank
        flags = getattr(dataset, 'flag',
                        np.zeros(len(dataset), dtype=np.uint8))
        self.sampler = GroupBatchSampler(flags, samples_per_batch,
                                         shuffle=shuffle, seed=seed)
        if static_shapes == 'auto':
            static_shapes = [(800, 1344), (1344, 800), (1344, 1344)]
        self.static_shapes = static_shapes
        self.prefetch = prefetch

    def __len__(self):
        return len(self.sampler)

    def _load_batch(self, pool, idxs):
        n_pad = 0
        if self.num_replicas > 1:
            idxs = list(idxs)
            if len(idxs) < self.bs:
                # pad the trailing remainder batch (test_mode, shuffle=False)
                # to the full global size so every process feeds an equal
                # slice; padded results are dropped via the meta 'pad' flag
                n_pad = self.bs - len(idxs)
                idxs = idxs + [idxs[-1]] * n_pad
            local = self.bs // self.num_replicas
            lo = self.rank * local
            local_pad = max(0, min(local, lo + local - (self.bs - n_pad)))
            idxs = idxs[lo:lo + local]
        else:
            local_pad = 0
        samples = list(pool.map(self.dataset.__getitem__, idxs))
        batch = collate_detection(samples, self.static_shapes, self.max_gt,
                                  self.test_mode)
        if local_pad:
            for m in batch['img_metas'][len(idxs) - local_pad:]:
                m['pad'] = True
        return batch

    def __iter__(self):
        batches = list(self.sampler)
        self.sampler.epoch += 1
        pool = ThreadPoolExecutor(self.num_workers)
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = object()

        err = []

        def producer():
            try:
                for idxs in batches:
                    q.put(self._load_batch(pool, idxs))
            except BaseException as e:  # surface loader errors to consumer
                err.append(e)
            finally:
                q.put(stop)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is stop:
                    break
                yield item
            if err:
                raise err[0]
        finally:
            pool.shutdown(wait=False)


def build_dataloader(dataset, samples_per_gpu=2, workers_per_gpu=2,
                     num_gpus=1, dist=False, shuffle=True, seed=0,
                     num_replicas=1, rank=0, **kwargs):
    """(ref: datasets/builder.py:68-135) — batch size here is global
    (num_devices * samples_per_gpu); sharding over devices happens in the
    train step. In a multi-host run pass num_replicas=process_count and
    rank=process_index so each host loads its slice of every global
    batch."""
    return DetDataLoader(dataset, samples_per_batch=samples_per_gpu * num_gpus,
                         num_workers=workers_per_gpu, shuffle=shuffle,
                         seed=seed, num_replicas=num_replicas, rank=rank,
                         **kwargs)
