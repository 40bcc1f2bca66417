"""Synthetic COCO dataset: pipeline, loader, end-to-end test CLI flow."""
import json
import os

import numpy as np
import pytest

import cv2

from arfe_tpu.data import (CocoDataset, build_dataloader, build_dataset,
                           collate_detection)


@pytest.fixture(scope='module')
def tiny_coco(tmp_path_factory):
    root = tmp_path_factory.mktemp('tiny_coco')
    img_dir = root / 'imgs'
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    images, annotations = [], []
    ann_id = 1
    for i in range(6):
        h, w = (64, 96) if i % 2 == 0 else (96, 64)
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        boxes = []
        for _ in range(rng.randint(1, 4)):
            x1 = rng.randint(0, w - 20)
            y1 = rng.randint(0, h - 20)
            bw = rng.randint(10, min(30, w - x1))
            bh = rng.randint(10, min(30, h - y1))
            img[y1:y1 + bh, x1:x1 + bw] = [0, 255, 0]
            boxes.append([x1, y1, bw, bh])
        cv2.imwrite(str(img_dir / f'{i}.jpg'), img)
        images.append(dict(id=i, file_name=f'{i}.jpg', width=w, height=h))
        for b in boxes:
            annotations.append(dict(
                id=ann_id, image_id=i, category_id=1, bbox=b,
                area=b[2] * b[3], iscrowd=0))
            ann_id += 1
    ann = dict(images=images, annotations=annotations,
               categories=[dict(id=1, name='blob')])
    ann_file = root / 'ann.json'
    ann_file.write_text(json.dumps(ann))
    return dict(ann_file=str(ann_file), img_prefix=str(img_dir))


TRAIN_PIPELINE = [
    dict(type='LoadImageFromFile'),
    dict(type='LoadAnnotations', with_bbox=True),
    dict(type='Resize', img_scale=(128, 80), keep_ratio=True),
    dict(type='RandomFlip', flip_ratio=0.5),
    dict(type='Normalize', mean=[123.675, 116.28, 103.53],
         std=[58.395, 57.12, 57.375], to_rgb=True),
    dict(type='Pad', size_divisor=32),
    dict(type='DefaultFormatBundle'),
    dict(type='Collect', keys=['img', 'gt_bboxes', 'gt_labels']),
]
TEST_PIPELINE = [
    dict(type='LoadImageFromFile'),
    dict(type='MultiScaleFlipAug', img_scale=(128, 80), flip=False,
         transforms=[
             dict(type='Resize', keep_ratio=True),
             dict(type='RandomFlip'),
             dict(type='Normalize', mean=[123.675, 116.28, 103.53],
                  std=[58.395, 57.12, 57.375], to_rgb=True),
             dict(type='Pad', size_divisor=32),
             dict(type='ImageToTensor', keys=['img']),
             dict(type='Collect', keys=['img']),
         ])
]


def make_dataset(tiny_coco, test_mode=False):
    return build_dataset(dict(
        type='CocoDataset', ann_file=tiny_coco['ann_file'],
        img_prefix=tiny_coco['img_prefix'], classes=['blob'],
        pipeline=TEST_PIPELINE if test_mode else TRAIN_PIPELINE,
        test_mode=test_mode))


def test_dataset_and_pipeline(tiny_coco):
    ds = make_dataset(tiny_coco)
    assert len(ds) == 6
    sample = ds[0]
    img = sample['img']
    assert img.ndim == 3 and img.shape[2] == 3
    assert img.shape[0] % 32 == 0 and img.shape[1] % 32 == 0
    assert sample['gt_bboxes'].shape[1] == 4
    assert (sample['gt_labels'] == 0).all()
    meta = sample['img_metas']
    assert meta['scale_factor'].shape == (4,)
    # boxes within resized image bounds
    h, w = meta['img_shape'][:2]
    gb = sample['gt_bboxes']
    assert (gb[:, 2] <= w + 1e-3).all() and (gb[:, 3] <= h + 1e-3).all()


def test_group_flags_and_loader(tiny_coco):
    ds = make_dataset(tiny_coco)
    assert set(ds.flag.tolist()) == {0, 1}
    loader = build_dataloader(ds, samples_per_gpu=2, workers_per_gpu=2,
                              static_shapes=[(128, 128)], max_gt=10)
    batches = list(loader)
    # 3 per group padded to 4 -> 2 batches x 2 groups (GroupSampler pads)
    assert len(batches) == 4
    for b in batches:
        assert b['img'].shape == (2, 128, 128, 3)
        assert b['gt_bboxes'].shape == (2, 10, 4)
        assert b['gt_valid'].any()
        assert b['img_shape'].shape == (2, 2)


def test_end_to_end_eval_flow(tiny_coco):
    """tools/test.py equivalent: random-weight detector -> dataset.evaluate
    (exercises result formatting + COCO evaluator on real plumbing)."""
    import jax
    from arfe_tpu.apis.test import single_device_test
    from arfe_tpu.models import build_detector
    from test_faster_rcnn_smoke import TEST_CFG, faster_cfg

    cfg = faster_cfg(False)
    cfg['roi_head']['bbox_head']['num_classes'] = 1
    model = build_detector(cfg, test_cfg=dict(TEST_CFG))
    params = jax.jit(model.init)(jax.random.PRNGKey(0))
    ds = make_dataset(tiny_coco, test_mode=True)
    loader = build_dataloader(ds, samples_per_gpu=2, shuffle=False,
                              static_shapes=[(128, 128)], test_mode=True)
    results = single_device_test(model, params, loader, show_progress=False)
    assert len(results) == len(ds)
    assert len(results[0]) == 1  # one class
    metrics = ds.evaluate(results, metric='bbox')
    assert 'bbox_mAP' in metrics
    assert np.isfinite(metrics['bbox_mAP']) or metrics['bbox_mAP'] == -1
    # also the proposal/recall metric path
    metrics2 = ds.evaluate(results, metric='proposal')
    assert 'AR@100' in metrics2


def test_train_one_epoch_via_api(tiny_coco, tmp_path):
    """tools/train.py equivalent on the tiny dataset."""
    from arfe_tpu import Config
    from arfe_tpu.apis import train_detector
    from arfe_tpu.models import build_detector
    from test_faster_rcnn_smoke import TEST_CFG, faster_cfg
    from test_train_step import FASTER_TRAIN_CFG

    model_cfg = faster_cfg(False)
    model_cfg['roi_head']['bbox_head']['num_classes'] = 1
    cfg = Config(dict(
        model=model_cfg,
        data=dict(samples_per_gpu=2, workers_per_gpu=2),
        optimizer=dict(type='SGD', lr=0.001, momentum=0.9,
                       weight_decay=0.0001),
        optimizer_config=dict(grad_clip=dict(max_norm=35, norm_type=2)),
        lr_config=dict(policy='step', warmup='linear', warmup_iters=5,
                       warmup_ratio=0.001, step=[8, 11]),
        checkpoint_config=dict(interval=1),
        log_config=dict(interval=1),
        total_epochs=1,
        work_dir=str(tmp_path / 'wd'),
        seed=0,
    ))
    model = build_detector(dict(model_cfg),
                           train_cfg=dict(FASTER_TRAIN_CFG),
                           test_cfg=dict(TEST_CFG))
    ds = make_dataset(tiny_coco)
    # single-device path (the 8-device mesh path is covered elsewhere and
    # this dataset is too small to shard 8 ways)
    import jax
    import arfe_tpu.apis.train as train_mod
    orig = jax.devices
    jax.devices = lambda *a, **k: orig()[:1]
    try:
        params, opt_state, history = train_detector(model, ds, cfg,
                                                    validate=False)
    finally:
        jax.devices = orig
    assert history, 'no training logs recorded'
    assert np.isfinite(history[-1]['loss'])
    assert os.path.exists(str(tmp_path / 'wd' / 'epoch_1.pkl'))
    # checkpoint round-trips
    from arfe_tpu.utils import load_checkpoint
    p2, meta, opt = load_checkpoint(str(tmp_path / 'wd' / 'epoch_1.pkl'))
    assert meta['epoch'] == 1
