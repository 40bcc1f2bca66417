"""Corruptions, robustness aggregation, pipeline tail, dataset tail."""
import numpy as np
import pytest

IMG = (np.random.RandomState(0).rand(48, 64, 3) * 255).astype(np.uint8)


def test_all_corruptions_run():
    from arfe_tpu.data.corruptions import CORRUPTIONS, corrupt
    for name in CORRUPTIONS:
        out = corrupt(IMG, name, severity=3, seed=0)
        assert out.shape == IMG.shape and out.dtype == np.uint8, name
        # severity monotonicity spot check: s5 perturbs at least as much
        # as s1 for the noise family
    for name in ('gaussian_noise', 'contrast'):
        d1 = np.abs(corrupt(IMG, name, 1, seed=0).astype(int)
                    - IMG.astype(int)).mean()
        d5 = np.abs(corrupt(IMG, name, 5, seed=0).astype(int)
                    - IMG.astype(int)).mean()
        assert d5 > d1, name


def test_corrupt_transform_and_unknown():
    from arfe_tpu.data.corruptions import corrupt
    from arfe_tpu.data.pipelines import Corrupt
    t = Corrupt('pixelate', 2)
    out = t(dict(img=IMG.copy()))
    assert out['img'].shape == IMG.shape
    with pytest.raises(KeyError):
        corrupt(IMG, 'nonexistent')
    with pytest.raises(ValueError):
        corrupt(IMG, 'fog', severity=9)


def test_robustness_aggregation():
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..',
                                    'tools'))
    from robustness_eval import get_results_from_dict
    results = {
        'gaussian_noise': {0: dict(bbox_mAP=0.4), 1: dict(bbox_mAP=0.3),
                           2: dict(bbox_mAP=0.2)},
        'fog': {0: dict(bbox_mAP=0.4), 1: dict(bbox_mAP=0.35),
                2: dict(bbox_mAP=0.25)},
    }
    out = get_results_from_dict(results, metric_key='bbox_mAP')
    assert abs(out['bbox_mAP']['P'] - 0.4) < 1e-9
    assert abs(out['bbox_mAP']['mPC'] - 0.275) < 1e-9
    assert abs(out['bbox_mAP']['rPC'] - 0.275 / 0.4) < 1e-9


def test_pipeline_tail_transforms():
    from arfe_tpu.data.pipelines import (LoadProposals, SegRescale,
                                         ToDataContainer, Transpose,
                                         WrapFieldsToLists)
    r = dict(proposals=np.array([[0, 0, 10, 10, 0.9]], np.float32))
    out = LoadProposals(num_max_proposals=5)(r)
    assert out['proposals'].shape == (1, 4)
    seg = np.arange(64, dtype=np.uint8).reshape(8, 8)
    out = SegRescale(scale_factor=0.5)(dict(gt_semantic_seg=seg))
    assert out['gt_semantic_seg'].shape == (4, 4)
    out = Transpose(keys=['img'], order=(2, 0, 1))(
        dict(img=np.zeros((4, 5, 3))))
    assert out['img'].shape == (3, 4, 5)
    assert ToDataContainer()(dict(a=1)) == dict(a=1)
    out = WrapFieldsToLists()(dict(a=1, b='x'))
    assert out == dict(a=[1], b=['x'])


def test_albu_instaboost_gated():
    from arfe_tpu.data.pipelines import Albu, InstaBoost
    with pytest.raises(ImportError):
        Albu(transforms=[])
    with pytest.raises(ImportError):
        InstaBoost()


def test_dataset_registry_tail():
    from arfe_tpu.registry import DATASETS
    for name in ('CityscapesDataset', 'WIDERFaceDataset'):
        assert name in DATASETS.module_dict, name


def test_evaluator_custom_iou_thrs():
    from arfe_tpu.core.evaluation import COCOEvaluator
    from arfe_tpu.data.coco_api import COCO
    gt = {
        'images': [dict(id=1, width=100, height=100)],
        'annotations': [dict(id=1, image_id=1, category_id=1,
                             bbox=[10, 10, 30, 30], area=900, iscrowd=0)],
        'categories': [dict(id=1, name='x')],
    }
    coco = COCO.from_dict(gt)
    # detection at IoU ~0.42 vs gt: hits at thr .1 but not the strict set
    dt = coco.loadRes([dict(image_id=1, category_id=1,
                            bbox=[20, 20, 30, 30], score=0.9)])
    strict = COCOEvaluator(coco).evaluate(dt)['stats']['AP']
    loose = COCOEvaluator(coco, iou_thrs=np.array([0.1])).evaluate(
        dt)['stats']['AP']
    assert loose > strict
    assert loose > 0.9  # single det matches at IoU .1
