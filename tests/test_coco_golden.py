"""Golden COCOeval corner-case fixtures (hand-derived, committed as data:
tests/fixtures/coco_golden.json) pinning the pycocotools protocol —
crowd multi-match, ignore-tier preference, equal-IoU tie resolution
(later gt wins), maxDets=1/10/100 truncation, and area-range gt/det
ignoring — for BOTH the host evaluator (core/evaluation/coco_eval.py) and
the on-device matcher (core/evaluation/device_eval.py).

The expected numbers are derived by hand in the fixture's generation
comments (each case's derivation is summarized in its docstring field);
they pin the protocol against vectors, not against sibling code
(ref protocol: mmdet/datasets/coco.py:389-427 -> pycocotools COCOeval).
"""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arfe_tpu.core.evaluation import COCOEvaluator
from arfe_tpu.core.evaluation.coco_eval import IOU_THRS
from arfe_tpu.core.evaluation.device_eval import (
    _np_area_rngs, evaluate_from_buffers, gt_arrays_from_coco,
    match_image)
from arfe_tpu.data.coco_api import COCO

FIXTURES = os.path.join(os.path.dirname(__file__), 'fixtures',
                        'coco_golden.json')
with open(FIXTURES) as f:
    CASES = json.load(f)


def _build(case):
    anns = []
    for i, g in enumerate(case['gts']):
        g = dict(g)
        b = g['bbox']
        anns.append(dict(g, id=i + 1, area=float(b[2] * b[3]),
                         iscrowd=g.get('iscrowd', 0)))
    coco_gt = COCO.from_dict(dict(
        images=[dict(im, file_name=f"{im['id']}.jpg")
                for im in case['images']],
        categories=[dict(id=1, name='c0')],
        annotations=anns))
    return coco_gt, case['dts']


@pytest.mark.parametrize('case', CASES, ids=[c['name'] for c in CASES])
def test_host_evaluator_golden(case):
    coco_gt, dts = _build(case)
    stats = COCOEvaluator(coco_gt).evaluate(coco_gt.loadRes(dts))['stats']
    for k, v in case['expected'].items():
        assert abs(stats[k] - v) < 1e-9, (case['name'], k, stats[k], v)


@pytest.mark.parametrize('case', CASES, ids=[c['name'] for c in CASES])
def test_device_evaluator_golden(case):
    coco_gt, dts = _build(case)
    n_imgs = len(case['images'])
    d_cap = max(sum(d['image_id'] == i for d in dts)
                for i in range(n_imgs)) + 1
    scores = -np.ones((n_imgs, d_cap), np.float32)
    labels = np.zeros((n_imgs, d_cap), np.int32)
    boxes = np.zeros((n_imgs, d_cap, 4), np.float32)
    valid = np.zeros((n_imgs, d_cap), bool)
    for i in range(n_imgs):
        img_dts = sorted((d for d in dts if d['image_id'] == i),
                         key=lambda d: -d['score'])
        for j, d in enumerate(img_dts):
            x, y, w, h = d['bbox']
            boxes[i, j] = [x, y, x + w, y + h]
            scores[i, j] = d['score']
            labels[i, j] = d['category_id'] - 1
            valid[i, j] = True

    cat2label = {1: 0}
    max_gt = max(len(coco_gt.img_ann_map[i]) for i in range(n_imgs))
    gts = [np.stack(arrs) for arrs in zip(
        *(gt_arrays_from_coco(coco_gt, i, cat2label, max_gt)
          for i in range(n_imgs)))]
    dets5 = np.concatenate([boxes, scores[..., None]], -1)

    def one(d, l, v, gx, gl, gc, gi, ga, gv):
        return match_image(d, l, v, gx, gl, gc, gi, ga, gv,
                           jnp.asarray(IOU_THRS, jnp.float32),
                           jnp.asarray(_np_area_rngs()), 1)

    matched, ignored, num_gt = jax.jit(jax.vmap(one))(
        jnp.asarray(dets5), jnp.asarray(labels), jnp.asarray(valid),
        *(jnp.asarray(g) for g in gts))
    dev = evaluate_from_buffers(scores, labels, np.asarray(matched),
                                np.asarray(ignored),
                                np.asarray(num_gt).sum(0), 1)
    for k, v in case['expected'].items():
        assert abs(dev['stats'][k] - v) < 1e-6, \
            (case['name'], k, dev['stats'][k], v)
