"""North-star multi-chip eval: on-device COCO matching + buffer finalize
(core/evaluation/device_eval.py) vs the host COCOEvaluator, and
multi_device_test ≡ single_device_test feature parity (bbox AND segm)
on a virtual-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np

from arfe_tpu.core.evaluation import COCOEvaluator
from arfe_tpu.core.evaluation.device_eval import (
    _np_area_rngs, evaluate_from_buffers, gt_arrays_from_coco, match_image)
from arfe_tpu.core.evaluation.coco_eval import IOU_THRS
from arfe_tpu.data.coco_api import COCO

NUM_CLASSES = 3


def _random_case(seed, n_imgs=6, d_cap=20, g_cap=7):
    """Random gts (mixed sizes, a crowd, an ignore) + random score-sorted
    det buffers; returns (coco_gt, det_list, buffers)."""
    rng = np.random.RandomState(seed)
    images = [{'id': i, 'width': 640, 'height': 640,
               'file_name': f'{i}.jpg'} for i in range(n_imgs)]
    cats = [{'id': c + 1, 'name': f'c{c}'} for c in range(NUM_CLASSES)]
    anns = []
    aid = 0
    for i in range(n_imgs):
        for _ in range(rng.randint(1, g_cap)):
            # sizes spanning the small/medium/large area ranges
            s = rng.choice([10, 25, 40, 90, 200])
            x, y = rng.randint(0, 400, 2)
            w, h = s + rng.randint(0, s), s
            aid += 1
            anns.append(dict(
                id=aid, image_id=i, category_id=int(rng.randint(
                    1, NUM_CLASSES + 1)),
                bbox=[float(x), float(y), float(w), float(h)],
                area=float(w * h * rng.uniform(0.6, 1.0)),  # segm-ish area
                iscrowd=int(rng.rand() < 0.15),
                ignore=int(rng.rand() < 0.1)))
    coco_gt = COCO.from_dict(dict(images=images, categories=cats,
                                  annotations=anns))

    det_list = []
    scores = -np.ones((n_imgs, d_cap), np.float32)
    labels = np.zeros((n_imgs, d_cap), np.int32)
    det_boxes = np.zeros((n_imgs, d_cap, 4), np.float32)
    valid = np.zeros((n_imgs, d_cap), bool)
    for i in range(n_imgs):
        nd = rng.randint(3, d_cap)
        sc = np.sort(rng.uniform(0.05, 1.0, nd))[::-1]
        for j in range(nd):
            # half the dets jitter a gt box, half are random
            img_anns = [a for a in anns if a['image_id'] == i]
            if img_anns and rng.rand() < 0.6:
                a = img_anns[rng.randint(len(img_anns))]
                x, y, w, h = a['bbox']
                jit = rng.uniform(-0.15, 0.15, 4)
                x, y = x + jit[0] * w, y + jit[1] * h
                w, h = w * (1 + jit[2]), h * (1 + jit[3])
                cat = a['category_id'] if rng.rand() < 0.8 else \
                    int(rng.randint(1, NUM_CLASSES + 1))
            else:
                x, y = rng.randint(0, 500, 2).astype(float)
                w, h = rng.randint(8, 120, 2).astype(float)
                cat = int(rng.randint(1, NUM_CLASSES + 1))
            det_list.append(dict(image_id=i, category_id=cat,
                                 bbox=[x, y, w, h], score=float(sc[j])))
            scores[i, j] = sc[j]
            labels[i, j] = cat - 1
            det_boxes[i, j] = [x, y, x + w, y + h]
            valid[i, j] = True
    return coco_gt, det_list, (det_boxes, scores, labels, valid)


def test_device_matching_equals_host_coco_evaluator():
    for seed in (0, 1, 2):
        coco_gt, det_list, (boxes, scores, labels, valid) = \
            _random_case(seed)
        n_imgs, d_cap = scores.shape
        host = COCOEvaluator(coco_gt).evaluate(coco_gt.loadRes(det_list))

        cat2label = {c: c - 1 for c in coco_gt.getCatIds()}
        max_gt = max(len(coco_gt.img_ann_map[i]) for i in range(n_imgs))
        gts = [np.stack(arrs) for arrs in zip(
            *(gt_arrays_from_coco(coco_gt, i, cat2label, max_gt)
              for i in range(n_imgs)))]
        dets5 = np.concatenate([boxes, scores[..., None]], -1)

        def one(d, l, v, gx, gl, gc, gi, ga, gv):
            return match_image(d, l, v, gx, gl, gc, gi, ga, gv,
                               jnp.asarray(IOU_THRS, jnp.float32),
                               jnp.asarray(_np_area_rngs()), NUM_CLASSES)

        matched, ignored, num_gt = jax.jit(jax.vmap(one))(
            jnp.asarray(dets5), jnp.asarray(labels), jnp.asarray(valid),
            *(jnp.asarray(g) for g in gts))
        dev = evaluate_from_buffers(
            scores, labels, np.asarray(matched), np.asarray(ignored),
            np.asarray(num_gt).sum(0), NUM_CLASSES)
        np.testing.assert_allclose(dev['precision'], host['precision'],
                                   atol=1e-9, err_msg=f'seed {seed}')
        np.testing.assert_allclose(dev['recall'], host['recall'],
                                   atol=1e-9, err_msg=f'seed {seed}')
        for k, v in host['stats'].items():
            assert abs(dev['stats'][k] - v) < 1e-9, (seed, k)


# ---------------------------------------------------------------------------
# multi_device_test ≡ single_device_test (Mask R-CNN, bbox + segm)
# ---------------------------------------------------------------------------


def _fake_loader(n_batches=2, bs=2, h=64, w=96, seed=0):
    rng = np.random.RandomState(seed)
    batches = []
    for _ in range(n_batches):
        batches.append({
            'img': rng.randn(bs, h, w, 3).astype(np.float32),
            'img_shape': np.tile([[h, w]], (bs, 1)).astype(np.float32),
            'scale_factor': np.ones((bs, 4), np.float32),
            'img_metas': [dict(ori_shape=(h, w, 3), img_shape=(h, w, 3),
                               scale_factor=np.ones(4, np.float32))
                          for _ in range(bs)],
        })
    return batches


def _results_equal(a, b):
    assert len(a) == len(b)
    for ra, rb in zip(a, b):
        if isinstance(ra, tuple):
            assert isinstance(rb, tuple)
            (ba, sa), (bb, sb) = ra, rb
        else:
            ba, bb = ra, rb
            sa = sb = None
        for ca, cb in zip(ba, bb):
            # sharded compilation fuses differently -> fp32 jitter
            np.testing.assert_allclose(ca, cb, atol=1e-4)
        if sa is not None:
            assert len(sa) == len(sb)
            for cls_a, cls_b in zip(sa, sb):
                assert len(cls_a) == len(cls_b)
                for ma, mb in zip(cls_a, cls_b):
                    np.testing.assert_array_equal(ma, mb)


def test_multi_device_test_equals_single_device_mask_rcnn():
    from arfe_tpu.apis.test import multi_device_test, single_device_test
    from arfe_tpu.models import build_detector
    from arfe_tpu.parallel import make_mesh
    from test_faster_rcnn_smoke import TEST_CFG
    from test_mask_cascade import mask_rcnn_cfg

    model = build_detector(mask_rcnn_cfg(), test_cfg=dict(TEST_CFG))
    params = model.init(jax.random.PRNGKey(0))
    loader = _fake_loader()
    single = single_device_test(model, params, loader, show_progress=False)
    mesh = make_mesh(n_data=2)
    multi = multi_device_test(model, params, loader, mesh,
                              show_progress=False)
    assert any(isinstance(r, tuple) for r in single), 'masks missing'
    _results_equal(single, multi)


def test_multi_device_coco_eval_matches_host_eval(tmp_path):
    """The psum'd-accumulator path end-to-end: stats from on-device
    matching == CocoDataset.evaluate on single-device results."""
    import json

    from arfe_tpu.apis.test import (multi_device_coco_eval,
                                    single_device_test)
    from arfe_tpu.data.coco import CocoDataset
    from arfe_tpu.models import build_detector
    from arfe_tpu.parallel import make_mesh
    from test_faster_rcnn_smoke import TEST_CFG, faster_cfg

    rng = np.random.RandomState(7)
    h, w = 64, 96
    n_imgs = 4
    anns = []
    aid = 0
    for i in range(n_imgs):
        for _ in range(rng.randint(1, 4)):
            x, y = rng.randint(0, 40, 2)
            bw, bh = rng.randint(8, 40, 2)
            aid += 1
            anns.append(dict(id=aid, image_id=i,
                             category_id=int(rng.randint(1, 6)),
                             bbox=[float(x), float(y), float(bw),
                                   float(bh)],
                             area=float(bw * bh), iscrowd=0))
    ann = {
        'images': [{'id': i, 'width': w, 'height': h,
                    'file_name': f'{i}.jpg'} for i in range(n_imgs)],
        'categories': [{'id': c + 1, 'name': f'c{c}'} for c in range(5)],
        'annotations': anns,
    }
    af = tmp_path / 'ann.json'
    af.write_text(json.dumps(ann))
    ds = CocoDataset(str(af), pipeline=[], img_prefix='', test_mode=True)
    ds.CLASSES = tuple(f'c{c}' for c in range(5))

    model = build_detector(faster_cfg(False), test_cfg=dict(TEST_CFG))
    params = model.init(jax.random.PRNGKey(1))
    loader = _fake_loader(n_batches=2, bs=2, h=h, w=w, seed=3)

    single = single_device_test(model, params, loader, show_progress=False)
    host_stats = ds.evaluate(single, metric='bbox')

    mesh = make_mesh(n_data=2)
    dev_stats = multi_device_coco_eval(model, params, loader, ds, mesh,
                                       show_progress=False)
    for k in ('bbox_mAP', 'bbox_AP50', 'bbox_AP75', 'bbox_APs',
              'bbox_APm', 'bbox_APl'):
        assert abs(dev_stats[k] - host_stats[k]) < 1e-6, \
            (k, dev_stats[k], host_stats[k])


def test_multi_device_test_tta_equals_single_device():
    """TTA (aug batches) through multi_device_test matches the
    single-device path."""
    from arfe_tpu.apis.test import multi_device_test, single_device_test
    from arfe_tpu.models import build_detector
    from arfe_tpu.parallel import make_mesh
    from test_faster_rcnn_smoke import TEST_CFG, faster_cfg

    model = build_detector(faster_cfg(False), test_cfg=dict(TEST_CFG))
    params = model.init(jax.random.PRNGKey(2))
    rng = np.random.RandomState(5)
    h, w = 64, 96
    bs = 2

    def aug(flip, seed):
        img = rng.randn(bs, h, w, 3).astype(np.float32)
        return {
            'img': img,
            'img_shape': np.tile([[h, w]], (bs, 1)).astype(np.float32),
            'scale_factor': np.ones((bs, 4), np.float32),
            'img_metas': [dict(ori_shape=(h, w, 3), img_shape=(h, w, 3),
                               scale_factor=np.ones(4, np.float32),
                               flip=flip) for _ in range(bs)],
        }

    batches = []
    for i in range(2):
        augs = [aug(False, i), aug(True, i)]
        batches.append({'augs': augs, 'img_metas': augs[0]['img_metas']})

    single = single_device_test(model, params, batches,
                                show_progress=False)
    mesh = make_mesh(n_data=2)
    multi = multi_device_test(model, params, batches, mesh,
                              show_progress=False)
    _results_equal(single, multi)
