"""From-scratch COCO evaluator vs hand-checkable golden cases."""
import numpy as np

from arfe_tpu.core.evaluation import COCOEvaluator, eval_map, eval_recalls
from arfe_tpu.data.coco_api import COCO


def make_gt(annotations, num_imgs=2, num_cats=2):
    return COCO.from_dict({
        'images': [{'id': i, 'width': 100, 'height': 100,
                    'file_name': f'{i}.jpg'} for i in range(num_imgs)],
        'categories': [{'id': c + 1, 'name': f'c{c}'}
                       for c in range(num_cats)],
        'annotations': [dict(a, id=i + 1, area=a['bbox'][2] * a['bbox'][3],
                             iscrowd=a.get('iscrowd', 0))
                        for i, a in enumerate(annotations)],
    })


def test_perfect_predictions_ap1():
    gts = [
        dict(image_id=0, category_id=1, bbox=[10, 10, 20, 20]),
        dict(image_id=0, category_id=2, bbox=[50, 50, 30, 10]),
        dict(image_id=1, category_id=1, bbox=[5, 5, 40, 40]),
    ]
    coco_gt = make_gt(gts)
    dets = [dict(g, score=0.9) for g in gts]
    ev = COCOEvaluator(coco_gt)
    stats = ev.evaluate(coco_gt.loadRes(dets))['stats']
    assert abs(stats['AP'] - 1.0) < 1e-6
    assert abs(stats['AP50'] - 1.0) < 1e-6
    assert abs(stats['AR@100'] - 1.0) < 1e-6


def test_iou_060_matches_three_thresholds():
    # one gt, one det with IoU exactly 0.6 -> matched at thr .5/.55/.6
    coco_gt = make_gt([dict(image_id=0, category_id=1,
                            bbox=[0, 0, 10, 10])], num_imgs=1, num_cats=1)
    # det [0,0,6,10] vs gt [0,0,10,10]: inter 60, union 100 -> IoU 0.6
    dets = [dict(image_id=0, category_id=1, bbox=[0, 0, 6, 10], score=0.9)]
    stats = COCOEvaluator(coco_gt).evaluate(coco_gt.loadRes(dets))['stats']
    assert abs(stats['AP'] - 0.3) < 1e-6
    assert abs(stats['AP50'] - 1.0) < 1e-6
    assert abs(stats['AP75']) < 1e-6


def test_false_positive_halves_precision():
    coco_gt = make_gt([dict(image_id=0, category_id=1,
                            bbox=[0, 0, 10, 10])], num_imgs=1, num_cats=1)
    dets = [
        dict(image_id=0, category_id=1, bbox=[0, 0, 10, 10], score=0.9),
        dict(image_id=0, category_id=1, bbox=[50, 50, 10, 10], score=0.8),
    ]
    stats = COCOEvaluator(coco_gt).evaluate(coco_gt.loadRes(dets))['stats']
    # recall 1.0 at precision 1.0 (fp comes after the tp) -> AP still 1.0
    assert abs(stats['AP50'] - 1.0) < 1e-6
    # flip scores: fp first -> precision at recall>0 is 0.5
    dets[0]['score'], dets[1]['score'] = 0.8, 0.9
    stats = COCOEvaluator(coco_gt).evaluate(coco_gt.loadRes(dets))['stats']
    assert abs(stats['AP50'] - 0.5) < 1e-2


def test_crowd_gt_not_fp():
    coco_gt = make_gt([
        dict(image_id=0, category_id=1, bbox=[0, 0, 10, 10]),
        dict(image_id=0, category_id=1, bbox=[40, 40, 20, 20], iscrowd=1),
    ], num_imgs=1, num_cats=1)
    dets = [
        dict(image_id=0, category_id=1, bbox=[0, 0, 10, 10], score=0.9),
        # overlaps the crowd region -> ignored, not a false positive
        dict(image_id=0, category_id=1, bbox=[42, 42, 16, 16], score=0.8),
    ]
    stats = COCOEvaluator(coco_gt).evaluate(coco_gt.loadRes(dets))['stats']
    assert abs(stats['AP'] - 1.0) < 1e-6


def test_area_ranges():
    # small gt (16x16=256 < 32^2) only
    coco_gt = make_gt([dict(image_id=0, category_id=1,
                            bbox=[0, 0, 16, 16])], num_imgs=1, num_cats=1)
    dets = [dict(image_id=0, category_id=1, bbox=[0, 0, 16, 16], score=0.9)]
    stats = COCOEvaluator(coco_gt).evaluate(coco_gt.loadRes(dets))['stats']
    assert abs(stats['APs'] - 1.0) < 1e-6
    assert stats['APm'] == -1.0  # no medium gts
    assert stats['APl'] == -1.0


def test_voc_eval_map_basic():
    dets = [[np.array([[0, 0, 10, 10, 0.9]], np.float32)]]
    anns = [dict(bboxes=np.array([[0, 0, 10, 10]], np.float32),
                 labels=np.array([0]))]
    mean_ap, results = eval_map(dets, anns, iou_thr=0.5)
    assert abs(mean_ap - 1.0) < 1e-6

    # miss -> 0
    dets = [[np.array([[50, 50, 60, 60, 0.9]], np.float32)]]
    mean_ap, _ = eval_map(dets, anns, iou_thr=0.5)
    assert mean_ap < 1e-6


def test_eval_recalls():
    gts = [np.array([[0, 0, 10, 10], [20, 20, 40, 40]], np.float32)]
    proposals = [np.array([[0, 0, 10, 10, 0.9], [100, 100, 110, 110, 0.8]],
                          np.float32)]
    rec = eval_recalls(gts, proposals, proposal_nums=[2], iou_thrs=0.5)
    assert abs(rec[0, 0] - 0.5) < 1e-6


def _naive_ap(gt_by_img, det_by_img, iou_thr):
    """Independent brute-force COCOeval-protocol AP for one category:
    per-image greedy matching in score order (each det takes the best
    still-unmatched gt with IoU >= thr), then the 101-point interpolated
    envelope over the global score-sorted PR curve. Written from the
    protocol definition, independently of the package evaluator."""
    def iou(a, b):
        ax1, ay1, aw, ah = a
        bx1, by1, bw, bh = b
        ix = max(0.0, min(ax1 + aw, bx1 + bw) - max(ax1, bx1))
        iy = max(0.0, min(ay1 + ah, by1 + bh) - max(ay1, by1))
        inter = ix * iy
        u = aw * ah + bw * bh - inter
        return inter / u if u > 0 else 0.0

    records = []  # (score, is_tp)
    n_gt = sum(len(g) for g in gt_by_img.values())
    for img, dets in det_by_img.items():
        gts = gt_by_img.get(img, [])
        taken = [False] * len(gts)
        for score, box in sorted(dets, key=lambda d: -d[0]):
            best, best_iou = -1, iou_thr
            for j, g in enumerate(gts):
                if taken[j]:
                    continue
                v = iou(box, g)
                # strictly-better keeps first-listed gt on ties, like
                # COCOeval's strict > comparison
                if v > best_iou or (best < 0 and v >= iou_thr
                                    and v == best_iou):
                    best, best_iou = j, v
            if best >= 0:
                taken[best] = True
                records.append((score, 1))
            else:
                records.append((score, 0))
    if n_gt == 0:
        return -1.0
    records.sort(key=lambda r: -r[0])
    tps = np.cumsum([r[1] for r in records]) if records else np.array([])
    fps = np.cumsum([1 - r[1] for r in records]) if records else np.array([])
    recall = tps / n_gt if len(tps) else np.array([0.0])
    precision = tps / np.maximum(tps + fps, 1) if len(tps) else \
        np.array([0.0])
    # monotone envelope + 101-point sampling
    prec = precision.copy()
    for i in range(len(prec) - 2, -1, -1):
        prec[i] = max(prec[i], prec[i + 1])
    out = []
    for r in np.linspace(0, 1, 101):
        idx = np.searchsorted(recall, r, side='left')
        out.append(prec[idx] if idx < len(prec) else 0.0)
    return float(np.mean(out))


def test_evaluator_matches_bruteforce_on_random_data():
    """Differential test: the optimized evaluator vs an independent
    brute-force implementation of the COCOeval protocol, random scenes."""
    rng = np.random.RandomState(7)
    num_imgs, num_cats = 12, 3
    gts, dets = [], []
    gt_by = {(c, i): [] for c in range(1, num_cats + 1)
             for i in range(num_imgs)}
    det_by = {(c, i): [] for c in range(1, num_cats + 1)
              for i in range(num_imgs)}
    for i in range(num_imgs):
        for _ in range(rng.randint(1, 5)):
            c = rng.randint(1, num_cats + 1)
            x, y = rng.rand(2) * 60
            w, h = 10 + rng.rand(2) * 30
            gts.append(dict(image_id=i, category_id=c,
                            bbox=[float(x), float(y), float(w), float(h)]))
            gt_by[(c, i)].append([x, y, w, h])
            # jittered detection for most gts
            if rng.rand() < 0.8:
                jx, jy = rng.randn(2) * 4
                s = float(rng.rand() * 0.5 + 0.5)
                dets.append(dict(image_id=i, category_id=c,
                                 bbox=[float(x + jx), float(y + jy),
                                       float(w), float(h)], score=s))
                det_by[(c, i)].append((s, [x + jx, y + jy, w, h]))
        # false positives
        for _ in range(rng.randint(0, 3)):
            c = rng.randint(1, num_cats + 1)
            x, y = rng.rand(2) * 70
            s = float(rng.rand() * 0.4)
            dets.append(dict(image_id=i, category_id=c,
                             bbox=[float(x), float(y), 12.0, 12.0],
                             score=s))
            det_by[(c, i)].append((s, [x, y, 12.0, 12.0]))

    coco_gt = make_gt(gts, num_imgs=num_imgs, num_cats=num_cats)
    ev = COCOEvaluator(coco_gt)
    stats = ev.evaluate(coco_gt.loadRes(dets))['stats']

    for thr, key in ((0.5, 'AP50'), (0.75, 'AP75')):
        aps = []
        for c in range(1, num_cats + 1):
            gt_c = {i: gt_by[(c, i)] for i in range(num_imgs)}
            det_c = {i: det_by[(c, i)] for i in range(num_imgs)}
            ap = _naive_ap(gt_c, det_c, thr)
            if ap >= 0:
                aps.append(ap)
        expected = float(np.mean(aps))
        assert abs(stats[key] - expected) < 1e-6, \
            f'{key}: {stats[key]} vs brute-force {expected}'
