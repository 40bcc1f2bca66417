"""Per-class / error-type analysis (ref: tools/coco_error_analysis.py).

Re-evaluates a result file at progressively looser criteria to attribute
the AP gap to error types:
  AP       — standard [.5:.95]
  AP@.5    — without strict-localization errors
  AP@.1    — additionally without loose-localization errors; the gap to
             1.0 is classification + background + missed detections
Per-class rows show where each class loses precision.

Usage: python tools/coco_error_analysis.py CONFIG RESULT.pkl [--out F.json]
"""
import argparse
import json
import pickle

import numpy as np


def main():
    parser = argparse.ArgumentParser(description='COCO error analysis')
    parser.add_argument('config')
    parser.add_argument('result', help='result file (.pkl) from test.py')
    parser.add_argument('--out', help='output json')
    args = parser.parse_args()

    from arfe_tpu import Config
    from arfe_tpu.core.evaluation import COCOEvaluator
    from arfe_tpu.data import build_dataset

    cfg = Config.fromfile(args.config)
    dataset = build_dataset(cfg.todict()['data']['test'],
                            dict(test_mode=True))
    with open(args.result, 'rb') as f:
        results = pickle.load(f)

    json_results = dataset._det2json(results)
    coco_dt = dataset.coco.loadRes(json_results)

    report = {}
    for name, thrs in (('strict', None),
                       ('loc50', np.array([0.5])),
                       ('loc10', np.array([0.1]))):
        ev = COCOEvaluator(dataset.coco, iou_type='bbox', iou_thrs=thrs)
        ev.img_ids = dataset.img_ids
        out = ev.evaluate(coco_dt)
        report[name] = dict(AP=out['stats']['AP'])
        # per-class AP at this criterion
        prec = out['precision'][:, :, :, 0, ev.max_dets.index(100)]
        per_class = {}
        for ki, cid in enumerate(ev.cat_ids):
            p = prec[:, :, ki]
            p = p[p > -1]
            cname = dataset.CLASSES[ki] if ki < len(dataset.CLASSES) \
                else str(cid)
            per_class[cname] = float(p.mean()) if p.size else -1.0
        report[name]['per_class'] = per_class

    ap = report['strict']['AP']
    ap50 = report['loc50']['AP']
    ap10 = report['loc10']['AP']
    print(f"AP[.5:.95]          = {ap:.4f}")
    print(f"AP@.5  (no strict loc errors) = {ap50:.4f}  (+{ap50 - ap:.4f})")
    print(f"AP@.1  (no loc errors)        = {ap10:.4f}  (+{ap10 - ap50:.4f})")
    print(f"cls/bg/missed headroom        = {1.0 - ap10:.4f}")
    worst = sorted(report['strict']['per_class'].items(),
                   key=lambda kv: kv[1])[:10]
    print('lowest-AP classes:', ', '.join(f'{k}={v:.3f}'
                                          for k, v in worst if v >= 0))
    if args.out:
        with open(args.out, 'w') as f:
            json.dump(report, f, indent=2)
        print(f'report written to {args.out}')


if __name__ == '__main__':
    main()
