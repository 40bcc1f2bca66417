"""Dataset / prediction distribution analysis.

Generic, data-driven replacement for the reference's hard-coded analysis
snippets (ref: tools/get_base_distribution.py:1-133,
tools/utils/get_cat_distribution.py:1-52, tools/utils/drawBars.py:1-60):
given a COCO-style annotation file (and optionally a prediction bbox json),
computes

  * objects-per-image histogram,
  * distinct-categories-per-image histogram,
  * per-category instance counts (as percentages),
  * gt-vs-pred category-count differences per image (pos/neg),

prints them, and renders bar charts when matplotlib is available.

Usage:
    python tools/dataset_distribution.py ANN.json [--pred PRED.bbox.json]
        [--out-dir DIR] [--max-objs 100] [--max-cats 20]
"""
import argparse
import json
import os
from collections import defaultdict

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('ann_file', help='COCO-style annotation json')
    p.add_argument('--pred', default=None,
                   help='prediction bbox json (list of {image_id, '
                        'category_id, ...})')
    p.add_argument('--out-dir', default=None,
                   help='directory for bar-chart pngs (omit to skip plots)')
    p.add_argument('--max-objs', type=int, default=100,
                   help='histogram cap for objects per image')
    p.add_argument('--max-cats', type=int, default=20,
                   help='histogram cap for categories per image')
    return p.parse_args()


def _group_by_image(records):
    by_img = defaultdict(list)
    for r in records:
        by_img[r['image_id']].append(r['category_id'])
    return by_img


def analyze(ann, pred=None, max_objs=100, max_cats=20):
    """Returns a dict of numpy histograms mirroring the reference's
    printed lists."""
    gt_by_img = _group_by_image(ann['annotations'])
    img_ids = [im['id'] for im in ann['images']]

    obj_hist = np.zeros(max_objs + 1, np.int64)
    cat_hist = np.zeros(max_cats + 1, np.int64)
    cat_ids = sorted({c['id'] for c in ann.get('categories', [])} |
                     {cid for cids in gt_by_img.values() for cid in cids})
    cat_index = {c: i for i, c in enumerate(cat_ids)}
    per_cat = np.zeros(max(len(cat_ids), 1), np.int64)

    pred_by_img = _group_by_image(pred) if pred is not None else None
    dif_pos = np.zeros(max_cats + 1, np.int64)
    dif_neg = np.zeros(max_cats + 1, np.int64)

    for idx in img_ids:
        cids = gt_by_img.get(idx, [])
        obj_hist[min(len(cids), max_objs)] += 1
        n_cat = len(set(cids))
        cat_hist[min(n_cat, max_cats)] += 1
        for c in cids:
            per_cat[cat_index[c]] += 1
        if pred_by_img is not None:
            n_pred = len(set(pred_by_img.get(idx, [])))
            d = n_cat - n_pred
            if d > 0:
                dif_pos[min(d, max_cats)] += 1
            else:
                dif_neg[min(-d, max_cats)] += 1

    total = max(per_cat.sum(), 1)
    out = dict(obj_hist=obj_hist, cat_hist=cat_hist,
               cat_ids=np.asarray(cat_ids),
               cat_percent=per_cat / total * 100.0)
    if pred_by_img is not None:
        out.update(dif_pos=dif_pos, dif_neg=dif_neg)
    return out


def _bar(path, values, title, xlabel, ylabel, values2=None, labels=None):
    try:
        import matplotlib
        matplotlib.use('AGG')
        import matplotlib.pyplot as plt
    except ImportError:
        print(f'matplotlib unavailable; skipping {path}')
        return
    x = np.arange(len(values))
    w = 0.4
    plt.bar(x, values, width=w, color='g',
            label=labels[0] if labels else None)
    if values2 is not None:
        plt.bar(x + w, values2, width=w, color='r',
                label=labels[1] if labels else None)
    if labels:
        plt.legend()
    plt.title(title)
    plt.xlabel(xlabel)
    plt.ylabel(ylabel)
    plt.savefig(path, dpi=300)
    plt.close()
    print(f'wrote {path}')


def main():
    args = parse_args()
    ann = json.load(open(args.ann_file))
    pred = json.load(open(args.pred)) if args.pred else None
    r = analyze(ann, pred, args.max_objs, args.max_cats)

    print('objects-per-image histogram:', r['obj_hist'].tolist())
    print('categories-per-image histogram:', r['cat_hist'].tolist())
    print('category ids:', r['cat_ids'].tolist())
    print('category percentage:',
          [round(float(v), 2) for v in r['cat_percent']])
    if pred is not None:
        print('gt>pred cat-count diff histogram:', r['dif_pos'].tolist())
        print('pred>=gt cat-count diff histogram:', r['dif_neg'].tolist())

    if args.out_dir:
        os.makedirs(args.out_dir, exist_ok=True)
        _bar(os.path.join(args.out_dir, 'objs_num.png'), r['obj_hist'],
             'Distribution of object numbers per image',
             'object number', 'img number')
        if pred is not None:
            _bar(os.path.join(args.out_dir, 'vis_cats_num.png'),
                 r['cat_hist'][:args.max_cats],
                 'Categories per image: gt vs pred difference',
                 'cats number', 'img number',
                 values2=(r['dif_pos'] + r['dif_neg'])[:args.max_cats],
                 labels=['cats in val', 'difference number'])
        else:
            _bar(os.path.join(args.out_dir, 'vis_cats_num.png'),
                 r['cat_hist'][:args.max_cats],
                 'Distribution of category numbers per image',
                 'cats number', 'img number')
        _bar(os.path.join(args.out_dir, 'cats_num_distribution.png'),
             r['cat_percent'],
             'Distribution of category numbers in dataset',
             'category', 'category percentage / %')


if __name__ == '__main__':
    main()
