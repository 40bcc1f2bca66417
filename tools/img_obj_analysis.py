"""Dataset statistics: per-image object/category count histograms
(generalized form of ref: tools/img_obj_analysis.py /
get_base_distribution.py, which hardcode precomputed arrays)."""
import argparse
import json
from collections import Counter

import numpy as np


def analyze(ann_file, max_bins=100, plot=None):
    with open(ann_file) as f:
        data = json.load(f)
    objs = Counter()
    cats = {}
    for ann in data['annotations']:
        objs[ann['image_id']] += 1
        cats.setdefault(ann['image_id'], set()).add(ann['category_id'])
    n_imgs = len(data['images'])
    obj_hist = np.zeros(max_bins, int)
    cat_hist = np.zeros(max_bins, int)
    obj_hist[0] = cat_hist[0] = n_imgs - len(objs)
    for c in objs.values():
        obj_hist[min(c, max_bins - 1)] += 1
    for s in cats.values():
        cat_hist[min(len(s), max_bins - 1)] += 1
    print('objs_per_img =', obj_hist.tolist())
    print('cats_per_img =', cat_hist.tolist())
    if plot:
        import matplotlib
        matplotlib.use('AGG')
        import matplotlib.pyplot as plt
        fig, axes = plt.subplots(2, 1, figsize=(10, 6))
        axes[0].bar(np.arange(max_bins), obj_hist, color='g')
        axes[0].set_title('objects per image')
        axes[1].bar(np.arange(max_bins), cat_hist, color='b')
        axes[1].set_title('categories per image')
        fig.savefig(plot)
        print(f'plot saved to {plot}')
    return obj_hist, cat_hist


def main():
    parser = argparse.ArgumentParser(description='dataset statistics')
    parser.add_argument('ann_file')
    parser.add_argument('--bins', type=int, default=100)
    parser.add_argument('--plot', help='output png')
    args = parser.parse_args()
    analyze(args.ann_file, args.bins, args.plot)


if __name__ == '__main__':
    main()
