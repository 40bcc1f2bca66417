"""Visualize pipeline outputs (ref: tools/browse_dataset.py)."""
import argparse
import os

import cv2
import numpy as np


def main():
    p = argparse.ArgumentParser(description='Browse a dataset')
    p.add_argument('config')
    p.add_argument('--output-dir', default='browse_out')
    p.add_argument('--num', type=int, default=10)
    p.add_argument('--split', default='train')
    args = p.parse_args()
    from arfe_tpu import Config
    from arfe_tpu.data import build_dataset

    cfg = Config.fromfile(args.config)
    ds = build_dataset(cfg.todict()['data'][args.split])
    os.makedirs(args.output_dir, exist_ok=True)
    for i in range(min(args.num, len(ds))):
        sample = ds[i]
        img = sample['img']
        meta = sample['img_metas']
        norm = meta.get('img_norm_cfg')
        if norm is not None:
            img = img * norm['std'] + norm['mean']
            if norm['to_rgb']:
                img = img[..., ::-1]
        img = np.clip(img, 0, 255).astype(np.uint8).copy()
        for box in sample.get('gt_bboxes', []):
            x1, y1, x2, y2 = box.astype(int)
            cv2.rectangle(img, (x1, y1), (x2, y2), (0, 255, 0), 2)
        out = os.path.join(args.output_dir, f'{i}.jpg')
        cv2.imwrite(out, img)
        print(f'wrote {out}')


if __name__ == '__main__':
    main()
