"""Feature/attention heatmap dumper
(ref: mmdet/models/detectors/two_stage.py:16-63 visualize_attetion —
the ARFE research instrumentation that overlays per-level feature heatmaps
on the input image)."""
from __future__ import annotations

import os

import numpy as np


def visualize_attention(img_path, feats, pre_name, out_dir='.',
                        cmap='jet', alpha=0.5):
    """Overlay per-level 2-D heatmaps on the source image.

    Args:
        img_path: path of the source image.
        feats: list of 2-D arrays (H_l, W_l) — e.g. channel-mean feature
            maps or attention maps (numpy or jax arrays).
        pre_name: filename tag ('att', 'dif', ...). As in the reference,
            ``'dif'`` skips the image underlay.
        out_dir: output directory.
    Returns:
        list of written file paths.
    """
    import cv2
    import matplotlib
    matplotlib.use('AGG')
    import matplotlib.pyplot as plt

    img = cv2.imread(img_path)
    if img is None:
        raise FileNotFoundError(img_path)
    img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    h, w = img.shape[:2]
    os.makedirs(out_dir, exist_ok=True)
    im_name = os.path.splitext(os.path.basename(img_path))[0]
    written = []
    for i, feat in enumerate(feats):
        mask = np.asarray(feat, dtype=np.float32)
        if mask.ndim == 3:          # (H, W, C) -> channel mean
            mask = mask.mean(-1)
        mask = cv2.resize(mask, (w, h))
        denom = mask.max() if mask.max() != 0 else 1.0
        normed = np.uint8(np.clip(mask / denom, 0, 1) * 255)
        plt.figure()
        if pre_name != 'dif':
            plt.imshow(img)
        plt.axis('off')
        plt.imshow(normed, alpha=alpha, interpolation='bilinear',
                   cmap=cmap)
        out = os.path.join(out_dir, f'{im_name}_{pre_name}_{i}.jpg')
        plt.savefig(out, bbox_inches='tight')
        plt.close()
        written.append(out)
    return written
