"""Random box generators for demos/tests
(ref: mmdet/core/bbox/demodata.py ensure_rng/random_boxes)."""
from __future__ import annotations

import numpy as np


def ensure_rng(rng=None):
    if rng is None:
        return np.random.mtrand._rand
    if isinstance(rng, int):
        return np.random.RandomState(rng)
    return rng


def random_boxes(num=1, scale=1, rng=None):
    """(num, 4) tlbr boxes with x1<=x2, y1<=y2, scaled to ``scale``."""
    rng = ensure_rng(rng)
    tlbr = rng.rand(num, 4).astype(np.float32)
    tl_x = np.minimum(tlbr[:, 0], tlbr[:, 2])
    tl_y = np.minimum(tlbr[:, 1], tlbr[:, 3])
    br_x = np.maximum(tlbr[:, 0], tlbr[:, 2])
    br_y = np.maximum(tlbr[:, 1], tlbr[:, 3])
    return np.stack([tl_x, tl_y, br_x, br_y], -1) * scale
