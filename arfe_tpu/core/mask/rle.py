"""Self-contained COCO run-length encoding utilities.

TPU-native counterpart of pycocotools.mask (maskUtils encode/decode/area/
iou, used by ref: mmdet/datasets/coco.py and apis/test.py
encode_mask_results). pycocotools is unavailable in this environment, so
masks are encoded in the *uncompressed* COCO RLE form — column-major
(Fortran) run lengths starting with a run of zeros:

    {'size': [h, w], 'counts': [n0, n1, n2, ...]}

which is valid COCO-json and round-trips through pycocotools'
``frPyObjects`` on the consumer side.
"""
from __future__ import annotations

import numpy as np


def mask_to_rle(mask):
    """Binary (H, W) array -> uncompressed COCO RLE dict."""
    mask = np.asarray(mask, dtype=np.uint8)
    h, w = mask.shape
    flat = mask.flatten(order='F')
    # run boundaries
    diff = np.nonzero(flat[1:] != flat[:-1])[0] + 1
    runs = np.diff(np.concatenate([[0], diff, [flat.size]]))
    counts = runs.tolist()
    if flat.size and flat[0] == 1:  # counts must start with a zeros run
        counts = [0] + counts
    if not flat.size:
        counts = [0]
    return {'size': [int(h), int(w)], 'counts': counts}


def rle_to_mask(rle):
    """Uncompressed COCO RLE dict -> binary (H, W) uint8 array."""
    h, w = rle['size']
    counts = rle['counts']
    flat = np.zeros(h * w, dtype=np.uint8)
    pos = 0
    val = 0
    for c in counts:
        if val:
            flat[pos:pos + c] = 1
        pos += c
        val ^= 1
    return flat.reshape((h, w), order='F')


def rle_area(rle):
    return int(sum(rle['counts'][1::2]))


def rle_to_bbox(rle):
    """RLE -> [x, y, w, h] tight box (pycocotools toBbox semantics)."""
    m = rle_to_mask(rle)
    ys, xs = np.nonzero(m)
    if ys.size == 0:
        return [0.0, 0.0, 0.0, 0.0]
    x0, x1 = xs.min(), xs.max()
    y0, y1 = ys.min(), ys.max()
    return [float(x0), float(y0), float(x1 - x0 + 1), float(y1 - y0 + 1)]


def ann_to_mask(ann, height, width):
    """Rasterize an annotation's 'segmentation' (polygons, uncompressed
    RLE dict, or an already-binary array) to (H, W) uint8."""
    seg = ann.get('segmentation') if isinstance(ann, dict) else ann
    if seg is None:
        return np.zeros((height, width), np.uint8)
    if isinstance(seg, np.ndarray):
        return seg.astype(np.uint8)
    if isinstance(seg, dict):
        if isinstance(seg.get('counts'), (list, tuple)):
            return rle_to_mask(seg)
        raise ValueError('compressed RLE strings are not supported '
                         '(no pycocotools in this environment)')
    # polygon list-of-lists
    import cv2
    m = np.zeros((height, width), np.uint8)
    pts = [np.asarray(p, np.float64).reshape(-1, 2).round().astype(np.int32)
           for p in seg if len(p) >= 6]
    if pts:
        cv2.fillPoly(m, pts, 1)
    return m


def mask_iou(dt_masks, gt_masks, iscrowd=None):
    """Pairwise mask IoU, pycocotools semantics: for crowd gts the
    denominator is the det area (IoF). dt/gt are lists of (H, W) binary
    arrays; returns (num_dt, num_gt) float64."""
    nd, ng = len(dt_masks), len(gt_masks)
    out = np.zeros((nd, ng), np.float64)
    if nd == 0 or ng == 0:
        return out
    d = np.asarray(dt_masks, bool).reshape(nd, -1)
    g = np.asarray(gt_masks, bool).reshape(ng, -1)
    inter = d.astype(np.float64) @ g.T.astype(np.float64)
    d_area = d.sum(1, dtype=np.float64)
    g_area = g.sum(1, dtype=np.float64)
    for gi in range(ng):
        crowd = bool(iscrowd[gi]) if iscrowd is not None else False
        denom = d_area if crowd else d_area + g_area[gi] - inter[:, gi]
        out[:, gi] = np.where(denom > 0, inter[:, gi] / np.maximum(denom, 1),
                              0.0)
    return out


def split_combined_polys(polys, poly_lens, polys_per_mask):
    """Split flat per-image polygon buffers back into per-mask polygon
    lists (ref: core/mask/utils.py:4-31). ``polys`` is a list (per image)
    of flat 1-D arrays; ``poly_lens`` the per-polygon lengths;
    ``polys_per_mask`` the polygon count of each mask."""
    out = []
    for img_polys, lens, per_mask in zip(polys, poly_lens, polys_per_mask):
        lens = list(np.asarray(lens).tolist())
        per_mask = list(np.asarray(per_mask).tolist())
        flat = np.asarray(img_polys)
        pieces = []
        off = 0
        for ln in lens:
            pieces.append(flat[off:off + int(ln)])
            off += int(ln)
        masks = []
        pi = 0
        for n in per_mask:
            masks.append(pieces[pi:pi + int(n)])
            pi += int(n)
        out.append(masks)
    return out
