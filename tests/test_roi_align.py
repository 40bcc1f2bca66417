"""RoIAlign vs a literal numpy implementation of the detectron2-aligned
algorithm (the spec of ref: ops/roi_align/src/cuda/roi_align_kernel_v2.cu)."""
import jax.numpy as jnp
import numpy as np
import pytest

from arfe_tpu.ops import map_roi_levels, roi_align, roi_align_pyramid


def bilinear_np(feat, y, x):
    """feat: (H, W, C); detectron2 boundary semantics."""
    h, w, c = feat.shape
    if y < -1.0 or y > h or x < -1.0 or x > w:
        return np.zeros(c, feat.dtype)
    y = min(max(y, 0.0), h - 1)
    x = min(max(x, 0.0), w - 1)
    y0, x0 = int(np.floor(y)), int(np.floor(x))
    y1, x1 = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
    ly, lx = y - y0, x - x0
    return (feat[y0, x0] * (1 - ly) * (1 - lx) + feat[y0, x1] * (1 - ly) * lx
            + feat[y1, x0] * ly * (1 - lx) + feat[y1, x1] * ly * lx)


def roi_align_np(feats, rois, out_size, spatial_scale, sample_num,
                 aligned=True):
    oh, ow = out_size
    sn = sample_num
    out = np.zeros((len(rois), oh, ow, feats.shape[-1]), np.float32)
    off = 0.5 if aligned else 0.0
    for r, roi in enumerate(rois):
        b = int(roi[0])
        x1, y1, x2, y2 = roi[1:] * spatial_scale - off
        rw, rh = x2 - x1, y2 - y1
        if not aligned:
            rw, rh = max(rw, 1.0), max(rh, 1.0)
        bh, bw = rh / oh, rw / ow
        for i in range(oh):
            for j in range(ow):
                acc = 0.0
                for si in range(sn):
                    for sj in range(sn):
                        y = y1 + (i + (si + 0.5) / sn) * bh
                        x = x1 + (j + (sj + 0.5) / sn) * bw
                        acc = acc + bilinear_np(feats[b], y, x)
                out[r, i, j] = acc / (sn * sn)
    return out


@pytest.mark.parametrize('aligned', [True, False])
def test_roi_align_matches_numpy(aligned):
    rng = np.random.RandomState(0)
    feats = rng.randn(2, 16, 20, 3).astype(np.float32)
    rois = np.array([
        [0, 4.0, 4.0, 36.0, 28.0],
        [0, 0.0, 0.0, 80.0, 64.0],
        [1, 10.5, 7.25, 50.0, 41.0],
        [1, -4.0, -4.0, 12.0, 12.0],   # partially outside
        [0, 70.0, 50.0, 90.0, 70.0],   # partially outside bottom-right
    ], np.float32)
    ref = roi_align_np(feats, rois, (7, 7), 0.25, 2, aligned)
    got = np.asarray(roi_align(jnp.asarray(feats), jnp.asarray(rois),
                               (7, 7), 0.25, 2, aligned))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_map_roi_levels():
    rois = jnp.array([
        [0, 0, 0, 20, 20],      # scale 20 -> lvl 0
        [0, 0, 0, 120, 120],    # scale 120 ~ 56*2.1 -> lvl 1
        [0, 0, 0, 250, 250],    # -> lvl 2
        [0, 0, 0, 500, 500],    # -> lvl 3
        [0, 0, 0, 2000, 2000],  # clamp 3
    ], jnp.float32)
    lvls = np.asarray(map_roi_levels(rois, 4, finest_scale=56))
    assert lvls.tolist() == [0, 1, 2, 3, 3]


def test_roi_align_pyramid_matches_per_level():
    rng = np.random.RandomState(1)
    b, c = 2, 4
    feats = [jnp.asarray(rng.randn(b, 32 // (2 ** i), 40 // (2 ** i), c)
                         .astype(np.float32)) for i in range(4)]
    strides = [4, 8, 16, 32]
    rois = np.array([
        [0, 3, 3, 60, 50],       # small -> lvl 0
        [1, 0, 0, 120, 110],     # lvl 1
        [0, 5, 5, 250, 120],     # lvl 2
        [1, 0, 0, 500, 460],     # lvl 3
    ], np.float32)
    got = np.asarray(roi_align_pyramid(feats, jnp.asarray(rois), (7, 7),
                                       strides, 56, 2, True))
    lvls = np.asarray(map_roi_levels(jnp.asarray(rois), 4, 56))
    for r in range(len(rois)):
        lvl = int(lvls[r])
        ref = np.asarray(roi_align(feats[lvl], jnp.asarray(rois[r:r + 1]),
                                   (7, 7), 1.0 / strides[lvl], 2, True))
        np.testing.assert_allclose(got[r], ref[0], atol=1e-5,
                                   err_msg=f'roi {r} lvl {lvl}')
