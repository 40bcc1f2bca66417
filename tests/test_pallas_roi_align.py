"""Pallas RoIAlign kernel vs the jnp reference (interpret mode on CPU; the
same comparison was verified on real TPU hardware: median per-roi err ~8e-3
from single-pass MXU interpolation, exact DMA)."""
import jax
import pytest
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from arfe_tpu.ops import map_roi_levels, roi_align_pyramid
from arfe_tpu.ops.pallas_roi_align import roi_align_pallas


def test_pallas_matches_jnp_interpret():
    rng = np.random.RandomState(1)
    b, c = 2, 256
    feats = [jnp.asarray(rng.randn(b, 100 // (2 ** i) + 1, 168 // (2 ** i),
                                   c).astype(np.float32)) for i in range(4)]
    strides = [4, 8, 16, 32]
    r = 24
    xy = rng.uniform(0, 300, (r, 2))
    wh = rng.uniform(20, 200, (r, 2))  # aspect <= window coverage
    rois = np.concatenate([rng.randint(0, b, (r, 1)).astype(np.float32),
                           xy, xy + wh], axis=1).astype(np.float32)
    rois_j = jnp.asarray(rois)
    ref = np.asarray(roi_align_pyramid(feats, rois_j, (7, 7), strides, 56,
                                       2, True))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(roi_align_pallas(feats, rois_j, (7, 7), strides,
                                          56, 2, True))
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_extractor_gates_pallas_off_cpu():
    from arfe_tpu.ops.pallas_roi_align import pallas_supported
    # tests run on CPU: the extractor must take the jnp path
    assert not pallas_supported((7, 7), 2, 4)


def test_pallas_bwd_adaptive_matches_autodiff_interpret():
    """Adaptive-window backward (mixed small/large window buckets) is the
    exact transpose: matches jnp autodiff on rois whose windows don't
    clip."""
    from arfe_tpu.ops.pallas_roi_align import roi_align_pallas_bwd

    rng = np.random.RandomState(3)
    b, c = 2, 256
    feats = [jnp.asarray(rng.randn(b, 128 // (2 ** i), 192 // (2 ** i),
                                   c).astype(np.float32)) for i in range(4)]
    strides = [4, 8, 16, 32]
    # hand-placed rois: small-bucket (extent ~20-25 in level coords) and
    # large-bucket (extent ~42) cases, away from image edges
    rois = np.array([
        [0, 100, 100, 180, 180],     # scale 80 -> lvl 0, extent 20 (small)
        [1, 60, 120, 260, 320],      # scale 200 -> lvl 1, extent 25 (small)
        [0, 200, 100, 370, 150],     # 170x50 -> lvl 0, w extent 42 (large)
        [1, 80, 180, 130, 350],      # 50x170 -> lvl 0, h extent 42 (large)
        [0, 40, 40, 600, 580],       # scale ~550 -> lvl 3, extent 17
        [1, 300, 200, 420, 330],     # scale ~125 -> lvl 1, extent ~15
        [0, 40, 100, 424, 196],      # 384x96 -> lvl 1, (12, 48): WIDE bucket
        [1, 60, 24, 156, 408],       # 96x384 -> lvl 1, (48, 12): full (tall)
        # degenerate border boxes (zero-height at the image bottom, zero-
        # width at the right edge): window origin clamps against the map
        # edge putting samples at exactly rel = wsize-1 — the off-by-one
        # that used to dump every such roi into the full bucket
        [0, 518.8, 512.0, 532.3, 512.0],
        [1, 768.0, 300.0, 768.0, 348.0],
    ], np.float32)
    rois_j = jnp.asarray(rois)
    g = jnp.asarray(rng.randn(len(rois), 7, 7, c).astype(np.float32))

    _, vjp = jax.vjp(
        lambda f: roi_align_pyramid(list(f), rois_j, (7, 7), strides, 56,
                                    2, True), feats)
    (ref,) = vjp(g)
    with pltpu.force_tpu_interpret_mode():
        got = roi_align_pallas_bwd(
            g, rois_j, [f.shape for f in feats], strides, 56, 2, True)
    for lvl, (r_, g_) in enumerate(zip(ref, got)):
        np.testing.assert_allclose(np.asarray(g_), np.asarray(r_),
                                   atol=1e-3, err_msg=f'level {lvl}')


def test_pallas_matches_jnp_14x14_interpret():
    """Mask-branch case: out_size 14 (ns=28 samples/axis, the 32-wide
    vector block)."""
    rng = np.random.RandomState(5)
    b, c = 2, 256
    feats = [jnp.asarray(rng.randn(b, 100 // (2 ** i) + 1, 168 // (2 ** i),
                                   c).astype(np.float32)) for i in range(4)]
    strides = [4, 8, 16, 32]
    r = 12
    xy = rng.uniform(0, 300, (r, 2))
    wh = rng.uniform(20, 200, (r, 2))
    rois = np.concatenate([rng.randint(0, b, (r, 1)).astype(np.float32),
                           xy, xy + wh], axis=1).astype(np.float32)
    rois_j = jnp.asarray(rois)
    ref = np.asarray(roi_align_pyramid(feats, rois_j, (14, 14), strides, 56,
                                       2, True))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(roi_align_pallas(feats, rois_j, (14, 14), strides,
                                          56, 2, True))
    np.testing.assert_allclose(got, ref, atol=1e-4)


@pytest.mark.parametrize('nbuf', ['1', '3'])
def test_pallas_bwd_pipelined_overlap_stress_interpret(nbuf, monkeypatch):
    """The pipelined (nbuf-set) backward must accumulate exactly like the
    serialized kernel when many RoIs share overlapping windows — the
    race-prone case the disjoint buffer sets exist for. Covers RoI counts
    not divisible by nbuf and nr < nbuf; nbuf='1' pins the SERIALIZED
    kernel (a round-4 hardware bug hid there: the quarter-bucket write-back
    branch was missing and only the pipelined kernel was exercised)."""
    import os
    from arfe_tpu.ops.pallas_roi_align import roi_align_pallas_bwd

    monkeypatch.setenv('ARFE_TPU_ROI_BWD_NBUF', nbuf)
    rng = np.random.RandomState(7)
    b, c = 2, 256
    feats = [jnp.asarray(rng.randn(b, 64 // (2 ** i) + 8, 96 // (2 ** i),
                                   c).astype(np.float32)) for i in range(4)]
    strides = [4, 8, 16, 32]
    bases = [np.array([40.0, 50.0, 120.0, 140.0]),     # square, small bucket
             np.array([30.0, 60.0, 414.0, 156.0])]     # 384x96: WIDE bucket
    for r, base in [(2, bases[0]), (7, bases[0]), (7, bases[1])]:
        # jittered clones of one box: every window overlaps every other
        rois = np.concatenate([
            rng.randint(0, b, (r, 1)).astype(np.float32),
            base[None] + rng.uniform(-6, 6, (r, 4)).astype(np.float32),
        ], axis=1).astype(np.float32)
        rois_j = jnp.asarray(rois)
        g = jnp.asarray(rng.randn(r, 7, 7, c).astype(np.float32))
        _, vjp = jax.vjp(
            lambda f: roi_align_pyramid(list(f), rois_j, (7, 7), strides,
                                        56, 2, True), feats)
        (ref,) = vjp(g)
        with pltpu.force_tpu_interpret_mode():
            got = roi_align_pallas_bwd(
                g, rois_j, [f.shape for f in feats], strides, 56, 2, True)
        for lvl, (r_, g_) in enumerate(zip(ref, got)):
            np.testing.assert_allclose(np.asarray(g_), np.asarray(r_),
                                       atol=1e-3,
                                       err_msg=f'r={r} level {lvl}')

