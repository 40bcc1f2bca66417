"""Hand-written Pallas RoIAlign kernel (the north-star hot loop,
BASELINE.json: "RoIAlign bilinear gather ... hand-written Pallas kernels").

Why: XLA's row-gather on TPU runs at ~80-175 GB/s (measured) — ~10-20% of
v5e HBM bandwidth — making RoIAlign the dominant cost of the two-stage path.
This kernel instead DMAs one contiguous-window block per RoI from the RoI's
assigned FPN level (HBM -> VMEM, double-buffered across the grid) and does
the bilinear interpolation as two small MXU matmuls (one-hot selection
matrices), which is how a TPU wants to compute it.

Window: (WH=48, WW=64) in level coordinates. FPN level assignment
(finest_scale=56) bounds RoI size in its level's coords to sqrt area < 28,
so the window covers all RoIs up to ~3:1 (tall) / ~5:1 (wide) aspect; the
rare outliers have their sample coords clipped into the window (sub-pixel
approximation on extreme shapes only).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .roi_align import map_roi_levels

WH, WW = 48, 64
# small-window bucket for the adaptive backward: FPN level assignment puts
# the bulk of RoIs at sqrt(area) 14-28 in level coords, so most windows fit
# (32, 40) (40 = 28 extent + bilinear pair + up to 7 cols of 8-alignment
# slop); only high-aspect / scale-clamped outliers need the full (48, 64).
# DMA bytes drop 2.4x for the small bucket.
SWH, SWW = 32, 40
# third (tiny) bucket: in-level sqrt(area) spans 14-28, so roughly the
# smaller half of RoIs (extent <= 22 rows / <= 23-30 cols after 8-aligned
# x-origin slop) fits (24, 32) — another 1.6x fewer DMA bytes vs (32, 40).
TWH, TWW = 24, 32
# fourth (quarter) bucket: measured on flagship bs8 proposals, 70% of the
# AR-RFF triple fits (16, 24) (extent <= 14 rows); 2x fewer bytes again.
QWH, QWW = 16, 24
# fifth (wide) bucket: any roi scale-CLAMPED to the top level (stride 32)
# has in-level extent <= (800/32, 1344/32) = (25, 42) -> (26, 49+slop)
# after the bilinear pair and 8-aligned x-origin, which the ladder's jump
# from (32, 40) to (48, 64) missed entirely. The round-5 TRAIN roi mix
# (512 sampled/img x 3 AR-RFF variants, random-init proposals) put 60.5%
# of rois in the full bucket for exactly this reason; (32, 56) moves
# 1.7x fewer bytes for all of them.
VWH, VWW = 32, 56


# bucket table shared by the fwd/bwd kernels and the window prep:
# (sm code, window rows, window cols), smallest first; 0 = full window
_BUCKETS = ((3, QWH, QWW), (2, TWH, TWW), (1, SWH, SWW), (4, VWH, VWW),
            (0, WH, WW))


# scalar-vector block lane width for ns samples per axis: 16 covers the
# 7x7@2 bbox case, 32 the 14x14@2 mask case
def _vec_width(ns):
    return 16 if ns <= 16 else 32


def _kernel(lvl_ref, b_ref, yo_ref, xo_ref, sm_ref, y0_ref, vec_ref,
            f0, f1, f2, f3, out_ref, win, sems, *, out_size, sample_num, c,
            double_buffer=True):
    num_levels = 4
    r = pl.program_id(0)
    nr = pl.num_programs(0)
    feats = (f0, f1, f2, f3)

    def start_dma(slot, row):
        lvl = lvl_ref[row]
        b = b_ref[row]
        yo = yo_ref[row]
        # window x-origin is 8-aligned (wrapper guarantees; hint Mosaic so
        # the HBM slice provably respects the (8, 128) tiling)
        xo = pl.multiple_of(xo_ref[row], 8)
        sm = sm_ref[row]
        for k in range(num_levels):
            # adaptive window: the smaller buckets move 2.4x-8x fewer
            # bytes; the kernel math is window-size agnostic (one-hot
            # weights never touch the stale region)
            for code, bh, bw in _BUCKETS:
                @pl.when((lvl == k) & (sm == code))
                def _(k=k, bh=bh, bw=bw):
                    pltpu.make_async_copy(
                        feats[k].at[b, pl.ds(yo, bh), pl.ds(xo, bw), :],
                        win.at[slot, pl.ds(0, bh), pl.ds(0, bw)],
                        sems.at[slot]).start()

    # one-time zero of the scratch: small-window rois leave the tail of
    # the window stale, and uninitialized VMEM bits can decode to NaN
    # (0 * NaN would poison the one-hot matmuls). After this, stale data
    # is always finite feature values, killed by the zero weights.
    @pl.when(r == 0)
    def _():
        win[...] = jnp.zeros_like(win)

    if double_buffer:
        @pl.when(r == 0)
        def _():
            start_dma(0, 0)

        @pl.when(r + 1 < nr)
        def _():
            start_dma((r + 1) % 2, r + 1)
        slot = r % 2
    else:
        start_dma(0, r)
        slot = 0
    # wait: descriptor shape is level-independent but window-size specific
    for code, bh, bw in _BUCKETS:
        @pl.when(sm_ref[r] == code)
        def _(bh=bh, bw=bw):
            pltpu.make_async_copy(
                f0.at[0, pl.ds(0, bh), pl.ds(0, bw), :],
                win.at[slot, pl.ds(0, bh), pl.ds(0, bw)],
                sems.at[slot]).wait()

    oh, ow = out_size
    sn = sample_num
    ns = oh * sn  # samples per axis (14 for 7x7 @ 2)
    v = vec_ref[0]  # (8, VW) f32: _, _, wy0, wy1, x0r, x1r, wx0, wx1
    wy0, wy1 = v[2, :ns], v[3, :ns]
    x0r, x1r, wx0, wx1 = v[4, :ns], v[5, :ns], v[6, :ns], v[7, :ns]

    # x-interp selection matrix with the sn-fold: avg-pooling the sn
    # x-samples of each output bin is linear, so fold it into the
    # selection weights — ow matmul rows instead of ns
    ix = jax.lax.broadcasted_iota(jnp.int32, (ns, WW), 1).astype(jnp.float32)
    sx = ((ix == x0r[:, None]).astype(jnp.float32) * wx0[:, None]
          + (ix == x1r[:, None]).astype(jnp.float32) * wx1[:, None])
    sxp = sx.reshape(ow, sn, WW).sum(axis=1)     # (ow, WW)

    # y-interp: dynamic 2-row slice + VPU FMA per sample row (a one-hot
    # matmul over all WH rows would run the MXU at <5% utilization),
    # accumulated straight into the oh output bins — the pooling mean
    # is linear in the rows too, so the kernel runs oh selection dots
    # (K=WW) instead of ns and the stack/reshape/mean epilogue vanishes
    inv = 1.0 / float(sn * sn)
    for oy in range(oh):
        row = None
        for s in range(sn):
            iy = oy * sn + s
            y0s = y0_ref[r * ns + iy]
            pair = win[slot, pl.ds(y0s, 2)].astype(jnp.float32)  # (2,WW,c)
            add = pair[0] * wy0[iy] + pair[1] * wy1[iy]          # (WW, c)
            row = add if row is None else row + add
        pooled = jnp.dot(sxp, row,
                         preferred_element_type=jnp.float32) * inv
        out_ref[0, oy] = pooled.astype(out_ref.dtype)            # (ow, c)


def _window_prep(rois, real_sizes, pad_sizes, target_lvls,
                 featmap_strides, finest_scale, out_size, sample_num,
                 aligned):
    """Shared fwd/bwd coordinate prep: sampling-grid bilinear params,
    adaptive window-bucket selection, and the packed scalar-prefetch /
    vector-block arrays the kernels consume.

    Returns (lvl_arr, b_arr, yorg, xorg, sm_arr, y0_flat, vec).
    """
    oh, ow = out_size
    sn = sample_num
    ns = oh * sn
    num_levels = len(featmap_strides)
    if target_lvls is None:
        target_lvls = map_roi_levels(rois, num_levels, finest_scale)
    lvl_h = jnp.asarray(real_sizes[:, 0])[target_lvls].astype(jnp.float32)
    lvl_w = jnp.asarray(real_sizes[:, 1])[target_lvls].astype(jnp.float32)
    pad_h = jnp.asarray(pad_sizes[:, 0])[target_lvls].astype(jnp.float32)
    pad_w = jnp.asarray(pad_sizes[:, 1])[target_lvls].astype(jnp.float32)
    scales = jnp.asarray(
        np.array([1.0 / s for s in featmap_strides], np.float32))
    lvl_scale = scales[target_lvls]

    offset = 0.5 if aligned else 0.0
    x1 = rois[:, 1] * lvl_scale - offset
    y1 = rois[:, 2] * lvl_scale - offset
    x2 = rois[:, 3] * lvl_scale - offset
    y2 = rois[:, 4] * lvl_scale - offset
    roi_w = x2 - x1
    roi_h = y2 - y1
    if not aligned:
        roi_w = jnp.maximum(roi_w, 1.0)
        roi_h = jnp.maximum(roi_h, 1.0)
    grid_pos = (np.arange(ns) // sn) + ((np.arange(ns) % sn) + 0.5) / sn
    grid_pos = jnp.asarray(grid_pos, jnp.float32)
    ys = y1[:, None] + grid_pos[None, :] * (roi_h / oh)[:, None]
    xs = x1[:, None] + grid_pos[None, :] * (roi_w / ow)[:, None]

    def axis_params(coord, size, pad_size, wsize, align=1, pair_mode=False):
        valid = (coord > -1.0) & (coord < size[:, None])
        cc = jnp.clip(coord, 0.0, size[:, None] - 1.0)
        # origin from the MIN sample (== the first sample for well-formed
        # boxes; INVERTED boxes — x2<x1 / y2<y1 garbage proposals an
        # untrained RPN emits and the reference feeds to RoIAlign as-is —
        # sample descending, and an origin from the first sample would
        # clip everything below it)
        org = jnp.clip(jnp.floor(cc.min(axis=-1)), 0,
                       jnp.maximum(pad_size - wsize, 0.0))
        if align > 1:  # DMA tiling alignment (keeps org <= its old value)
            org = jnp.floor(org / align) * align
        rel = jnp.clip(cc - org[:, None], 0.0, wsize - 1.0)
        i0 = jnp.floor(rel)
        if pair_mode:
            # kernel reads rows (i0, i0+1): keep the pair inside the
            # window; w1 -> 1 compensates at the top edge
            i0 = jnp.minimum(i0, wsize - 2.0)
            i1 = i0 + 1.0
        else:
            # neighbor stays inside both the real extent and the window
            i1 = jnp.minimum(jnp.minimum(i0 + 1.0,
                                         size[:, None] - org[:, None]
                                         - 1.0), wsize - 1.0)
            i1 = jnp.maximum(i1, i0)
        w1 = rel - i0
        w0 = (1.0 - w1) * valid
        w1 = w1 * valid
        return org.astype(jnp.int32), i0, i1, w0, w1

    # adaptive window buckets (see _kernel): a bucket is exact whenever
    # the sample extents fit its window unclipped; pick the smallest
    # fitting bucket per RoI (sm codes in _BUCKETS, 0 = full)
    cc_y = jnp.clip(ys, 0.0, lvl_h[:, None] - 1.0)
    cc_x = jnp.clip(xs, 0.0, lvl_w[:, None] - 1.0)
    sm_arr = None
    picked = None
    fitted = None
    for code, bwh, bww in _BUCKETS:
        yp = axis_params(ys, lvl_h, pad_h, bwh, pair_mode=True)
        xp = axis_params(xs, lvl_w, pad_w, bww, align=8)
        cand = yp + xp
        if code != 0:
            # exact while every clamped sample stays INSIDE the window
            # (rel <= wsize-1): at rel = wsize-1 the y pair-clamp lands
            # (i0=wsize-2, w1=1 -> reads row org+wsize-1 exactly) and the
            # x path gets (i0=i1=wsize-1, w1=0). The earlier `<= w-2`
            # check was off by one: a roi clamped against the image
            # bottom/right edge sits at exactly rel = wsize-1 from its
            # edge-clamped origin, so EVERY degenerate border proposal
            # (y1=y2=H, common from an untrained RPN) cascaded through
            # all buckets into the full (48,64) window — 60% of the
            # round-5 train roi mix.
            fits = ((cc_y.max(-1) - yp[0]) <= bwh - 1) & \
                ((cc_x.max(-1) - xp[0]) <= bww - 1)
            take = fits if picked is None else (fits & ~fitted)
            if picked is None:
                picked, fitted = cand, fits
                sm_arr = jnp.where(fits, code, 0).astype(jnp.int32)
            else:
                picked = tuple(
                    jnp.where(take[:, None] if p.ndim == 2 else take,
                              c_, p)
                    for c_, p in zip(cand, picked))
                fitted = fitted | fits
                sm_arr = jnp.where(take, code, sm_arr)
        else:
            take = ~fitted
            picked = tuple(
                jnp.where(take[:, None] if p.ndim == 2 else take, c_, p)
                for c_, p in zip(cand, picked))
    (yorg, y0r, y1r, wy0, wy1, xorg, x0r, x1r, wx0, wx1) = picked

    lvl_arr = target_lvls.astype(jnp.int32)
    b_arr = rois[:, 0].astype(jnp.int32)
    y0_flat = y0r.astype(jnp.int32).reshape(-1)   # (R*ns,)
    vw = _vec_width(ns)
    vec = jnp.stack([y0r, y1r, wy0, wy1, x0r, x1r, wx0, wx1], axis=1)
    vec = jnp.pad(vec, ((0, 0), (0, 0), (0, vw - ns)))     # (R, 8, vw)
    return lvl_arr, b_arr, yorg, xorg, sm_arr, y0_flat, vec


def roi_align_pallas(feats, rois, out_size=(7, 7),
                     featmap_strides=(4, 8, 16, 32), finest_scale=56,
                     sample_num=2, aligned=True, target_lvls=None,
                     double_buffer=True):
    """Drop-in for ops.roi_align.roi_align_pyramid (4-level FPN case).

    feats: list of 4 NHWC arrays; rois (R, 5). Returns (R, oh, ow, C) f32.
    """
    if isinstance(out_size, int):
        out_size = (out_size, out_size)
    if sample_num <= 0:
        sample_num = 2
    oh, ow = out_size
    sn = sample_num
    ns = oh * sn
    assert ns <= 32, 'vector block packs up to 32 samples per axis'
    num_levels = len(featmap_strides)
    assert num_levels == 4, 'pallas kernel is specialized to 4 levels'
    feats = list(feats[:num_levels])
    b, _, _, c = feats[0].shape
    real_sizes = np.array([(f.shape[1], f.shape[2]) for f in feats],
                          np.int32)
    # pad small levels so a full window always exists (coordinate clipping
    # in _window_prep still uses the REAL sizes)
    for i, f in enumerate(feats):
        ph = max(0, WH - f.shape[1])
        pw = max(0, WW - f.shape[2])
        if ph or pw:
            feats[i] = jnp.pad(f, ((0, 0), (0, ph), (0, pw), (0, 0)))
    pad_sizes = np.array([(f.shape[1], f.shape[2]) for f in feats],
                         np.int32)

    r = rois.shape[0]
    (lvl_arr, b_arr, yorg, xorg, sm_arr, y0_flat, vec) = _window_prep(
        rois, real_sizes, pad_sizes, target_lvls, featmap_strides,
        finest_scale, out_size, sn, aligned)

    kernel = functools.partial(_kernel, out_size=out_size,
                               sample_num=sn, c=c,
                               double_buffer=double_buffer)

    def one_call(args, cr):
        lvl_c, b_c, yo_c, xo_c, sm_c, y0_c, vec_c = args
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=6,
            grid=(cr,),
            in_specs=[
                pl.BlockSpec((1, 8, _vec_width(ns)),
                             lambda i, *refs: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec((1, oh, ow, c),
                                   lambda i, *refs: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, WH, WW, c), feats[0].dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((cr, oh, ow, c), jnp.float32),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(lvl_c, b_c, yo_c, xo_c, sm_c, y0_c, vec_c, *feats)

    # chunk the grid so every scalar-prefetch operand stays well inside
    # the ~1 MB SMEM budget (y0 is R*ns i32 — 24000 rois at ns=14 is
    # 1.34 MB and fails Mosaic allocation)
    chunk = _smem_chunk_rois(ns)
    outs = []
    for s0 in range(0, r, chunk):
        cr = min(chunk, r - s0)
        args = (lvl_arr[s0:s0 + cr], b_arr[s0:s0 + cr],
                yorg[s0:s0 + cr], xorg[s0:s0 + cr], sm_arr[s0:s0 + cr],
                y0_flat[s0 * ns:(s0 + cr) * ns], vec[s0:s0 + cr])
        outs.append(one_call(args, cr))
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
    # match the jnp fallback's dtype contract (compute dtype follows the
    # input) — also keeps the custom-vjp cotangent dtype consistent with
    # the jnp-derived backward under bf16 training
    return out.astype(feats[0].dtype)


def _smem_chunk_rois(ns, budget=700 * 1024, per_roi_extra=5):
    """Max grid rows per pallas_call so the scalar-prefetch SMEM payload
    (y0: ns i32/roi + lvl/b/yo/xo/sm) stays under ``budget`` bytes."""
    per_roi = 4 * (ns + per_roi_extra)
    return max(512, (budget // per_roi) // 512 * 512)


def pallas_supported(out_size, sample_num, num_levels, channels=None):
    """Whether the kernel covers this configuration (7x7-ish outputs on a
    4-level FPN, running on a real TPU backend). The window DMA slices the
    minor (channel) dim, so C must be lane-aligned (multiple of 128)."""
    if isinstance(out_size, int):
        out_size = (out_size, out_size)
    sn = sample_num if sample_num > 0 else 2
    try:
        import jax as _jax
        on_tpu = _jax.default_backend() == 'tpu'
    except Exception:
        on_tpu = False
    if channels is not None and channels % 128 != 0:
        return False
    return (on_tpu and num_levels == 4
            and out_size[0] * sn <= 32 and out_size[1] * sn <= 32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def roi_align_auto(feats, rois, out_size, featmap_strides, finest_scale,
                   sample_num, aligned):
    """Pallas forward + jnp-derived backward: training gradients flow
    through the reference jnp implementation's VJP while inference gets the
    fast kernel."""
    return roi_align_pallas(list(feats), rois, out_size,
                            list(featmap_strides), finest_scale, sample_num,
                            aligned)


def _raa_fwd(feats, rois, out_size, featmap_strides, finest_scale,
             sample_num, aligned):
    out = roi_align_auto(feats, rois, out_size, featmap_strides,
                         finest_scale, sample_num, aligned)
    return out, (tuple(feats), rois)


def _raa_bwd(out_size, featmap_strides, finest_scale, sample_num, aligned,
             res, g):
    from .roi_align import roi_align_pyramid
    feats, rois = res
    # FEATURE grads only — the reference CUDA RoIAlign backward produces
    # no rois gradient (rois are effectively detached; ref:
    # ops/roi_align kernels). Default path: the adaptive-window Pallas
    # DMA-accumulate backward (the fixed-window variant only reached
    # parity with XLA's 28 ms scatter; the small-window bucket moves
    # 2.4x fewer bytes per typical RoI). ARFE_TPU_PALLAS_ROI_BWD=0
    # falls back to the jnp vjp gather-transpose scatter.
    import os
    rois_c = jax.lax.stop_gradient(rois)
    use_pallas = os.environ.get('ARFE_TPU_PALLAS_ROI_BWD', '1') != '0'
    if use_pallas and pallas_supported(out_size, sample_num,
                                       len(featmap_strides),
                                       feats[0].shape[-1]):
        df = roi_align_pallas_bwd(g.astype(jnp.float32), rois_c,
                                  [f.shape for f in feats],
                                  list(featmap_strides), finest_scale,
                                  sample_num, aligned)
        df = tuple(d.astype(f.dtype) for d, f in zip(df, feats))
        return df, jnp.zeros_like(rois)
    _, vjp = jax.vjp(
        lambda f: roi_align_pyramid(list(f), rois_c, out_size,
                                    list(featmap_strides), finest_scale,
                                    sample_num, aligned), feats)
    (df,) = vjp(g)
    return df, jnp.zeros_like(rois)


roi_align_auto.defvjp(_raa_fwd, _raa_bwd)



# A fused-triple AR-RFF kernel (one window DMA serving all three roi
# variants when they share an FPN level, 97.9% of flagship proposals)
# lived here through round 4: hardware-validated bit-exact but NEUTRAL
# end-to-end (62.9 -> 62.8 ms bs8 — extraction is per-roi compute-bound
# at the real mix, not DMA-bound). Removed round 5; measurement kept in
# CLAUDE.md. The batched single-roi kernel on the (3R,5) concat is the
# shipping AR-RFF path.



def _bwd_base_rows(vec_ref, g_ref, *, out_size, sample_num, c):
    """Shared bwd compute: x-scatter the (oh, ow, c) cotangent into
    window columns with ONE sn-folded one-hot matmul.

    Returns (base, wy0, wy1): ``base[:, oy]`` is the (WW, c) column-
    scattered gradient row shared by every y-sample in output bin
    ``oy`` (already carrying the 1/sn^2 pooling mean), and wy0/wy1 are
    the per-y-sample bilinear weights. The caller then accumulates
    ``base`` into the window with per-sample 2-row slice RMW adds —
    the exact transpose of the forward's y-interp slices. The earlier
    formulation (one-hot y-scatter matmul over ALL WH window rows,
    N = WW*c = 16384 -> 128 MXU tiles at ~11% M-utilization) was the
    measured ~4 us/roi bottleneck of the train extract backward.

    Zero-weight guarantee: x0r/x1r <= bucket_w - 1 for the RoI's
    picked bucket, so iota columns beyond the bucket get exactly-zero
    one-hot weights — the compute needs NO bucket branching; stale
    window columns only ever receive +0.
    """
    oh, ow = out_size
    sn = sample_num
    ns = oh * sn
    v = vec_ref[0]                      # (8, VW)
    wy0, wy1 = v[2, :ns], v[3, :ns]
    x0r, x1r, wx0, wx1 = v[4, :ns], v[5, :ns], v[6, :ns], v[7, :ns]

    ixT = jax.lax.broadcasted_iota(jnp.int32, (WW, ns), 0).astype(
        jnp.float32)
    sxT = ((ixT == x0r[None, :]).astype(jnp.float32) * wx0[None, :]
           + (ixT == x1r[None, :]).astype(jnp.float32) * wx1[None, :])
    # fold the sn x-samples of each output bin into one column (as a
    # tiny one-hot matmul: Mosaic cannot shape-cast the lane dim)
    fold = (jax.lax.broadcasted_iota(jnp.int32, (ns, ow), 0) // sn
            == jax.lax.broadcasted_iota(jnp.int32, (ns, ow), 1)
            ).astype(jnp.float32)
    sxp = jnp.dot(sxT, fold, preferred_element_type=jnp.float32)
    g = g_ref[0].astype(jnp.float32)                    # (oh, ow, c)
    gT = g.transpose(1, 0, 2).reshape(ow, oh * c)
    base = jnp.dot(sxp, gT, preferred_element_type=jnp.float32)
    base = base.reshape(WW, oh, c) * (1.0 / float(sn * sn))
    return base, wy0, wy1


def _bwd_kernel(lvl_ref, b_ref, yo_ref, xo_ref, sm_ref, y0_ref, vec_ref,
                g_ref, z0, z1, z2, z3, o0, o1, o2, o3, win, rsem, wsem, *,
                out_size, sample_num, c):
    """Scatter-transpose of :func:`_kernel`: per RoI, read-modify-write
    its gradient-buffer window. Strictly serialized (no double
    buffering) — consecutive RoI windows may overlap, so each write must
    land before the next read. Adaptive window: RoIs take the smallest
    fitting bucket (sm=2 tiny (TWH, TWW) / 1 small (SWH, SWW) / 0 full),
    moving up to 4x fewer bytes than the worst-case window."""
    del z0, z1, z2, z3  # aliased to o0..o3; accumulate through the outs
    r = pl.program_id(0)
    outs = (o0, o1, o2, o3)
    lvl = lvl_ref[r]
    b = b_ref[r]
    yo = yo_ref[r]
    xo = pl.multiple_of(xo_ref[r], 8)
    sm = sm_ref[r]
    for k in range(4):
        for code, bh, bw in _BUCKETS:
            @pl.when((lvl == k) & (sm == code))
            def _(k=k, bh=bh, bw=bw):
                pltpu.make_async_copy(
                    outs[k].at[b, pl.ds(yo, bh), pl.ds(xo, bw), :],
                    win.at[pl.ds(0, bh), pl.ds(0, bw)], rsem).start()

    for code, bh, bw in _BUCKETS:
        @pl.when(sm == code)
        def _(bh=bh, bw=bw):
            pltpu.make_async_copy(
                o0.at[0, pl.ds(0, bh), pl.ds(0, bw), :],
                win.at[pl.ds(0, bh), pl.ds(0, bw)], rsem).wait()

    sn = sample_num
    ns = out_size[0] * sn
    base, wy0, wy1 = _bwd_base_rows(vec_ref, g_ref, out_size=out_size,
                                    sample_num=sn, c=c)
    # y-scatter: per-sample 2-row slice RMW (transpose of the fwd's
    # y-interp dynamic slices); rows y0..y0+1 are in-window by the
    # prep's pair clamp
    for iy in range(ns):
        y0s = y0_ref[r * ns + iy]
        row = base[:, iy // sn]                        # (WW, c)
        pair = jnp.stack([row * wy0[iy], row * wy1[iy]])
        win[pl.ds(y0s, 2)] = win[pl.ds(y0s, 2)] + pair

    for k in range(4):
        for code, bh, bw in _BUCKETS:
            @pl.when((lvl == k) & (sm == code))
            def _(k=k, bh=bh, bw=bw):
                pltpu.make_async_copy(
                    win.at[pl.ds(0, bh), pl.ds(0, bw)],
                    outs[k].at[b, pl.ds(yo, bh), pl.ds(xo, bw), :],
                    wsem).start()

    for code, bh, bw in _BUCKETS:
        @pl.when(sm == code)
        def _(bh=bh, bw=bw):
            pltpu.make_async_copy(
                win.at[pl.ds(0, bh), pl.ds(0, bw)],
                o0.at[0, pl.ds(0, bh), pl.ds(0, bw), :], wsem).wait()


def _bwd_kernel_pipe(lvl_ref, b_ref, yo_ref, xo_ref, sm_ref, y0_ref, vec_ref,
                     g_ref, z0, z1, z2, z3, o0, o1, o2, o3, win, rsem, wsem,
                     *, out_size, sample_num, c, nbuf, nr):
    """Pipelined variant of :func:`_bwd_kernel`: RoI ``i`` accumulates into
    gradient-buffer set ``i % nbuf`` (the sets are folded into the batch
    dim of the out buffers — ``b_ref`` rows are ``set * B + b`` — so the
    DMA branches are identical to the serialized kernel). Disjoint sets
    make concurrent read-modify-write cycles race-free: the window read
    for RoI ``r + 1`` only has to wait for the write of RoI ``r + 1 -
    nbuf`` (same scratch slot and buffer set), which by then has had
    ``nbuf - 2`` full grid steps to drain. With nbuf >= 3 both the read
    and the write latency hide behind compute; the serialized kernel
    paid read + compute + write on every RoI. XLA sums the sets after
    the kernel (a cheap dense add vs ~3 MB/RoI of serialized DMA)."""
    del z0, z1, z2, z3  # aliased to o0..o3; accumulate through the outs
    r = pl.program_id(0)
    outs = (o0, o1, o2, o3)
    sizes = _BUCKETS

    def start_read(row, slot):
        lvl = lvl_ref[row]
        b = b_ref[row]
        yo = yo_ref[row]
        xo = pl.multiple_of(xo_ref[row], 8)
        sm = sm_ref[row]
        for k in range(4):
            for code, bh, bw in sizes:
                @pl.when((lvl == k) & (sm == code))
                def _(k=k, bh=bh, bw=bw):
                    pltpu.make_async_copy(
                        outs[k].at[b, pl.ds(yo, bh), pl.ds(xo, bw), :],
                        win.at[slot, pl.ds(0, bh), pl.ds(0, bw)],
                        rsem.at[slot]).start()

    def wait_dma(sem, slot, sm):
        for code, bh, bw in sizes:
            @pl.when(sm == code)
            def _(bh=bh, bw=bw):
                pltpu.make_async_copy(
                    o0.at[0, pl.ds(0, bh), pl.ds(0, bw), :],
                    win.at[slot, pl.ds(0, bh), pl.ds(0, bw)],
                    sem.at[slot]).wait()

    def start_write(row, slot):
        lvl = lvl_ref[row]
        b = b_ref[row]
        yo = yo_ref[row]
        xo = pl.multiple_of(xo_ref[row], 8)
        sm = sm_ref[row]
        for k in range(4):
            for code, bh, bw in sizes:
                @pl.when((lvl == k) & (sm == code))
                def _(k=k, bh=bh, bw=bw):
                    pltpu.make_async_copy(
                        win.at[slot, pl.ds(0, bh), pl.ds(0, bw)],
                        outs[k].at[b, pl.ds(yo, bh), pl.ds(xo, bw), :],
                        wsem.at[slot]).start()

    slot = jax.lax.rem(r, nbuf)

    @pl.when(r == 0)
    def _():
        start_read(0, 0)

    # prefetch read(r+1): its slot/buffer set was last written by RoI
    # r+1-nbuf, whose write started nbuf-1 steps ago — wait it, then read
    nxt = r + 1

    @pl.when(nxt < nr)
    def _():
        slot_n = jax.lax.rem(nxt, nbuf)
        jprev = nxt - nbuf

        @pl.when(jprev >= 0)
        def _():
            wait_dma(wsem, slot_n, sm_ref[jnp.maximum(jprev, 0)])
        start_read(nxt, slot_n)

    wait_dma(rsem, slot, sm_ref[r])

    sn = sample_num
    ns = out_size[0] * sn
    base, wy0, wy1 = _bwd_base_rows(vec_ref, g_ref, out_size=out_size,
                                    sample_num=sn, c=c)
    for iy in range(ns):
        y0s = y0_ref[r * ns + iy]
        row = base[:, iy // sn]                        # (WW, c)
        pair = jnp.stack([row * wy0[iy], row * wy1[iy]])
        win[slot, pl.ds(y0s, 2)] = win[slot, pl.ds(y0s, 2)] + pair

    start_write(r, slot)

    # epilogue: the last min(nbuf, nr) writes have no later read to wait
    # on them — drain here so the kernel exits with balanced semaphores
    @pl.when(r == nr - 1)
    def _():
        for kk in range(min(nbuf, nr)):
            j = nr - 1 - kk
            wait_dma(wsem, j % nbuf, sm_ref[j])


def roi_align_pallas_bwd(g, rois, feat_shapes,
                         featmap_strides=(4, 8, 16, 32), finest_scale=56,
                         sample_num=2, aligned=True, target_lvls=None):
    """Feature gradients of :func:`roi_align_pallas` (exact transpose of
    the kernel's interpolation, incl. its window clipping): per-RoI
    window DMA accumulate, strictly serialized because neighboring RoI
    windows may overlap.

    The fixed-(48, 64)-window variant only reached parity with XLA's
    autodiff scatter (27.8 vs 28 ms at 2048 rois) because it moved
    ~3.1 MB per RoI each way regardless of extent. The adaptive
    (24, 32)/(32, 40)/(48, 64) buckets break that floor: 64.9 ms vs
    XLA's 139.1 at 8000 rois (2.14x), so this is the DEFAULT backward
    (:func:`_raa_bwd`; ARFE_TPU_PALLAS_ROI_BWD=0 reverts to the jnp
    vjp). Also the transpose oracle: levels whose RoIs never clip
    match jnp autodiff exactly.

    Args:
        g: (R, oh, ow, C) cotangent.
        feat_shapes: list of 4 (B, H, W, C) level shapes.
    Returns:
        list of 4 per-level f32 gradients.
    """
    out_size = (g.shape[1], g.shape[2])
    if sample_num <= 0:
        sample_num = 2
    oh, ow = out_size
    sn = sample_num
    ns = oh * sn
    assert ns <= 32
    num_levels = len(featmap_strides)
    assert num_levels == 4
    feat_shapes = [tuple(s) for s in feat_shapes[:num_levels]]
    b = feat_shapes[0][0]
    c = feat_shapes[0][3]
    real_sizes = np.array([(s[1], s[2]) for s in feat_shapes], np.int32)
    pad_sizes = np.array([(max(s[1], WH), max(s[2], WW))
                          for s in feat_shapes], np.int32)

    r = rois.shape[0]
    (lvl_arr, b_arr, yorg, xorg, sm_arr, y0_flat, vec) = _window_prep(
        rois, real_sizes, pad_sizes, target_lvls, featmap_strides,
        finest_scale, out_size, sn, aligned)

    # pipelined RMW: nbuf disjoint gradient-buffer sets folded into the
    # batch dim (row = set * B + b); VMEM holds nbuf window slots, so cap
    # nbuf where channels would blow the ~16 MB budget. nbuf=1 keeps the
    # strictly serialized kernel.
    import os
    nbuf = int(os.environ.get('ARFE_TPU_ROI_BWD_NBUF', '3'))
    max_slots = max(1, int(12 * 2 ** 20 / (WH * WW * c * 4)))
    nbuf = max(1, min(nbuf, max_slots, r))

    if nbuf > 1:
        b_arr = (jnp.arange(r, dtype=jnp.int32) % nbuf) * b + b_arr
        scratch = [
            pltpu.VMEM((nbuf, WH, WW, c), jnp.float32),
            pltpu.SemaphoreType.DMA((nbuf,)),
            pltpu.SemaphoreType.DMA((nbuf,)),
        ]
        nrows = nbuf * b
    else:
        scratch = [
            pltpu.VMEM((WH, WW, c), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ]
        nrows = b
    outs = [jnp.zeros((nrows, int(ph), int(pw), c), jnp.float32)
            for ph, pw in pad_sizes]
    g = g.astype(jnp.float32)

    # chunk the grid like the forward so the scalar-prefetch payload
    # (y0: ns i32/roi) stays inside SMEM; the accumulator buffers chain
    # through the calls via input_output_aliases
    chunk = _smem_chunk_rois(ns)
    for s0 in range(0, r, chunk):
        cr = min(chunk, r - s0)
        if nbuf > 1:
            kernel = functools.partial(_bwd_kernel_pipe, out_size=out_size,
                                       sample_num=sn, c=c, nbuf=nbuf, nr=cr)
        else:
            kernel = functools.partial(_bwd_kernel, out_size=out_size,
                                       sample_num=sn, c=c)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=6,
            grid=(cr,),
            in_specs=[
                pl.BlockSpec((1, 8, _vec_width(ns)),
                             lambda i, *refs: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, oh, ow, c), lambda i, *refs: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 4,
            scratch_shapes=scratch,
        )
        outs = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct(o.shape, jnp.float32)
                       for o in outs],
            input_output_aliases={8: 0, 9: 1, 10: 2, 11: 3},
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(lvl_arr[s0:s0 + cr], b_arr[s0:s0 + cr], yorg[s0:s0 + cr],
          xorg[s0:s0 + cr], sm_arr[s0:s0 + cr],
          y0_flat[s0 * ns:(s0 + cr) * ns], vec[s0:s0 + cr],
          g[s0:s0 + cr], *outs)
    if nbuf > 1:
        outs = [o.reshape(nbuf, b, *o.shape[1:]).sum(axis=0) for o in outs]
    # crop padding back to the real level extents
    return [o[:, :int(hs), :int(ws), :]
            for o, (hs, ws) in zip(outs, real_sizes)]
