"""On-hardware Pallas RoIAlign parity: fwd + serialized/pipelined bwd.

Interpret mode cannot catch DMA-branch bugs (round-4 lesson: a missing
bucket write-back passed every interpret test). This driver reruns the
interpret suite's scenarios on the REAL TPU and compares against the jnp
pyramid reference computed on the same device:

  python tools/hw_roi_parity.py            # fwd + bwd, nbuf 1 and 3

Covers every window bucket incl. the (32,56) wide bucket and the
edge-degenerate boxes behind the round-5 fit-check fix, plus the
overlapping-clones accumulation stress for the pipelined backward.
"""
import os
import sys

import numpy as np


def main():
    sys.path.insert(0, '.')
    import jax
    import jax.numpy as jnp
    from arfe_tpu.utils.compile_cache import enable
    enable()
    from arfe_tpu.ops.pallas_roi_align import (roi_align_pallas,
                                               roi_align_pallas_bwd)
    from arfe_tpu.ops.roi_align import roi_align_pyramid

    print(f'devices={jax.devices()}', flush=True)
    rng = np.random.RandomState(3)
    b, c = 2, 256
    feats = [jnp.asarray(rng.randn(b, 128 // (2 ** i), 192 // (2 ** i),
                                   c).astype(np.float32)) for i in range(4)]
    strides = [4, 8, 16, 32]
    rois = np.array([
        [0, 100, 100, 180, 180],
        [1, 60, 120, 260, 320],
        [0, 200, 100, 370, 150],
        [1, 80, 180, 130, 350],
        [0, 40, 40, 600, 580],
        [1, 300, 200, 420, 330],
        [0, 40, 100, 424, 196],       # wide bucket (32,56)
        [1, 60, 24, 156, 408],        # tall -> full bucket
        [0, 518.8, 512.0, 532.3, 512.0],   # bottom-edge degenerate
        [1, 768.0, 300.0, 768.0, 348.0],   # right-edge degenerate
    ], np.float32)
    rois_j = jnp.asarray(rois)

    ok = True

    def check(name, got, want, tol):
        nonlocal ok
        err = float(jnp.max(jnp.abs(got - want)))
        scale = float(jnp.max(jnp.abs(want))) + 1e-6
        rel = err / scale
        status = 'OK' if rel < tol else 'FAIL'
        ok &= rel < tol
        print(f'{status} {name}: max abs {err:.2e} rel {rel:.2e}',
              flush=True)

    want = roi_align_pyramid(feats, rois_j, (7, 7), strides, 56, 2, True)
    got = roi_align_pallas(feats, rois_j, (7, 7), strides, 56, 2, True)
    check('fwd 7x7', got, want, 2e-2)

    want14 = roi_align_pyramid(feats, rois_j, (14, 14), strides, 56, 2,
                               True)
    got14 = roi_align_pallas(feats, rois_j, (14, 14), strides, 56, 2, True)
    check('fwd 14x14', got14, want14, 2e-2)

    g = jnp.asarray(rng.randn(len(rois), 7, 7, c).astype(np.float32))
    _, vjp = jax.vjp(
        lambda f: roi_align_pyramid(list(f), rois_j, (7, 7), strides, 56,
                                    2, True), feats)
    (ref,) = vjp(g)
    for nbuf in ('1', '3'):
        os.environ['ARFE_TPU_ROI_BWD_NBUF'] = nbuf
        got_b = roi_align_pallas_bwd(g, rois_j, [f.shape for f in feats],
                                     strides, 56, 2, True)
        for lvl in range(4):
            check(f'bwd nbuf={nbuf} lvl{lvl}', got_b[lvl], ref[lvl], 2e-2)

    # overlapping-clones accumulation stress (the pipelined race case)
    feats2 = [jnp.asarray(rng.randn(b, 64 // (2 ** i) + 8, 96 // (2 ** i),
                                    c).astype(np.float32))
              for i in range(4)]
    for base in ([40.0, 50.0, 120.0, 140.0], [30.0, 60.0, 414.0, 156.0]):
        r = 7
        rois2 = np.concatenate([
            rng.randint(0, b, (r, 1)).astype(np.float32),
            np.asarray(base)[None]
            + rng.uniform(-6, 6, (r, 4)).astype(np.float32),
        ], axis=1).astype(np.float32)
        rois2_j = jnp.asarray(rois2)
        g2 = jnp.asarray(rng.randn(r, 7, 7, c).astype(np.float32))
        _, vjp2 = jax.vjp(
            lambda f: roi_align_pyramid(list(f), rois2_j, (7, 7), strides,
                                        56, 2, True), feats2)
        (ref2,) = vjp2(g2)
        for nbuf in ('1', '3'):
            os.environ['ARFE_TPU_ROI_BWD_NBUF'] = nbuf
            got2 = roi_align_pallas_bwd(
                g2, rois2_j, [f.shape for f in feats2], strides, 56, 2,
                True)
            for lvl in range(4):
                check(f'stress base={base[2]:.0f} nbuf={nbuf} lvl{lvl}',
                      got2[lvl], ref2[lvl], 2e-2)

    print('ALL OK' if ok else 'FAILURES PRESENT', flush=True)
    sys.exit(0 if ok else 1)


if __name__ == '__main__':
    main()
