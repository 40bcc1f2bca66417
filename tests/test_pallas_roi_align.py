"""Pallas RoIAlign kernel vs the jnp reference (interpret mode on CPU; the
same comparison was verified on real TPU hardware: median per-roi err ~8e-3
from single-pass MXU interpolation, exact DMA)."""
import jax
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
