import numpy as np

from arfe_tpu.core.anchor import AnchorGenerator


def test_grid_anchors_golden():
    # Golden from the reference docstring
    # (ref: mmdet/core/anchor/anchor_generator.py:41-56).
    gen = AnchorGenerator(strides=[16], ratios=[1.], scales=[1.],
                          base_sizes=[9])
    anchors = gen.grid_anchors([(2, 2)])[0]
    expected = np.array([[-4.5, -4.5, 4.5, 4.5],
                         [11.5, -4.5, 20.5, 4.5],
                         [-4.5, 11.5, 4.5, 20.5],
                         [11.5, 11.5, 20.5, 20.5]])
    np.testing.assert_allclose(anchors, expected)


def test_retina_octave_scales():
    gen = AnchorGenerator(strides=[8, 16, 32, 64, 128], ratios=[0.5, 1.0, 2.0],
                          octave_base_scale=4, scales_per_octave=3)
    assert gen.num_levels == 5
    assert gen.num_base_anchors == [9] * 5
    np.testing.assert_allclose(gen.scales, 4 * 2 ** (np.arange(3) / 3),
                               rtol=1e-6)
    # ratio 1.0 scale 4 at stride 8: square anchor of side 32
    ba = gen.base_anchors[0]
    sq = ba[3]  # ratios are [0.5, 1, 2], scale-major: idx 3 = ratio1/scale0
    np.testing.assert_allclose(sq, [-16, -16, 16, 16], atol=1e-4)


def test_rpn_anchor_shapes():
    gen = AnchorGenerator(strides=[4, 8, 16, 32, 64], ratios=[0.5, 1.0, 2.0],
                          scales=[8])
    sizes = [(200, 336), (100, 168), (50, 84), (25, 42), (13, 21)]
    anchors = gen.grid_anchors(sizes)
    for (h, w), a in zip(sizes, anchors):
        assert a.shape == (h * w * 3, 4)


def test_valid_flags():
    gen = AnchorGenerator(strides=[16], ratios=[1.], scales=[8.])
    flags = gen.valid_flags([(4, 4)], (33, 33))
    # ceil(33/16)=3 valid rows/cols of 4
    f = flags[0].reshape(4, 4)
    assert f[:3, :3].all()
    assert not f[3, :].any() and not f[:, 3].any()


def test_ssd_base_anchors_match_reference():
    """Golden values computed with the reference SSDAnchorGenerator
    (mmdet/core/anchor/anchor_generator.py:285-400) for SSD300-COCO."""
    from arfe_tpu.core.anchor import SSDAnchorGenerator
    gen = SSDAnchorGenerator(
        strides=[8, 16, 32, 64, 100, 300],
        ratios=[[2], [2, 3], [2, 3], [2, 3], [2], [2]],
        basesize_ratio_range=(0.15, 0.9), input_size=300, scale_major=False)
    assert gen.num_base_anchors == [4, 6, 6, 6, 4, 4]
    # level 0: min=21, max=45, center=(4,4); rows: [1:1@21,
    # 1:1@21*sqrt(45/21), 1:2@21, 2:1@21]
    s = np.sqrt(45. / 21.)
    w1 = 21. * s
    r2w, r2h = 21. * np.sqrt(2.), 21. / np.sqrt(2.)
    expected0 = np.array([
        [4 - 10.5, 4 - 10.5, 4 + 10.5, 4 + 10.5],
        [4 - w1 / 2, 4 - w1 / 2, 4 + w1 / 2, 4 + w1 / 2],
        [4 - r2w / 2, 4 - r2h / 2, 4 + r2w / 2, 4 + r2h / 2],
        [4 - r2h / 2, 4 - r2w / 2, 4 + r2h / 2, 4 + r2w / 2],
    ], np.float32)
    np.testing.assert_allclose(gen.base_anchors[0], expected0, rtol=1e-6)
    # level 1 center is stride/2 = 8 and has 6 anchors (ratios 2 and 3)
    np.testing.assert_allclose(gen.base_anchors[1][0],
                               [8 - 22.5, 8 - 22.5, 8 + 22.5, 8 + 22.5],
                               rtol=1e-6)


def test_take_rows_matches_gather():
    """take_rows (masked select-sum for small gt tables; see layers.py)
    must equal the native gather in all its modes."""
    import numpy as np
    import jax.numpy as jnp
    from arfe_tpu.layers import take_rows

    r = np.random.RandomState(3)
    idx = jnp.asarray(r.randint(0, 16, (777,)))
    box_t = jnp.asarray(r.randn(16, 4).astype(np.float32))
    np.testing.assert_allclose(take_rows(box_t, idx), box_t[idx])
    lab_t = jnp.asarray(r.randint(0, 80, (16,)).astype(np.int32))
    np.testing.assert_array_equal(take_rows(lab_t, idx), lab_t[idx])
    per_t = jnp.asarray(r.randn(16, 777, 4).astype(np.float32))
    np.testing.assert_allclose(take_rows(per_t, idx, per_row=True),
                               per_t[idx, jnp.arange(777)])
    big_t = jnp.asarray(r.randn(100, 4).astype(np.float32))
    big_i = jnp.asarray(r.randint(0, 100, (33,)))
    np.testing.assert_allclose(take_rows(big_t, big_i), big_t[big_i])
    big_p = jnp.asarray(r.randn(100, 33, 2).astype(np.float32))
    np.testing.assert_allclose(take_rows(big_p, big_i, per_row=True),
                               big_p[big_i, jnp.arange(33)])
