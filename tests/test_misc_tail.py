"""Legacy coder, paramwise optimizer, async API, deform pool, visualize."""
import asyncio

import jax
import jax.numpy as jnp
import numpy as np


def test_legacy_delta2bbox_reference_values():
    """Golden values from the reference docstring
    (legacy_delta_xywh_bbox_coder.py)."""
    from arfe_tpu.core.bbox.coder import (LegacyDeltaXYWHBBoxCoder,
                                          legacy_delta2bbox)
    rois = jnp.asarray([[0., 0., 1., 1.], [0., 0., 1., 1.],
                        [0., 0., 1., 1.], [5., 5., 5., 5.]])
    deltas = jnp.asarray([[0., 0., 0., 0.], [1., 1., 1., 1.],
                          [0., 0., 2., -1.], [0.7, -1.9, -0.5, 0.3]])
    out = legacy_delta2bbox(rois, deltas, max_shape=(32, 32))
    ref = np.array([[0.0000, 0.0000, 1.5000, 1.5000],
                    [0.0000, 0.0000, 5.2183, 5.2183],
                    [0.0000, 0.1321, 7.8891, 0.8679],
                    [5.3967, 2.4251, 6.0033, 3.7749]])
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-3)
    coder = LegacyDeltaXYWHBBoxCoder()
    # encode/decode roundtrip is intentionally off by -/+0.5: the reference
    # decode drops the legacy +-0.5 (documented perf-motivated quirk in
    # legacy_delta2bbox)
    gt = jnp.asarray([[2., 3., 10., 12.]])
    anc = jnp.asarray([[1., 1., 8., 9.]])
    rt = coder.decode(anc, coder.encode(anc, gt))
    exp = np.asarray(gt) + np.array([-0.5, -0.5, 0.5, 0.5])
    np.testing.assert_allclose(np.asarray(rt), exp, atol=1e-4)


def test_paramwise_optimizer():
    from arfe_tpu.train.optimizer import (build_lr_schedule, build_optimizer,
                                          paramwise_multipliers)
    params = {
        'backbone': {'bn1': {'weight': jnp.ones(4), 'bias': jnp.zeros(4),
                             'running_mean': jnp.zeros(4),
                             'running_var': jnp.ones(4)}},
        'head': {'conv': {'weight': jnp.ones((3, 3, 4, 4)),
                          'bias': jnp.zeros(4)},
                 'conv_offset': {'weight': jnp.ones((1, 1, 4, 18))}},
    }
    lr_t, wd_t = paramwise_multipliers(params, dict(
        bias_lr_mult=2.0, norm_decay_mult=0.0, dcn_offset_lr_mult=0.1))
    assert wd_t['backbone']['bn1']['weight'] == 0.0
    assert lr_t['head']['conv']['bias'] == 2.0
    assert lr_t['head']['conv_offset']['weight'] == 0.1
    sched = build_lr_schedule(dict(policy='step', step=[8]), 0.02, 10)
    opt = build_optimizer(dict(type='SGD', lr=0.02, momentum=0.9,
                               weight_decay=1e-4,
                               paramwise_cfg=dict(bias_lr_mult=2.0)),
                          sched, params)
    state = opt.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    upd, _ = opt.update(grads, state, params)
    ratio = float(upd['head']['conv']['bias'][0]) / \
        float(upd['head']['conv']['weight'][0, 0, 0, 0])
    assert abs(ratio - 2.0) < 0.01
    # rmsprop from the registry
    opt2 = build_optimizer(dict(type='RMSprop', lr=0.01), sched, params)
    u2, _ = opt2.update(grads, opt2.init(params), params)
    assert float(jnp.abs(u2['head']['conv']['weight']).sum()) > 0


def test_deform_roi_pooling_zero_offset_matches_no_trans():
    from arfe_tpu.ops import deform_roi_pooling
    rng = np.random.RandomState(0)
    data = jnp.asarray(rng.randn(2, 16, 16, 8).astype(np.float32))
    rois = jnp.asarray([[0, 2, 2, 10, 10], [1, 4, 4, 14, 12]], jnp.float32)
    a = deform_roi_pooling(data, rois, None, 1.0, 7, 8, True)
    off = jnp.zeros((2, 2, 7, 7))
    b = deform_roi_pooling(data, rois, off, 1.0, 7, 8, False, trans_std=0.1)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    # an x-offset shifts the sampling window
    off2 = off.at[:, 0].set(0.5)
    c = deform_roi_pooling(data, rois, off2, 1.0, 7, 8, False,
                           trans_std=1.0)
    assert not np.allclose(np.asarray(a), np.asarray(c))


def test_modulated_deform_pool_pack_init_halves():
    from arfe_tpu.ops import (DeformRoIPoolingPack,
                              ModulatedDeformRoIPoolingPack)
    rng = np.random.RandomState(0)
    data = jnp.asarray(rng.randn(1, 16, 16, 4).astype(np.float32))
    rois = jnp.asarray([[0, 2, 2, 12, 12]], jnp.float32)
    m = DeformRoIPoolingPack(1.0, 7, 4, no_trans=False)
    p = m.init(jax.random.PRNGKey(0))
    out = m(p, data, rois)
    mm = ModulatedDeformRoIPoolingPack(1.0, 7, 4, no_trans=False)
    pm = mm.init(jax.random.PRNGKey(0))
    outm = mm(pm, data, rois)
    np.testing.assert_allclose(np.asarray(outm), np.asarray(out) * 0.5,
                               atol=1e-6)


def test_async_inference_importable_and_runs():
    from arfe_tpu.apis import async_inference_detector

    class FakeDetector:
        pass

    # monkeypatch inference_detector to avoid building a model
    import arfe_tpu.apis.inference as inf
    orig = inf.inference_detector
    inf.inference_detector = lambda det, img: {'ok': img}
    try:
        out = asyncio.get_event_loop().run_until_complete(
            async_inference_detector(FakeDetector(), 42))
        assert out == {'ok': 42}
    finally:
        inf.inference_detector = orig


def test_visualize_attention(tmp_path):
    import cv2
    from arfe_tpu.utils import visualize_attention
    img_path = str(tmp_path / 'img.jpg')
    cv2.imwrite(img_path, (np.random.rand(24, 32, 3) * 255).astype('uint8'))
    outs = visualize_attention(img_path, [np.random.rand(6, 8)], 'att',
                               out_dir=str(tmp_path))
    assert len(outs) == 1
    import os
    assert os.path.exists(outs[0])


def test_train_json_log_roundtrip(tmp_path):
    """_append_json_log writes json-lines that tools/analyze_logs parses."""
    from arfe_tpu.apis.train import _append_json_log
    import json as _json
    d = str(tmp_path)
    _append_json_log(d, dict(epoch=1, iter=10, mode='train', loss=1.5,
                             lr=0.02, time=0.3))
    _append_json_log(d, dict(epoch=1, mode='val', bbox_mAP=0.31))
    lines = open(tmp_path / 'train.log.json').read().strip().split('\n')
    assert len(lines) == 2
    assert _json.loads(lines[0])['loss'] == 1.5
    # analyze_logs' loader accepts the file
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        'analyze_logs', 'tools/analyze_logs.py')
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    entries = mod.load_log(str(tmp_path / 'train.log.json'))
    assert entries[0]['epoch'] == 1 and entries[1]['mode'] == 'val'


def test_orbax_checkpoint_backend(tmp_path):
    """Orbax directory checkpoints (sync + async) round-trip params,
    optimizer state, and meta through the standard load_checkpoint."""
    import jax.numpy as jnp
    from arfe_tpu.utils.checkpoint import (load_checkpoint, save_checkpoint,
                                           wait_for_checkpoints)
    params = {'m': {'w': jnp.arange(6.0).reshape(2, 3)}}
    p = save_checkpoint(str(tmp_path / 'ck'), params, {'mu': params},
                        {'epoch': 2}, backend='orbax')
    pr, meta, opt = load_checkpoint(p)
    assert meta['epoch'] == 2
    assert float(pr['m']['w'][1, 2]) == 5.0 and opt is not None
    p2 = save_checkpoint(str(tmp_path / 'ck2'), params, None,
                         {'epoch': 3}, backend='orbax', async_save=True)
    wait_for_checkpoints()
    _, meta2, opt2 = load_checkpoint(p2)
    assert meta2['epoch'] == 3 and opt2 is None
