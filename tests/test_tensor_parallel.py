"""Tensor-parallel RCNN-head sharding over the 'model' mesh axis
(Megatron-style column/row-parallel shared FCs, collectives inserted by
GSPMD). Verifies a 4x2 dp x tp train step runs AND matches the pure-DP
step numerically."""
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from arfe_tpu.parallel import (make_dp_train_step, make_mesh, replicate,
                               shard_batch, shard_params, tp_param_specs)
from arfe_tpu.train import (build_lr_schedule, build_optimizer,
                            frozen_prefixes_from_cfg)

TP_RULES = [
    ('bbox_head.shared_fcs.0.weight', P('model', None)),
    ('bbox_head.shared_fcs.0.bias', P('model')),
    ('bbox_head.shared_fcs.1.weight', P(None, 'model')),
]


def _setup():
    from __graft_entry__ import _build_flagship
    model = _build_flagship(tiny=True)
    params = jax.jit(model.init)(jax.random.PRNGKey(0))
    sched = build_lr_schedule(
        dict(policy='step', warmup='linear', warmup_iters=500,
             warmup_ratio=0.001, step=[8, 11]), 0.02, 1000)
    opt = build_optimizer(
        dict(type='SGD', momentum=0.9, weight_decay=0.0001), sched, params,
        frozen_prefixes_from_cfg(dict(backbone=dict(frozen_stages=1))))
    b, g, h, w = 8, 8, 128, 160
    r = np.random.RandomState(0)
    gt = np.zeros((b, g, 4), np.float32)
    gv = np.zeros((b, g), bool)
    gl = np.zeros((b, g), np.int32)
    for i in range(b):
        gt[i, :2] = [[10, 10, 60, 60], [40, 30, 100, 90]]
        gv[i, :2] = True
        gl[i, :2] = [1, 3]
    batch = dict(img=jnp.asarray(r.randn(b, h, w, 3), jnp.float32) * 0.2,
                 img_shape=jnp.asarray([[float(h), float(w)]] * b),
                 gt_bboxes=jnp.asarray(gt), gt_valid=jnp.asarray(gv),
                 gt_labels=jnp.asarray(gl))
    return model, params, opt, batch


def test_tp_step_matches_dp():
    assert len(jax.devices()) >= 8, 'conftest provides 8 virtual devices'
    model, params, opt, batch = _setup()
    key = jax.random.PRNGKey(1)

    # device_put may alias buffers, and the train step donates its
    # inputs — give each parallel setup its own copy of the params
    params_dp = jax.tree_util.tree_map(jnp.array, params)
    params_tp = jax.tree_util.tree_map(jnp.array, params)

    # pure DP over 8 devices
    mesh_dp = make_mesh(n_data=8, n_model=1)
    with mesh_dp:
        p0 = replicate(mesh_dp, params_dp)
        o0 = replicate(mesh_dp, opt.init(p0))
        step = make_dp_train_step(model, opt, mesh_dp)
        p1, _, log_dp = step(p0, o0, shard_batch(mesh_dp, batch), key)
        loss_dp = float(log_dp['loss'])

    # 4x2 dp x tp: shared FCs sharded over 'model'
    mesh_tp = make_mesh(n_data=4, n_model=2)
    with mesh_tp:
        specs = tp_param_specs(params_tp, TP_RULES, mesh_tp)
        pt = shard_params(mesh_tp, params_tp, specs)
        # verify the intended leaves actually shard
        fc0 = pt['roi_head']['bbox_head']['shared_fcs']['0']['weight']
        assert not fc0.sharding.is_fully_replicated
        ot = jax.tree_util.tree_map(
            lambda leaf: jax.device_put(leaf), opt.init(pt))
        step_tp = make_dp_train_step(model, opt, mesh_tp, param_specs=specs)
        pt1, _, log_tp = step_tp(pt, ot, shard_batch(mesh_tp, batch), key)
        loss_tp = float(log_tp['loss'])

    assert np.isfinite(loss_dp) and np.isfinite(loss_tp)
    assert abs(loss_dp - loss_tp) < 1e-3, (loss_dp, loss_tp)
    # updated fc0 weights agree between DP and TP
    w_dp = np.asarray(p1['roi_head']['bbox_head']['shared_fcs']['0']['weight'])
    w_tp = np.asarray(pt1['roi_head']['bbox_head']['shared_fcs']['0']['weight'])
    np.testing.assert_allclose(w_dp, w_tp, atol=2e-5)
