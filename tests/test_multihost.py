"""Multi-host (multi-process) distribution: 2 CPU processes with
jax.distributed over localhost train the tiny flagship with losses
identical to a single-process run (VERDICT round-3 item #4; ref stack
being replaced: tools/dist_train.sh + tools/train.py:95-99 init_dist)."""
import json
import os
import socket
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r'''
import json, os, sys
import jax
jax.config.update('jax_platforms', 'cpu')
from arfe_tpu.parallel import maybe_init_distributed
maybe_init_distributed()
import numpy as np
import jax.numpy as jnp
from arfe_tpu.models import build_detector
from arfe_tpu.parallel import make_mesh, replicate, shard_batch

C = 32
cfg = dict(
    type='FasterRCNN',
    backbone=dict(type='ResNet', depth=18, out_indices=(0, 1, 2, 3)),
    neck=[dict(type='FPN', in_channels=[64, 128, 256, 512],
               out_channels=C, num_outs=5),
          dict(type='WFPNDualSpatial', in_channels=C, num_levels=5)],
    rpn_head=dict(
        type='RPNHead', in_channels=C, feat_channels=C,
        anchor_generator=dict(type='AnchorGenerator', scales=[8],
                              ratios=[0.5, 1.0, 2.0],
                              strides=[4, 8, 16, 32, 64]),
        bbox_coder=dict(type='DeltaXYWHBBoxCoder'),
        loss_cls=dict(type='CrossEntropyLoss', use_sigmoid=True)),
    roi_head=dict(
        type='StandardRoIHead',
        bbox_roi_extractor=dict(
            type='SingleRoIExtractor',
            roi_layer=dict(type='RoIAlign', out_size=7, sample_num=2),
            out_channels=C, featmap_strides=[4, 8, 16, 32]),
        bbox_head=dict(
            type='Shared2FCBBoxHead', in_channels=C, fc_out_channels=64,
            roi_feat_size=7, num_classes=4,
            bbox_coder=dict(type='DeltaXYWHBBoxCoder',
                            target_stds=[0.1, 0.1, 0.2, 0.2]))))
train_cfg = dict(
    rpn=dict(assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.7,
                           neg_iou_thr=0.3, min_pos_iou=0.3,
                           match_low_quality=True),
             sampler=dict(type='RandomSampler', num=32, pos_fraction=0.5,
                          add_gt_as_proposals=False),
             allowed_border=-1, pos_weight=-1),
    rpn_proposal=dict(nms_pre=100, nms_post=32, max_num=32, nms_thr=0.7,
                      min_bbox_size=0),
    rcnn=dict(assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.5,
                            neg_iou_thr=0.5, min_pos_iou=0.5,
                            match_low_quality=False),
              sampler=dict(type='RandomSampler', num=16, pos_fraction=0.25,
                           add_gt_as_proposals=True),
              pos_weight=-1))
model = build_detector(cfg, train_cfg=train_cfg)
params = jax.jit(model.init)(jax.random.PRNGKey(0))
mesh = make_mesh()
params = replicate(mesh, params)

rank, world = jax.process_index(), jax.process_count()
B = 4
rng = np.random.RandomState(0)
full = {
    'img': rng.randn(B, 64, 96, 3).astype(np.float32),
    'img_shape': np.tile([[64., 96.]], (B, 1)).astype(np.float32),
    'gt_bboxes': np.tile(np.array(
        [[[10., 10., 40., 50.], [20., 5., 60., 40.]]], np.float32),
        (B, 1, 1)),
    'gt_valid': np.ones((B, 2), bool),
    'gt_labels': np.tile(np.array([[1, 2]], np.int32), (B, 1)),
}
local = {k: v[rank * B // world:(rank + 1) * B // world]
         for k, v in full.items()} if world > 1 else full
with mesh:
    arrays = shard_batch(mesh, local)


def loss_fn(p, batch):
    losses = model.forward_train(
        p, batch['img'], batch['img_shape'], batch['gt_bboxes'],
        batch['gt_valid'], batch['gt_labels'], key=jax.random.PRNGKey(42))
    return sum(v for k, v in losses.items() if k.startswith('loss'))


@jax.jit
def step(p, batch):
    l, g = jax.value_and_grad(loss_fn)(p, batch)
    return l, jax.tree_util.tree_map(lambda a, b: a - 1e-3 * b, p, g)


with mesh:
    l1, params = step(params, arrays)
    l2, params = step(params, arrays)
print(json.dumps({'rank': rank, 'world': world,
                  'losses': [float(l1), float(l2)]}), flush=True)
'''


EVAL_WORKER = r'''
import json, os, sys
import jax
jax.config.update('jax_platforms', 'cpu')
from arfe_tpu.parallel import maybe_init_distributed
maybe_init_distributed()
import numpy as np
import jax.numpy as jnp
from arfe_tpu.models import build_detector
from arfe_tpu.parallel import make_mesh
from arfe_tpu.apis.test import multi_device_test, single_device_test

C = 32
cfg = dict(
    type='FasterRCNN',
    backbone=dict(type='ResNet', depth=18, out_indices=(0, 1, 2, 3)),
    neck=dict(type='FPN', in_channels=[64, 128, 256, 512],
              out_channels=C, num_outs=5),
    rpn_head=dict(
        type='RPNHead', in_channels=C, feat_channels=C,
        anchor_generator=dict(type='AnchorGenerator', scales=[8],
                              ratios=[0.5, 1.0, 2.0],
                              strides=[4, 8, 16, 32, 64]),
        bbox_coder=dict(type='DeltaXYWHBBoxCoder'),
        loss_cls=dict(type='CrossEntropyLoss', use_sigmoid=True)),
    roi_head=dict(
        type='StandardRoIHead',
        bbox_roi_extractor=dict(
            type='SingleRoIExtractor',
            roi_layer=dict(type='RoIAlign', out_size=7, sample_num=2),
            out_channels=C, featmap_strides=[4, 8, 16, 32]),
        bbox_head=dict(
            type='Shared2FCBBoxHead', in_channels=C, fc_out_channels=64,
            roi_feat_size=7, num_classes=4,
            bbox_coder=dict(type='DeltaXYWHBBoxCoder',
                            target_stds=[0.1, 0.1, 0.2, 0.2]))))
test_cfg = dict(
    rpn=dict(nms_pre=64, nms_post=16, max_num=16, nms_thr=0.7,
             min_bbox_size=0),
    rcnn=dict(score_thr=0.0, nms=dict(type='nms', iou_thr=0.5),
              max_per_img=8))
model = build_detector(cfg, test_cfg=test_cfg)
params = jax.jit(model.init)(jax.random.PRNGKey(0))

rank, world = jax.process_index(), jax.process_count()
H, W = 64, 96
B = 4


def full_batch(seed, b):
    rng = np.random.RandomState(100 + seed)
    return {
        'img': rng.randn(b, H, W, 3).astype(np.float32),
        'img_shape': np.tile([[float(H), float(W)]], (b, 1)).astype(
            np.float32),
        'scale_factor': np.ones((b, 4), np.float32),
        'img_metas': [dict(ori_shape=(H, W, 3)) for _ in range(b)],
    }


# 2 full batches + a remainder batch of 3 (11 real images)
full_batches = [full_batch(0, B), full_batch(1, B), full_batch(2, 3)]

if world == 1:
    results = single_device_test(model, params, full_batches,
                                 show_progress=False)
else:
    # emulate DetDataLoader multi-host slicing: global batches padded to
    # B by repeating the last image, each rank feeds its local slice,
    # padded entries marked via meta['pad']
    local_batches = []
    for fb in full_batches:
        b = fb['img'].shape[0]
        idx = list(range(b)) + [b - 1] * (B - b)
        lo = rank * (B // world)
        sel = idx[lo:lo + B // world]
        lb = {k: fb[k][sel] for k in
              ('img', 'img_shape', 'scale_factor')}
        lb['img_metas'] = [
            dict(ori_shape=(H, W, 3),
                 **({'pad': True} if lo + j >= b else {}))
            for j, _ in enumerate(sel)]
        local_batches.append(lb)
    mesh = make_mesh()
    results = multi_device_test(model, params, local_batches, mesh,
                                show_progress=False)

out = [[np.asarray(cls).round(4).tolist() for cls in img]
       for img in results]
print(json.dumps({'rank': rank, 'world': world, 'n': len(results),
                  'results': out}), flush=True)
'''


def _free_port():
    s = socket.socket()
    s.bind(('127.0.0.1', 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run(env, timeout=420, worker=None):
    e = dict(os.environ, **env)
    e.pop('PYTEST_CURRENT_TEST', None)
    return subprocess.run([sys.executable, '-c', worker or WORKER],
                          cwd=REPO, capture_output=True, text=True, env=e,
                          timeout=timeout)


def test_two_process_training_matches_single_process(tmp_path):
    # single-process reference: 4 local CPU devices
    ref = _run({'XLA_FLAGS': '--xla_force_host_platform_device_count=4',
                'ARFE_DIST_INIT': '0'})
    assert ref.returncode == 0, ref.stderr[-3000:]
    ref_out = json.loads(ref.stdout.strip().splitlines()[-1])
    assert ref_out['world'] == 1

    port = _free_port()
    base = {
        'XLA_FLAGS': '--xla_force_host_platform_device_count=2',
        'ARFE_DIST_INIT': '1',
        'ARFE_COORD_ADDR': f'127.0.0.1:{port}',
        'ARFE_NUM_PROCS': '2',
    }
    procs = []
    e0 = dict(os.environ, **base, ARFE_PROC_ID='0')
    e1 = dict(os.environ, **base, ARFE_PROC_ID='1')
    for e in (e0, e1):
        e.pop('PYTEST_CURRENT_TEST', None)
        procs.append(subprocess.Popen(
            [sys.executable, '-c', WORKER], cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=e))
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=420)
        assert p.returncode == 0, err[-3000:]
        outs.append(json.loads(out.strip().splitlines()[-1]))
    assert all(o['world'] == 2 for o in outs)
    # both ranks see the same global losses, equal to the single-run ones
    np.testing.assert_allclose(outs[0]['losses'], outs[1]['losses'],
                               rtol=1e-6)
    np.testing.assert_allclose(outs[0]['losses'], ref_out['losses'],
                               rtol=1e-4)


def test_two_process_eval_matches_single_process(tmp_path):
    """Multi-host in-train validation path: multi_device_test on a
    2-process mesh (each host feeding its local slice, fixed-size outputs
    replicated on device) returns the same per-image results as a
    single-process run, remainder-batch padding dropped (replaces ref
    multi_gpu_test + collect_results, mmdet/apis/test.py:87-209)."""
    ref = _run({'XLA_FLAGS': '--xla_force_host_platform_device_count=4',
                'ARFE_DIST_INIT': '0'}, worker=EVAL_WORKER)
    assert ref.returncode == 0, ref.stderr[-3000:]
    ref_out = json.loads(ref.stdout.strip().splitlines()[-1])
    assert ref_out['world'] == 1 and ref_out['n'] == 11

    port = _free_port()
    base = {
        'XLA_FLAGS': '--xla_force_host_platform_device_count=2',
        'ARFE_DIST_INIT': '1',
        'ARFE_COORD_ADDR': f'127.0.0.1:{port}',
        'ARFE_NUM_PROCS': '2',
    }
    procs = []
    for pid in ('0', '1'):
        e = dict(os.environ, **base, ARFE_PROC_ID=pid)
        e.pop('PYTEST_CURRENT_TEST', None)
        procs.append(subprocess.Popen(
            [sys.executable, '-c', EVAL_WORKER], cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=e))
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=420)
        assert p.returncode == 0, err[-3000:]
        outs.append(json.loads(out.strip().splitlines()[-1]))
    assert all(o['world'] == 2 for o in outs)
    # every process holds the full, identical result set
    for o in outs:
        assert o['n'] == 11
        for img_ref, img_got in zip(ref_out['results'], o['results']):
            assert len(img_ref) == len(img_got)
            for cls_ref, cls_got in zip(img_ref, img_got):
                np.testing.assert_allclose(cls_ref, cls_got, atol=2e-3)
