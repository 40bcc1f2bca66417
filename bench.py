"""Round benchmark: flagship Faster R-CNN R50 + AR-FPN inference throughput
(+ bs1 p50 latency and a RetinaNet+AR-FPN secondary row).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.

Methodology (this machine's axon tunnel makes host-side timing async and
meaningless — see .claude/skills/verify/SKILL.md): N model iterations run
inside one jitted lax.fori_loop with a data-dependent carry; two loop
lengths subtract the fixed per-dispatch tunnel cost; sync is a scalar
materialization. The p50 latency is the median of repeated short-loop
per-iter estimates at bs1.

Baseline: the reference publishes no throughput numbers (BASELINE.md).
BASELINE.json's target is ">= 2x A100 images/sec"; mmdetection-2.0 Faster
R-CNN R50-FPN inference on A100 is ~35 img/s (fp32, bs1), so vs_baseline is
measured img/s divided by 70 (2x A100) — vs_baseline >= 1.0 meets the
target.
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_IMG_PER_SEC = 70.0  # 2x assumed A100 mmdet fp32 throughput
BATCH = 8
H, W = 800, 1344


def probe_backend(timeout_s=None, retries=2, sleep_s=30):
    """Fail fast when the TPU tunnel is down instead of hanging into the
    driver's timeout (the round-3 failure mode). Each attempt is a short
    subprocess that initializes the backend and runs one tiny matmul; on a
    healthy tunnel this takes ~15-40 s (cold compile), so 150 s is generous.
    Exits non-zero quickly if every attempt fails, so the driver can retry
    the whole bench instead of burning its budget on a hang."""
    import os
    import subprocess
    import sys
    if timeout_s is None:
        # a loaded host (e.g. the CPU test suite running concurrently)
        # stretches probe latency well past the idle-host 15-40 s
        timeout_s = float(os.environ.get('ARFE_BENCH_PROBE_TIMEOUT', 150))
    code = ('import jax, jax.numpy as jnp;'
            'x = jnp.ones((128, 128));'
            'print(float((x @ x).sum()))')
    last = None
    for i in range(retries + 1):
        try:
            subprocess.run([sys.executable, '-c', code], timeout=timeout_s,
                           check=True, capture_output=True)
            return
        except Exception as e:
            last = e
            if i < retries:
                time.sleep(sleep_s)
    raise SystemExit(f'bench: TPU backend unavailable after '
                     f'{retries + 1} probes: {last!r}')


def build_flagship():
    from __graft_entry__ import _build_flagship
    model = _build_flagship()
    params = jax.jit(model.init)(jax.random.PRNGKey(0))
    return model, params


def build_from_config(path, space_to_depth=True, with_train_cfg=False):
    from arfe_tpu import Config
    from arfe_tpu.models import build_detector
    cfg = Config.fromfile(path)
    model_cfg = dict(cfg.todict()['model'])
    model_cfg.pop('pretrained', None)
    if space_to_depth:
        model_cfg['backbone']['stem_space_to_depth'] = True
    kw = dict(test_cfg=cfg.todict()['test_cfg'])
    if with_train_cfg:
        kw['train_cfg'] = cfg.todict()['train_cfg']
    model = build_detector(model_cfg, **kw)
    params = jax.jit(model.init)(jax.random.PRNGKey(0))
    return model, params


def build_retinanet():
    return build_from_config('configs/arfe/retinanet_r50_arfpn_1x_coco.py')


def make_loop(model, batch):
    img_shapes = jnp.asarray([[float(H), 1333.0]] * batch)
    scale_factors = jnp.ones((batch, 4), jnp.float32)

    @jax.jit
    def loop(params, img, n_iters):
        def body(i, carry):
            dets, labels, valid = model.simple_test(
                params, carry, img_shapes, scale_factors, rescale=True)
            # data-dependent carry defeats loop folding; numerically ~0
            return carry + (dets.mean() * 1e-20).astype(carry.dtype)
        out = jax.lax.fori_loop(0, n_iters, body, img)
        return out[0, 0, 0, 0]

    return loop


def measure_chained(model, params, img, batch, n_small=3, n_big=23):
    """Chained-async-dispatch timing: n jitted simple_test steps linked by
    a data dependency, one final sync; validated against the fori_loop
    method on the flagship (94.85 vs 94.63 img/s). Used where wrapping
    simple_test in lax.fori_loop trips an XLA TPU codegen fault (the
    RetinaNet bs8 graph crashes the worker even at 1 loop iteration)."""
    img_shapes = jnp.asarray([[float(H), 1333.0]] * batch)
    scale_factors = jnp.ones((batch, 4), jnp.float32)

    @jax.jit
    def step(params, x):
        out = model.simple_test(params, x, img_shapes,
                                scale_factors, rescale=True)
        dets = out[0]
        carry = (dets.mean() * 1e-20).astype(x.dtype)
        if len(out) > 3:      # mask logits ride the carry too
            carry = carry + (out[3].mean() * 1e-20).astype(x.dtype)
        return x + carry

    r = step(params, img)
    float(jnp.sum(r[0, 0, 0]))

    def run(n):
        r = img
        t0 = time.time()
        for _ in range(n):
            r = step(params, r)
        float(jnp.sum(r[0, 0, 0]))
        return time.time() - t0

    ts = {n: min(run(n) for _ in range(3)) for n in (n_small, n_big)}
    return (ts[n_big] - ts[n_small]) / (n_big - n_small)


def measure(loop, params, img, n_small=2, n_big=12):
    float(loop(params, img, n_small))  # compile + warm
    times = {}
    for n in (n_small, n_big):
        t0 = time.time()
        float(loop(params, img, n))
        times[n] = time.time() - t0
    return (times[n_big] - times[n_small]) / (n_big - n_small)


def measure_train_step(model, params, batch_size=4, n_small=3, n_big=13,
                       with_masks=False):
    """DP train-step throughput on the attached chip(s): fwd + bwd + SGD
    update at the bench resolution, chained-dispatch timing (the train
    graph inside lax.fori_loop would need non-donated buffers anyway).
    Uses bs4: the train step roughly triples activation memory vs
    inference."""
    from arfe_tpu.parallel import make_dp_train_step, make_mesh, replicate
    from arfe_tpu.train import build_lr_schedule, build_optimizer, \
        frozen_prefixes_from_cfg

    b, g = batch_size, 16
    mesh = make_mesh(n_data=len(jax.devices()), n_model=1)
    sched = build_lr_schedule(
        dict(policy='step', warmup='linear', warmup_iters=500,
             warmup_ratio=0.001, step=[8, 11]), 0.02, 1000)
    opt = build_optimizer(
        dict(type='SGD', momentum=0.9, weight_decay=0.0001), sched, params,
        frozen_prefixes_from_cfg(dict(backbone=dict(frozen_stages=1))))
    r = np.random.RandomState(0)
    gt_bboxes = np.zeros((b, g, 4), np.float32)
    gt_valid = np.zeros((b, g), bool)
    gt_labels = np.zeros((b, g), np.int32)
    for i in range(b):
        n = 8
        xy = r.uniform(0, [W - 80, H - 80], (n, 2))
        wh = r.uniform(30, 80, (n, 2))
        gt_bboxes[i, :n] = np.concatenate([xy, xy + wh], -1)
        gt_valid[i, :n] = True
        gt_labels[i, :n] = r.randint(0, 80, n)
    batch = dict(
        img=jnp.asarray(r.randn(b, H, W, 3) * 0.2, jnp.bfloat16),
        img_shape=jnp.asarray([[float(H), 1333.0]] * b),
        gt_bboxes=jnp.asarray(gt_bboxes),
        gt_valid=jnp.asarray(gt_valid),
        gt_labels=jnp.asarray(gt_labels))
    if with_masks:
        batch['gt_mask_crops'] = jnp.asarray(
            (r.rand(b, g, 28, 28) > 0.5).astype(np.float32))
    key = jax.random.PRNGKey(0)
    with mesh:
        p = replicate(mesh, params)
        opt_state = replicate(mesh, opt.init(p))
        step = make_dp_train_step(model, opt, mesh)
        # the step donates params/opt_state, so carry the latest state
        # across timing runs instead of reusing donated buffers
        state = [p, opt_state]

        def run(n):
            pp, oo = state
            t0 = time.time()
            for _ in range(n):
                pp, oo, log = step(pp, oo, batch, key)
            float(log['loss'])
            state[0], state[1] = pp, oo
            return time.time() - t0

        run(1)  # compile
        ts = {}
        for n in (n_small, n_big):
            ts[n] = min(run(n) for _ in range(2))
    per = (ts[n_big] - ts[n_small]) / (n_big - n_small)
    return b / per


def main():
    probe_backend()
    from arfe_tpu.utils.compile_cache import enable as _enable_cache
    _enable_cache()  # persist executables across worker restarts
    model, params = build_flagship()
    img = jnp.asarray(
        np.random.RandomState(0).randn(BATCH, H, W, 3) * 0.2, jnp.bfloat16)
    per_iter = measure(make_loop(model, BATCH), params, img)
    img_per_sec = BATCH / per_iter

    # bs1 latency: median of repeated short-loop estimates (p50)
    img1 = img[:1]
    loop1 = make_loop(model, 1)
    float(loop1(params, img1, 2))
    lats = []
    for _ in range(3):  # 3 estimates keep the whole bench inside the
        # driver's per-attempt timeout now that the train row exists
        t0 = time.time()
        float(loop1(params, img1, 2))
        t1 = time.time()
        t2 = time.time()
        float(loop1(params, img1, 7))
        t3 = time.time()
        lats.append(((t3 - t2) - (t1 - t0)) / 5)
    p50_ms = float(np.median(lats) * 1000)

    # training-step throughput (fwd+bwd+SGD update), same resolution
    train_ips = None
    try:
        train_ips = round(measure_train_step(model, params), 2)
    except Exception as e:
        train_ips = f'failed: {e!r:.80}'

    # secondary row: RetinaNet + AR-FPN throughput at the same batch
    retina_ips = None
    try:
        rmodel, rparams = build_retinanet()
        r_iter = measure_chained(rmodel, rparams, img, BATCH)
        retina_ips = round(BATCH / r_iter, 2)
    except Exception as e:  # secondary metric must not break the bench
        retina_ips = f'failed: {e!r:.80}'

    # config-milestone-#5 rows: Mask R-CNN and Cascade R-CNN + AR-FPN
    # (device path: mask row includes the 28x28 mask-logit branch; the
    # host-side paste is excluded, matching the fixed-size device-buffer
    # eval design)
    extra_rows = {}
    for name, path in (
            ('mask_rcnn_r50_arfpn_img_per_sec',
             'configs/arfe/mask_rcnn_r50_arfpn_1x_coco.py'),
            ('cascade_rcnn_r50_arfpn_img_per_sec',
             'configs/arfe/cascade_rcnn_r50_arfpn_1x_coco.py')):
        try:
            m, p = build_from_config(path)
            it = measure_chained(m, p, img, BATCH, n_small=2, n_big=12)
            extra_rows[name] = round(BATCH / it, 2)
        except Exception as e:
            extra_rows[name] = f'failed: {e!r:.80}'

    # training rows for the mask / cascade families (VERDICT r3 item 5)
    for name, path, with_masks in (
            ('mask_rcnn_r50_arfpn_train_img_per_sec',
             'configs/arfe/mask_rcnn_r50_arfpn_1x_coco.py', True),
            ('cascade_rcnn_r50_arfpn_train_img_per_sec',
             'configs/arfe/cascade_rcnn_r50_arfpn_1x_coco.py', False)):
        try:
            m, p = build_from_config(path, with_train_cfg=True)
            extra_rows[name] = round(measure_train_step(
                m, p, n_small=2, n_big=8, with_masks=with_masks), 2)
        except Exception as e:
            extra_rows[name] = f'failed: {e!r:.80}'

    print(json.dumps({
        'metric': 'faster_rcnn_r50_arfpn_inference_throughput',
        'value': round(img_per_sec, 2),
        'unit': f'images/sec/chip (800x1344, bs{BATCH})',
        'vs_baseline': round(img_per_sec / BASELINE_IMG_PER_SEC, 3),
        'extra': {
            'p50_latency_ms_bs1': round(p50_ms, 2),
            'retinanet_r50_arfpn_img_per_sec': retina_ips,
            'train_step_img_per_sec': train_ips,
            **extra_rows,
        },
    }))


if __name__ == '__main__':
    main()
