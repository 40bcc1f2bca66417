"""Round benchmark: flagship Faster R-CNN R50 + AR-FPN inference throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Methodology (this machine's axon tunnel makes host-side timing async and
meaningless — see .claude/skills/verify/SKILL.md): N model iterations run
inside one jitted lax.fori_loop with a data-dependent carry; two loop
lengths subtract the fixed per-dispatch tunnel cost; sync is a scalar
materialization.

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
BATCH = 4
H, W = 800, 1344


def build():
    from __graft_entry__ import _build_flagship
    model = _build_flagship()
    params = jax.jit(model.init)(jax.random.PRNGKey(0))
    return model, params


def make_loop(model):
    img_shapes = jnp.asarray([[float(H), 1333.0]] * BATCH)
    scale_factors = jnp.ones((BATCH, 4), jnp.float32)

    @jax.jit
    def loop(params, img, n_iters):
        def body(i, carry):
            dets, labels, valid = model.simple_test(
                params, carry, img_shapes, scale_factors, rescale=True)
            # data-dependent carry defeats loop folding; numerically ~0
            return carry + (dets.mean() * 1e-20).astype(carry.dtype)
        # traced n_iters -> single compile serves all loop lengths
        out = jax.lax.fori_loop(0, n_iters, body, img)
        return out[0, 0, 0, 0]

    return loop


def main():
    model, params = build()
    # bf16 compute path: layers cast fp32 master params to the input dtype
    # per-op; detection math is fp32 behind force_fp32 boundaries
    img = jnp.asarray(
        np.random.RandomState(0).randn(BATCH, H, W, 3) * 0.2, jnp.bfloat16)

    n_small, n_big = 2, 12
    loop = make_loop(model)
    float(loop(params, img, n_small))  # compile + warm
    times = {}
    for n in (n_small, n_big):
        t0 = time.time()
        float(loop(params, img, n))
        times[n] = time.time() - t0
    per_iter = (times[n_big] - times[n_small]) / (n_big - n_small)
    img_per_sec = BATCH / per_iter
    print(json.dumps({
        'metric': 'faster_rcnn_r50_arfpn_inference_throughput',
        'value': round(img_per_sec, 2),
        'unit': 'images/sec/chip (800x1344, bs4)',
        'vs_baseline': round(img_per_sec / BASELINE_IMG_PER_SEC, 3),
    }))


if __name__ == '__main__':
    main()
