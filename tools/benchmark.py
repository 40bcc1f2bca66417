"""Inference FPS benchmark (ref: tools/benchmark.py:60-100 — warmup then
timed FPS over the dataset; here with the device-loop methodology that is
accurate on remote-attached TPUs)."""
import argparse
import time


def parse_args():
    p = argparse.ArgumentParser(description='Benchmark a detector')
    p.add_argument('config')
    p.add_argument('checkpoint', nargs='?', default=None)
    p.add_argument('--batch', type=int, default=4)
    p.add_argument('--shape', type=int, nargs=2, default=[800, 1344])
    p.add_argument('--iters', type=int, default=12)
    p.add_argument('--dtype', default='bfloat16',
                   choices=['bfloat16', 'float32'])
    return p.parse_args()


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from arfe_tpu import Config
    from arfe_tpu.models import build_detector

    cfg = Config.fromfile(args.config)
    cfg_dict = cfg.todict()
    model_cfg = dict(cfg_dict['model'])
    model_cfg.pop('pretrained', None)
    model = build_detector(model_cfg, test_cfg=cfg_dict.get('test_cfg'))
    if args.checkpoint:
        from arfe_tpu.utils import load_checkpoint
        params, _, _ = load_checkpoint(args.checkpoint)
        params = jax.tree_util.tree_map(jnp.asarray, params)
    else:
        params = jax.jit(model.init)(jax.random.PRNGKey(0))

    b = args.batch
    h, w = args.shape
    dtype = jnp.bfloat16 if args.dtype == 'bfloat16' else jnp.float32
    img = jnp.asarray(np.random.RandomState(0).randn(b, h, w, 3) * 0.2,
                      dtype)
    shapes = jnp.asarray([[float(h), float(w)]] * b)
    sf = jnp.ones((b, 4), jnp.float32)

    @jax.jit
    def loop(p, x, n):
        def body(i, carry):
            out = model.simple_test(p, carry, shapes, sf, rescale=True)
            return carry + (out[0].mean() * 1e-20).astype(carry.dtype)
        return jax.lax.fori_loop(0, n, body, x)[0, 0, 0, 0]

    n1, n2 = 2, args.iters
    float(loop(params, img, n1))  # compile + warm
    times = {}
    for n in (n1, n2):
        t0 = time.time()
        float(loop(params, img, n))
        times[n] = time.time() - t0
    per_iter = (times[n2] - times[n1]) / (n2 - n1)
    print(f'batch {b} @ {h}x{w} {args.dtype}: '
          f'{per_iter * 1e3:.1f} ms/batch, {b / per_iter:.2f} img/s')


if __name__ == '__main__':
    main()
