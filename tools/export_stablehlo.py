"""Export a detector's jitted inference to serialized StableHLO
(the TPU-native counterpart of the reference's tools/pytorch2onnx.py:
a portable, runtime-loadable graph artifact).

Usage: python tools/export_stablehlo.py CONFIG [CKPT] --out model.stablehlo \
           [--shape 800 1344] [--batch 1]
"""
import argparse


def main():
    parser = argparse.ArgumentParser(description='StableHLO export')
    parser.add_argument('config')
    parser.add_argument('checkpoint', nargs='?', default=None)
    parser.add_argument('--out', required=True)
    parser.add_argument('--shape', type=int, nargs=2, default=[800, 1344])
    parser.add_argument('--batch', type=int, default=1)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import export as jax_export

    from arfe_tpu import Config
    from arfe_tpu.models import build_detector

    cfg = Config.fromfile(args.config)
    model_cfg = dict(cfg.todict()['model'])
    model_cfg.pop('pretrained', None)
    model = build_detector(model_cfg, test_cfg=cfg.todict().get('test_cfg'))
    if args.checkpoint:
        from arfe_tpu.utils import load_checkpoint
        params, _, _ = load_checkpoint(args.checkpoint)
        params = jax.tree_util.tree_map(jnp.asarray, params)
    else:
        params = jax.jit(model.init)(jax.random.PRNGKey(0))

    b = args.batch
    h, w = args.shape

    def infer(params, img, img_shapes, scale_factors):
        return model.simple_test(params, img, img_shapes, scale_factors,
                                 rescale=True)

    exported = jax_export.export(jax.jit(infer))(
        jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), params),
        jax.ShapeDtypeStruct((b, h, w, 3), jnp.float32),
        jax.ShapeDtypeStruct((b, 2), jnp.float32),
        jax.ShapeDtypeStruct((b, 4), jnp.float32))
    blob = exported.serialize()
    with open(args.out, 'wb') as f:
        f.write(blob)
    print(f'wrote {len(blob) / 1e6:.1f} MB StableHLO to {args.out}')
    print('reload with jax.export.deserialize(blob).call(params, ...)')


if __name__ == '__main__':
    main()
