"""FLOPs/params report (ref: tools/get_flops.py + the hook-based counter
mmdet/utils/flops_counter.py:37-460 — replaced by XLA's own cost analysis
on the compiled program, which is exact rather than per-module estimated)."""
import argparse


def parse_args():
    p = argparse.ArgumentParser(description='Get detector FLOPs and params')
    p.add_argument('config')
    p.add_argument('--shape', type=int, nargs='+', default=[1280, 800])
    return p.parse_args()


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from arfe_tpu import Config
    from arfe_tpu.models import build_detector

    if len(args.shape) == 1:
        h = w = args.shape[0]
    else:
        h, w = args.shape
    cfg = Config.fromfile(args.config)
    cfg_dict = cfg.todict()
    model_cfg = dict(cfg_dict['model'])
    model_cfg.pop('pretrained', None)
    model = build_detector(model_cfg, test_cfg=cfg_dict.get('test_cfg'))
    params = jax.jit(model.init)(jax.random.PRNGKey(0))
    n_params = sum(int(np.prod(x.shape))
                   for x in jax.tree_util.tree_leaves(params))

    img = jnp.zeros((1, h, w, 3), jnp.float32)

    def fwd(p, x):
        feats = model.extract_feat(p, x)
        head = getattr(model, 'bbox_head', None) or model.rpn_head
        key = 'bbox_head' if hasattr(model, 'bbox_head') else 'rpn_head'
        return head(p[key], feats)

    compiled = jax.jit(fwd).lower(params, img).compile()
    ca = compiled.cost_analysis()
    flops = ca.get('flops', 0.0)
    print('=' * 30)
    print(f'Input shape: (1, {h}, {w}, 3)')
    print(f'Flops: {flops / 1e9:.2f} GFLOPs (backbone+neck+dense head, '
          f'exact XLA cost analysis)')
    print(f'Params: {n_params / 1e6:.2f} M')
    print(f'Bytes accessed: {ca.get("bytes accessed", 0) / 1e9:.2f} GB')
    print('=' * 30)


if __name__ == '__main__':
    main()
