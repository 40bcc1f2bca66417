"""Convert a PyTorch (mmdet/torchvision) checkpoint to the native format
(the north-star converter; ref analogs: tools/upgrade_model_version.py,
detectron2pytorch.py, regnet2mmdet.py)."""
import argparse


def main():
    p = argparse.ArgumentParser(
        description='Convert torch .pth to arfe_tpu checkpoint')
    p.add_argument('in_file')
    p.add_argument('out_file')
    p.add_argument('--skip-prefix', nargs='*', default=['fc.'],
                   help='state_dict prefixes to drop '
                        '(default: torchvision fc head)')
    p.add_argument('--config', default=None,
                   help='optional config to verify the tree structure '
                        'against a freshly-initialized model')
    args = p.parse_args()
    from arfe_tpu.convert import diff_trees, load_torch_checkpoint
    from arfe_tpu.utils import save_checkpoint

    params, meta = load_torch_checkpoint(
        args.in_file, skip_prefixes=tuple(args.skip_prefix))
    if args.config:
        import jax
        from arfe_tpu import Config
        from arfe_tpu.models import build_detector
        cfg = Config.fromfile(args.config)
        model_cfg = dict(cfg.todict()['model'])
        model_cfg.pop('pretrained', None)
        model = build_detector(model_cfg,
                               test_cfg=cfg.todict().get('test_cfg'))
        init = jax.eval_shape(model.init, jax.random.PRNGKey(0))
        msgs = diff_trees(params, init)
        if msgs:
            print('STRUCTURE DIFFS (converted vs model):')
            for m in msgs[:50]:
                print(' ', m)
        else:
            print('converted tree matches the model structure exactly')
    save_checkpoint(args.out_file, params, meta=dict(meta))
    print(f'wrote {args.out_file}')


if __name__ == '__main__':
    main()
