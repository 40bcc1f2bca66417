"""Evaluation CLI (ref: tools/test.py:18-147).

Usage: python tools/test.py CONFIG CHECKPOINT [--eval bbox] [--out F.pkl]
"""
import argparse
import pickle


def parse_args():
    parser = argparse.ArgumentParser(description='Test a detector')
    parser.add_argument('config')
    parser.add_argument('checkpoint', nargs='?', default=None)
    parser.add_argument('--out', help='output result file (.pkl)')
    parser.add_argument('--eval', type=str, nargs='+',
                        help='metrics: bbox proposal mAP recall')
    parser.add_argument('--show-dir', help='dir to save visualizations')
    parser.add_argument('--multi-chip', action='store_true',
                        help='shard eval over all devices')
    parser.add_argument('--device-eval', action='store_true',
                        help='with --multi-chip --eval bbox: accumulate '
                             'COCO match stats on device (one host '
                             'transfer at the end)')
    return parser.parse_args()


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp

    from arfe_tpu import Config
    from arfe_tpu.apis.test import multi_device_test, single_device_test
    from arfe_tpu.data import build_dataloader, build_dataset
    from arfe_tpu.models import build_detector
    from arfe_tpu.parallel import make_mesh

    cfg = Config.fromfile(args.config)
    cfg_dict = cfg.todict()
    model_cfg = dict(cfg_dict['model'])
    model_cfg.pop('pretrained', None)
    model = build_detector(model_cfg, test_cfg=cfg_dict.get('test_cfg'))
    if args.checkpoint:
        from arfe_tpu.utils import load_checkpoint
        params, meta, _ = load_checkpoint(args.checkpoint)
        params = jax.tree_util.tree_map(jnp.asarray, params)
    else:
        print('WARNING: no checkpoint given — random weights')
        params = jax.jit(model.init)(jax.random.PRNGKey(0))

    dataset = build_dataset(cfg_dict['data']['test'],
                            dict(test_mode=True))
    loader = build_dataloader(
        dataset, samples_per_gpu=1,
        workers_per_gpu=cfg_dict['data'].get('workers_per_gpu', 2),
        num_gpus=len(jax.devices()) if args.multi_chip else 1,
        shuffle=False, test_mode=True)

    if args.multi_chip and args.device_eval and args.eval == ['bbox'] \
            and not args.out and hasattr(dataset, 'coco'):
        # north-star path: on-device COCO stat accumulation over the mesh
        from arfe_tpu.apis.test import multi_device_coco_eval
        stats = multi_device_coco_eval(model, params, loader, dataset,
                                       make_mesh())
        for k, v in stats.items():
            print(f'{k}: {v:.4f}' if isinstance(v, float) else f'{k}: {v}')
        return
    if args.multi_chip and len(jax.devices()) > 1:
        results = multi_device_test(model, params, loader, make_mesh())
    else:
        results = single_device_test(model, params, loader)

    if args.out:
        with open(args.out, 'wb') as f:
            pickle.dump(results, f)
        print(f'results written to {args.out}')
    if args.eval:
        metrics = dataset.evaluate(results, metric=args.eval)
        for k, v in metrics.items():
            print(f'{k}: {v:.4f}' if isinstance(v, float) else f'{k}: {v}')


if __name__ == '__main__':
    main()
