"""Corruption-robustness benchmark CLI (ref: tools/test_robustness.py:177-300).

Evaluates a checkpoint under every requested corruption x severity by
prepending a Corrupt transform to the test pipeline, then aggregates with
tools/robustness_eval.py (mPC/rPC).

Usage:
  python tools/test_robustness.py CONFIG CHECKPOINT --out results.pkl \
      [--corruptions benchmark|noise|blur|weather|digital|all|<names...>] \
      [--severities 0 1 2 3 4 5] [--eval bbox]
"""
import argparse
import copy
import pickle


CORRUPTION_SETS = {
    'benchmark': None,  # filled from data.corruptions
    'noise': ['gaussian_noise', 'shot_noise', 'impulse_noise'],
    'blur': ['defocus_blur', 'glass_blur', 'motion_blur', 'zoom_blur'],
    'weather': ['snow', 'frost', 'fog', 'brightness'],
    'digital': ['contrast', 'elastic_transform', 'pixelate',
                'jpeg_compression'],
    'holdout': ['speckle_noise', 'gaussian_blur', 'spatter', 'saturate'],
}


def parse_args():
    parser = argparse.ArgumentParser(
        description='Corruption robustness benchmark')
    parser.add_argument('config')
    parser.add_argument('checkpoint', nargs='?', default=None)
    parser.add_argument('--out', help='output result file (.pkl)')
    parser.add_argument('--corruptions', type=str, nargs='+',
                        default=['benchmark'])
    parser.add_argument('--severities', type=int, nargs='+',
                        default=[0, 1, 2, 3, 4, 5])
    parser.add_argument('--eval', type=str, nargs='+', default=['bbox'])
    parser.add_argument('--final-prints', type=str, nargs='+',
                        default=['P', 'mPC', 'rPC'])
    return parser.parse_args()


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp

    from arfe_tpu import Config
    from arfe_tpu.apis.test import single_device_test
    from arfe_tpu.data import build_dataloader, build_dataset
    from arfe_tpu.data.corruptions import BENCHMARK_CORRUPTIONS, CORRUPTIONS
    from arfe_tpu.models import build_detector

    CORRUPTION_SETS['benchmark'] = BENCHMARK_CORRUPTIONS
    corruptions = []
    for c in args.corruptions:
        if c == 'all':
            corruptions += sorted(CORRUPTIONS)
        elif c in CORRUPTION_SETS:
            corruptions += [x for x in CORRUPTION_SETS[c]
                            if x in CORRUPTIONS]
        elif c in CORRUPTIONS:
            corruptions.append(c)
        else:
            raise KeyError(f'unknown corruption (set) {c!r}')

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
        print('WARNING: no checkpoint given — random weights')
        params = jax.jit(model.init)(jax.random.PRNGKey(0))

    results = {}
    for corruption in corruptions:
        results[corruption] = {}
        for severity in args.severities:
            test_cfg = copy.deepcopy(cfg_dict['data']['test'])
            if severity > 0:
                corrupt_step = dict(type='Corrupt', corruption=corruption,
                                    severity=severity)
                # insert after image loading (ref: test_robustness.py:214)
                test_cfg['pipeline'].insert(1, corrupt_step)
            dataset = build_dataset(test_cfg, dict(test_mode=True))
            loader = build_dataloader(
                dataset, samples_per_gpu=1,
                workers_per_gpu=cfg_dict['data'].get('workers_per_gpu', 0),
                shuffle=False, test_mode=True)
            print(f'corruption={corruption} severity={severity}',
                  flush=True)
            dets = single_device_test(model, params, loader)
            metrics = dataset.evaluate(dets, metric=args.eval)
            results[corruption][severity] = metrics
            for k, v in metrics.items():
                print(f'  {k}: {v:.4f}' if isinstance(v, float)
                      else f'  {k}: {v}')
            if severity == 0:
                break_clean = results[corruption][0]
                # severity-0 (clean) result is corruption-independent;
                # share it across corruption rows
                for other in corruptions:
                    results.setdefault(other, {})[0] = break_clean

    if args.out:
        with open(args.out, 'wb') as f:
            pickle.dump(results, f)
        print(f'results written to {args.out}')

    from robustness_eval import get_results_from_dict
    get_results_from_dict(results, prints=args.final_prints)


if __name__ == '__main__':
    import os
    import sys
    here = os.path.dirname(os.path.abspath(
        globals().get('__file__', 'tools/test_robustness.py')))
    sys.path.insert(0, here)
    main()
