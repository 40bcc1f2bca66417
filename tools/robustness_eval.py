"""Aggregate corruption-benchmark results into P / mPC / rPC
(ref: tools/robustness_eval.py:1-200).

P    = clean performance (severity 0)
mPC  = mean performance under corruption (severities 1..5, benchmark set)
rPC  = mPC / P
"""
import argparse
import pickle

import numpy as np


def get_results_from_dict(results, metric_key=None, prints=('P', 'mPC',
                                                            'rPC'),
                          aggregate='benchmark'):
    """results: {corruption: {severity: {metric: value}}}."""
    from arfe_tpu.data.corruptions import BENCHMARK_CORRUPTIONS
    if aggregate == 'benchmark':
        corruptions = [c for c in results if c in BENCHMARK_CORRUPTIONS]
    else:
        corruptions = list(results)
    if not corruptions:
        corruptions = list(results)

    # pick the metric keys present everywhere
    any_row = next(iter(results.values()))
    any_metrics = next(iter(any_row.values()))
    keys = [metric_key] if metric_key else \
        [k for k, v in any_metrics.items() if isinstance(v, float)]

    out = {}
    for key in keys:
        clean = [results[c][0][key] for c in corruptions
                 if 0 in results[c]]
        P = float(np.mean(clean)) if clean else float('nan')
        per_corr = []
        for c in corruptions:
            sev = [results[c][s][key] for s in sorted(results[c]) if s > 0]
            if sev:
                per_corr.append(np.mean(sev))
        mPC = float(np.mean(per_corr)) if per_corr else float('nan')
        rPC = mPC / P if P else float('nan')
        out[key] = dict(P=P, mPC=mPC, rPC=rPC)
        parts = []
        if 'P' in prints:
            parts.append(f'P={P:.4f}')
        if 'mPC' in prints:
            parts.append(f'mPC={mPC:.4f}')
        if 'rPC' in prints:
            parts.append(f'rPC={rPC:.4f}')
        print(f'{key}: ' + '  '.join(parts))
    return out


def main():
    parser = argparse.ArgumentParser(description='Robustness aggregation')
    parser.add_argument('filename', help='result file (.pkl) from '
                                         'test_robustness.py')
    parser.add_argument('--metric', default=None)
    parser.add_argument('--prints', type=str, nargs='+',
                        default=['P', 'mPC', 'rPC'])
    parser.add_argument('--aggregate', default='benchmark',
                        choices=['benchmark', 'all'])
    args = parser.parse_args()
    with open(args.filename, 'rb') as f:
        results = pickle.load(f)
    get_results_from_dict(results, metric_key=args.metric,
                          prints=args.prints, aggregate=args.aggregate)


if __name__ == '__main__':
    main()
