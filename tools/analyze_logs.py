"""Training log analysis (ref: tools/analyze_logs.py — epoch-time stats and
loss-curve plotting over json logs). Our train loop records history dicts;
this tool also parses the text logs written by tools/train.py."""
import argparse
import json
import re


def load_log(path):
    """Parse either a json-lines history file or a text train log."""
    entries = []
    line_re = re.compile(
        r'Epoch \[(\d+)\]\[(\d+)/(\d+)\](.*)')
    kv_re = re.compile(r'(\w+): ([-\d.einf]+)')
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            if line.startswith('{'):
                entries.append(json.loads(line))
                continue
            m = line_re.search(line)
            if m:
                d = dict(epoch=int(m.group(1)), iter=int(m.group(2)))
                for k, v in kv_re.findall(m.group(4)):
                    try:
                        d[k] = float(v)
                    except ValueError:
                        pass
                entries.append(d)
    return entries


def cal_train_time(entries):
    """(ref: analyze_logs.py cal_train_time:10)."""
    by_epoch = {}
    for e in entries:
        if 'time' in e:
            by_epoch.setdefault(e['epoch'], []).append(e['time'])
    for ep, times in sorted(by_epoch.items()):
        import numpy as np
        print(f'epoch {ep}: mean iter time {np.mean(times):.4f}s')


def plot_curve(entries, keys, out=None):
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    for key in keys:
        xs = [i for i, e in enumerate(entries) if key in e]
        ys = [e[key] for e in entries if key in e]
        plt.plot(xs, ys, label=key)
    plt.legend()
    plt.xlabel('log step')
    if out:
        plt.savefig(out)
        print(f'saved to {out}')
    else:
        plt.savefig('curve.png')
        print('saved to curve.png')


def main():
    p = argparse.ArgumentParser(description='Analyze training logs')
    sub = p.add_subparsers(dest='task', required=True)
    pc = sub.add_parser('plot_curve')
    pc.add_argument('logs', nargs='+')
    pc.add_argument('--keys', nargs='+', default=['loss'])
    pc.add_argument('--out', default=None)
    ct = sub.add_parser('cal_train_time')
    ct.add_argument('logs', nargs='+')
    args = p.parse_args()
    for path in args.logs:
        entries = load_log(path)
        if args.task == 'plot_curve':
            plot_curve(entries, args.keys, args.out)
        else:
            cal_train_time(entries)


if __name__ == '__main__':
    main()
