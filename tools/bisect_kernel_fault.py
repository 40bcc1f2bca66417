"""Bisect driver for the XLA TPU kernel-fault family.

Runs ``tools/repro_kernel_fault.py`` in subprocesses over a shrink
lattice, classifying each run as ok / fault / timeout, to find the
MINIMAL configuration that still hard-faults the TPU worker, then sweeps
a set of XLA scheduling/fusion flags on that minimal config looking for
a fusion-preserving unfault.

The two production faults this targets (both bare-jit XLA miscompiles,
reproduce with our Pallas kernels disabled):
  (a) RetinaNet bs8 simple_test inside lax.fori_loop (bench.py note);
  (b) composed backbone+FPN+channel-major finals
      (single_stage._head_bboxes with ARFE_TPU_CM_FINALS=1).

Usage (on real TPU):
  python tools/bisect_kernel_fault.py --mode cm              # fault (b)
  python tools/bisect_kernel_fault.py --mode fori            # fault (a)
  python tools/bisect_kernel_fault.py --mode cm --flags-only # skip shrink
Results land in /tmp/fault_bisect_<mode>.json (and stdout).

A fault is a subprocess that dies without printing ``OK`` (the axon
worker hard-fault presents as a hang or an abrupt nonzero exit). Each
subprocess gets a fresh backend, so one fault cannot poison later runs.
"""
import argparse
import json
import os
import subprocess
import sys
import time

REPRO = os.path.join(os.path.dirname(__file__), 'repro_kernel_fault.py')

# Scheduling/fusion toggles worth trying on a TPU miscompile. Unknown
# flags make XLA abort with a parse error — classified separately, not
# as a fault.
XLA_FLAG_CANDIDATES = [
    '--xla_tpu_enable_latency_hiding_scheduler=false',
    '--xla_latency_hiding_scheduler_rerun=0',
    '--xla_tpu_licm_size_inflation_ratio=0',
    '--xla_tpu_scoped_vmem_limit_kib=16384',
    '--xla_tpu_enable_aggressive_broadcast_priority_update=false',
    '--xla_tpu_perform_spmd_cse_prevention=false',
    '--xla_tpu_rwb_fusion=false',
    '--xla_tpu_enable_dot_strength_reduction=false',
    '--xla_tpu_vector_load_fusion_level=0',
    '--xla_tpu_vector_store_fusion_level=0',
    '--xla_tpu_reduce_loop_fusion_dup_with_unfusable_user=false',
    '--xla_tpu_enable_multi_level_output_fusion=false',
    '--xla_tpu_enable_multi_level_input_dot_fusion=false',
]


def run_case(args_list, extra_env=None, timeout=620):
    env = dict(os.environ)
    env.pop('ARFE_TPU_FORCE_CPU', None)
    env.pop('XLA_FLAGS', None)
    if extra_env:
        env.update(extra_env)
    cmd = [sys.executable, REPRO] + args_list
    t0 = time.time()
    try:
        p = subprocess.run(cmd, capture_output=True, text=True,
                           timeout=timeout, env=env, cwd=os.path.dirname(
                               os.path.dirname(os.path.abspath(__file__))))
    except subprocess.TimeoutExpired as e:
        out = (e.stdout or b'')
        out = out.decode() if isinstance(out, bytes) else out
        return dict(status='timeout', secs=time.time() - t0,
                    tail=out[-400:])
    out = p.stdout + p.stderr
    if 'OK ' in p.stdout:
        return dict(status='ok', secs=time.time() - t0,
                    tail=p.stdout.strip()[-200:])
    if 'Unknown flag' in out or 'Unrecognized' in out or 'ERROR: unknown' \
            in out.lower() or 'Illegal value' in out:
        return dict(status='flag-invalid', secs=time.time() - t0,
                    tail=out[-400:])
    return dict(status='fault', rc=p.returncode, secs=time.time() - t0,
                tail=out[-600:])


def case_args(cfg, mode):
    a = ['--frontend', cfg['frontend'], '--tail', cfg['tail'],
         '--batch', str(cfg['batch']), '--levels', str(cfg['levels']),
         '--dtype', cfg['dtype'], '--height', str(cfg['height']),
         '--width', str(cfg['width']), '--towers', str(cfg['towers'])]
    if cfg.get('barrier'):
        a.append('--barrier')
    if mode == 'fori':
        a += ['--fori', '--nhwc-tail']
    return a


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--mode', choices=['cm', 'fori'], default='cm')
    ap.add_argument('--flags-only', action='store_true')
    ap.add_argument('--timeout', type=int, default=620,
                    help='per-case wall clock (cold remote compiles run '
                         '1.5-4 min; a hung worker never returns)')
    args = ap.parse_args()

    full = dict(frontend='resnet', tail='nms', batch=8, levels=5,
                dtype='bf16', height=800, width=1344, towers=4)
    log = dict(mode=args.mode, cases=[])

    def attempt(cfg, label):
        r = run_case(case_args(cfg, args.mode), timeout=args.timeout)
        entry = dict(label=label, cfg=dict(cfg), **r)
        log['cases'].append(entry)
        print(f'[{r["status"]:>12}] {label}: {json.dumps(cfg)} '
              f'({r["secs"]:.0f}s)', flush=True)
        return r['status']

    # cold-compile warmup: the first attempt of an uncached graph can
    # time out on the tunnel; re-run once before believing a timeout
    def attempt_retry(cfg, label):
        s = attempt(cfg, label)
        if s == 'timeout':
            s = attempt(cfg, label + ' (retry)')
        return s

    minimal = dict(full)
    if not args.flags_only:
        s = attempt_retry(full, 'full')
        if s == 'ok':
            print('full config did not fault — nothing to shrink',
                  flush=True)
        else:
            # greedy shrink, one axis at a time, keep-if-still-faulting
            shrink_axes = [
                ('batch', [4, 2, 1]),
                ('levels', [4, 3, 2, 1]),
                ('towers', [2, 0]),
                ('frontend', ['convs', 'input']),
                ('tail', ['decode', 'gather', 'topk', 'softplus',
                          'finals']),
                ('dtype', ['f32']),
                ('height', [416, 256]),
                ('width', [512, 256]),
            ]
            for key, values in shrink_axes:
                for v in values:
                    cand = dict(minimal)
                    cand[key] = v
                    if attempt_retry(cand, f'shrink {key}={v}') == 'fault':
                        minimal = cand
                    else:
                        break
            print(f'MINIMAL faulting config: {json.dumps(minimal)}',
                  flush=True)
            log['minimal'] = minimal

        # control: barrier workaround on the minimal config
        ctl = dict(minimal, barrier=True)
        attempt_retry(ctl, 'minimal+barrier (control)')

    # flag sweep on the minimal (or full) faulting config
    unfaulting = []
    for flag in XLA_FLAG_CANDIDATES:
        r = run_case(case_args(minimal, args.mode),
                     extra_env={'XLA_FLAGS': flag}, timeout=args.timeout)
        log['cases'].append(dict(label=f'flag {flag}', cfg=dict(minimal),
                                 **r))
        print(f'[{r["status"]:>12}] {flag} ({r["secs"]:.0f}s)', flush=True)
        if r['status'] == 'ok':
            unfaulting.append(flag)
    log['unfaulting_flags'] = unfaulting

    out = f'/tmp/fault_bisect_{args.mode}.json'
    with open(out, 'w') as f:
        json.dump(log, f, indent=1)
    print(f'\nwrote {out}')
    if unfaulting:
        print('UNFAULTING FLAGS: ' + ', '.join(unfaulting))


if __name__ == '__main__':
    main()
