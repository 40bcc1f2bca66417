"""Training CLI (ref: tools/train.py:19-150).

Usage: python tools/train.py CONFIG [--work-dir D] [--resume-from CKPT]
       [--seed N] [--options k=v ...]
"""
import argparse
import ast
import os
import os.path as osp
import time


def parse_args():
    parser = argparse.ArgumentParser(description='Train a detector')
    parser.add_argument('config', help='train config file path')
    parser.add_argument('--work-dir', help='dir to save logs and ckpts')
    parser.add_argument('--resume-from', help='checkpoint to resume from')
    parser.add_argument('--no-validate', action='store_true')
    parser.add_argument('--seed', type=int, default=None)
    parser.add_argument('--deterministic', action='store_true')
    parser.add_argument('--options', nargs='+', default=[],
                        help='k=v config overrides (dotted keys)')
    parser.add_argument('--autoscale-lr', action='store_true',
                        help='scale lr linearly with device count / 8 '
                             '(ref: tools/train.py:90-92)')
    return parser.parse_args()


def main():
    args = parse_args()
    # multi-host: join the coordination service BEFORE any backend use
    # (ref: tools/train.py:95-99 init_dist; activated by dist_train.sh /
    # slurm_train.sh via ARFE_DIST_INIT=1)
    from arfe_tpu.parallel import maybe_init_distributed
    if maybe_init_distributed():
        import jax
        print(f'[dist] process {jax.process_index()}/{jax.process_count()}'
              f' up, {len(jax.devices())} global device(s)')
    from arfe_tpu import Config
    from arfe_tpu.apis import set_random_seed, train_detector
    from arfe_tpu.data import build_dataset
    from arfe_tpu.models import build_detector
    from arfe_tpu.utils import collect_env, get_root_logger

    cfg = Config.fromfile(args.config)
    if args.options:
        overrides = {}
        for kv in args.options:
            k, v = kv.split('=', 1)
            try:
                v = ast.literal_eval(v)
            except (ValueError, SyntaxError):
                pass
            overrides[k] = v
        cfg.merge_from_dict(overrides)
    if args.work_dir is not None:
        cfg['work_dir'] = args.work_dir
    elif cfg.get('work_dir') is None:
        cfg['work_dir'] = osp.join(
            './work_dirs', osp.splitext(osp.basename(args.config))[0])
    if args.resume_from is not None:
        cfg['resume_from'] = args.resume_from
    if args.seed is not None:
        cfg['seed'] = args.seed
        set_random_seed(args.seed, deterministic=args.deterministic)
    if args.autoscale_lr:
        import jax
        cfg['optimizer']['lr'] = cfg['optimizer']['lr'] \
            * len(jax.devices()) / 8

    os.makedirs(cfg['work_dir'], exist_ok=True)
    timestamp = time.strftime('%Y%m%d_%H%M%S', time.localtime())
    logger = get_root_logger(osp.join(cfg['work_dir'], f'{timestamp}.log'))
    env = collect_env()
    logger.info('Environment:\n' + '\n'.join(
        f'{k}: {v}' for k, v in env.items()))
    cfg.dump(osp.join(cfg['work_dir'], osp.basename(args.config)))

    cfg_dict = cfg.todict()
    model_cfg = dict(cfg_dict['model'])
    # pretrained= is honored: the detector stores it and train_detector
    # loads the local converted backbone checkpoint
    # (arfe_tpu/utils/pretrained.py; ref resnet.py:634-658)
    model = build_detector(model_cfg, train_cfg=cfg_dict.get('train_cfg'),
                           test_cfg=cfg_dict.get('test_cfg'))
    dataset = build_dataset(cfg_dict['data']['train'])
    logger.info(f'dataset: {len(dataset)} images')
    train_detector(model, dataset, cfg, validate=not args.no_validate,
                   logger=logger, timestamp=timestamp)


if __name__ == '__main__':
    main()
