"""Print the fully-resolved config (ref: tools/print_config.py)."""
import argparse

from arfe_tpu import Config


def main():
    p = argparse.ArgumentParser(description='Print a resolved config')
    p.add_argument('config')
    p.add_argument('--options', nargs='+', default=[])
    args = p.parse_args()
    cfg = Config.fromfile(args.config)
    if args.options:
        import ast
        overrides = {}
        for kv in args.options:
            k, v = kv.split('=', 1)
            try:
                v = ast.literal_eval(v)
            except (ValueError, SyntaxError):
                pass
            overrides[k] = v
        cfg.merge_from_dict(overrides)
    print(cfg.dump())


if __name__ == '__main__':
    main()
