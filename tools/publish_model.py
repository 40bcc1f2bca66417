"""Strip optimizer state and hash-stamp a checkpoint
(ref: tools/publish_model.py)."""
import argparse

from arfe_tpu.utils import publish_model


def main():
    p = argparse.ArgumentParser(description='Publish a checkpoint')
    p.add_argument('in_file')
    p.add_argument('out_file')
    args = p.parse_args()
    final = publish_model(args.in_file, args.out_file)
    print(f'published: {final}')


if __name__ == '__main__':
    main()
