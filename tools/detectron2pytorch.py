"""Convert Detectron (caffe2) ResNet weights to torch-style naming usable
by the torch2jax converter (ref: tools/detectron2pytorch.py)."""
import argparse
import pickle

import numpy as np


def convert_bn(blobs, torch_name, caffe_name, out):
    # caffe2 affine-only bn: scale s + bias b
    out[torch_name + '.weight'] = blobs[caffe_name + '_s']
    out[torch_name + '.bias'] = blobs[caffe_name + '_b']
    out[torch_name + '.running_mean'] = np.zeros_like(
        blobs[caffe_name + '_b'])
    out[torch_name + '.running_var'] = np.ones_like(
        blobs[caffe_name + '_s'])


def convert(in_file, out_file, depth=50):
    arch = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}[depth]
    with open(in_file, 'rb') as f:
        data = pickle.load(f, encoding='latin1')
    blobs = data.get('blobs', data)
    out = {}
    out['conv1.weight'] = blobs['conv1_w']
    convert_bn(blobs, 'bn1', 'res_conv1_bn', out)
    for i, n_blocks in enumerate(arch, start=2):
        for j in range(n_blocks):
            pre = f'res{i}_{j}'
            tpre = f'layer{i - 1}.{j}'
            for branch, tconv, tbn in (('_branch2a', 'conv1', 'bn1'),
                                       ('_branch2b', 'conv2', 'bn2'),
                                       ('_branch2c', 'conv3', 'bn3')):
                out[f'{tpre}.{tconv}.weight'] = blobs[pre + branch + '_w']
                convert_bn(blobs, f'{tpre}.{tbn}', pre + branch + '_bn',
                           out)
            if pre + '_branch1_w' in blobs:
                out[f'{tpre}.downsample.0.weight'] = \
                    blobs[pre + '_branch1_w']
                convert_bn(blobs, f'{tpre}.downsample.1',
                           pre + '_branch1_bn', out)
    with open(out_file, 'wb') as f:
        pickle.dump(dict(state_dict=out), f)
    print(f'converted {len(out)} tensors -> {out_file}')


def main():
    parser = argparse.ArgumentParser(description='detectron -> torch names')
    parser.add_argument('in_file')
    parser.add_argument('out_file')
    parser.add_argument('--depth', type=int, default=50)
    args = parser.parse_args()
    convert(args.in_file, args.out_file, args.depth)


if __name__ == '__main__':
    main()
