"""Convert pycls RegNet checkpoints to this framework's naming
(ref: tools/regnet2mmdet.py): stem.conv->conv1, stem.bn->bn1,
s{i}.b{j}.* -> layer{i}.{j-1}.* with proj->downsample, f.a->conv1,
f.b->conv2, f.c->conv3 and matching bns."""
import argparse
import re


def convert_key(k):
    k = k.replace('stem.conv.', 'conv1.').replace('stem.bn.', 'bn1.')
    m = re.match(r's(\d+)\.b(\d+)\.(.*)', k)
    if m:
        stage, block, rest = int(m.group(1)), int(m.group(2)), m.group(3)
        rest = (rest
                .replace('proj_block.', '')
                .replace('proj.', 'downsample.0.')
                .replace('bn.', 'downsample.1.')
                if rest.startswith(('proj', 'bn.')) else rest)
        rest = (rest
                .replace('f.a.', 'conv1.').replace('f.a_bn.', 'bn1.')
                .replace('f.b.', 'conv2.').replace('f.b_bn.', 'bn2.')
                .replace('f.c.', 'conv3.').replace('f.c_bn.', 'bn3.'))
        k = f'layer{stage}.{block - 1}.{rest}'
    return k


def main():
    parser = argparse.ArgumentParser(description='pycls regnet -> arfe_tpu')
    parser.add_argument('in_file')
    parser.add_argument('out_file')
    args = parser.parse_args()
    import torch
    ckpt = torch.load(args.in_file, map_location='cpu')
    sd = ckpt.get('model_state', ckpt.get('state_dict', ckpt))
    out = {convert_key(k): v for k, v in sd.items()
           if not k.startswith('head.')}
    torch.save(dict(state_dict=out), args.out_file)
    print(f'converted {len(out)} tensors -> {args.out_file}')


if __name__ == '__main__':
    main()
