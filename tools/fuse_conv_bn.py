"""Fold frozen BatchNorms into the preceding convs
(ref: tools/fuse_conv_bn.py:10-46). With eval-mode BN, y = conv(x)*scale +
offset folds into the conv weight/bias exactly — shrinks the param tree and
removes the BN elementwise work at inference."""
import argparse


def fuse_tree(params, eps=1e-5):
    """Recursively fuse {convX: {weight[, bias]}, bnX: {...}} sibling pairs
    (resnet naming) and ConvModule {conv, bn} pairs."""
    import numpy as np

    def fuse(conv_p, bn_p):
        w = np.asarray(conv_p['weight'])  # HWIO
        scale = np.asarray(bn_p['weight']) / np.sqrt(
            np.asarray(bn_p['running_var']) + eps)
        offset = np.asarray(bn_p['bias']) - \
            np.asarray(bn_p['running_mean']) * scale
        new_w = w * scale  # broadcast over output channels (last dim)
        new_b = np.asarray(conv_p.get('bias', 0.0)) * scale + offset
        return {'weight': new_w, 'bias': new_b}

    if not isinstance(params, dict):
        return params
    out = {}
    keys = set(params.keys())
    consumed = set()
    for k in sorted(keys):
        if k in consumed:
            continue
        bn_key = None
        if k.startswith('conv') and ('bn' + k[4:]) in keys:
            bn_key = 'bn' + k[4:]
        elif k == 'conv' and 'bn' in keys:
            bn_key = 'bn'
        if bn_key is not None and 'running_mean' in params[bn_key]:
            out[k] = fuse(params[k], params[bn_key])
            consumed.add(bn_key)
        else:
            out[k] = fuse_tree(params[k], eps)
    # downsample Sequential: {'0': conv, '1': bn}
    if set(out.keys()) >= {'0', '1'} and isinstance(out.get('1'), dict) \
            and 'running_mean' in out['1']:
        out['0'] = fuse(out['0'], out['1'])
        del out['1']
    return out


def main():
    p = argparse.ArgumentParser(description='Fuse conv+bn in a checkpoint')
    p.add_argument('in_file')
    p.add_argument('out_file')
    args = p.parse_args()
    from arfe_tpu.utils import load_checkpoint, save_checkpoint
    params, meta, _ = load_checkpoint(args.in_file, to_jax=False)
    fused = fuse_tree(params)
    meta = dict(meta, fused_conv_bn=True)
    save_checkpoint(args.out_file, fused, meta=meta)
    print(f'fused checkpoint written to {args.out_file} '
          f'(NOTE: load with models built with norm_cfg=None)')


if __name__ == '__main__':
    main()
