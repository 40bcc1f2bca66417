"""Upgrade mmdet-1.x-style checkpoints to the 2.0 naming this framework
uses (ref: tools/upgrade_model_version.py).

Renames: bbox_head.* -> roi_head.bbox_head.*, mask_head.* ->
roi_head.mask_head.*, drops the obsolete +1-background cls channel
reordering note (2.0 moved bg to the last index; handled in the torch2jax
converter)."""
import argparse
import pickle
import re


RULES = [
    (r'^bbox_head\.', 'roi_head.bbox_head.'),
    (r'^mask_head\.', 'roi_head.mask_head.'),
    (r'^shared_head\.', 'roi_head.shared_head.'),
    (r'^bbox_roi_extractor\.', 'roi_head.bbox_roi_extractor.'),
    (r'^mask_roi_extractor\.', 'roi_head.mask_roi_extractor.'),
]


def upgrade(state_dict):
    out = {}
    for k, v in state_dict.items():
        nk = k
        for pat, rep in RULES:
            nk = re.sub(pat, rep, nk)
        out[nk] = v
    return out


def main():
    parser = argparse.ArgumentParser(description='Upgrade 1.x checkpoints')
    parser.add_argument('in_file')
    parser.add_argument('out_file')
    args = parser.parse_args()
    try:
        import torch
        ckpt = torch.load(args.in_file, map_location='cpu')
        sd = ckpt.get('state_dict', ckpt)
        ckpt['state_dict'] = upgrade(sd)
        torch.save(ckpt, args.out_file)
    except (ImportError, pickle.UnpicklingError):
        with open(args.in_file, 'rb') as f:
            ckpt = pickle.load(f)
        sd = ckpt.get('state_dict', ckpt)
        ckpt['state_dict'] = upgrade(sd)
        with open(args.out_file, 'wb') as f:
            pickle.dump(ckpt, f)
    print(f'upgraded checkpoint written to {args.out_file}')


if __name__ == '__main__':
    main()
