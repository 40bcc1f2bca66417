"""PyTorch checkpoint -> param pytree converter.

Required by the north star (BASELINE.json: "loading converted PyTorch
checkpoints"). The reference stores checkpoints as
``{'state_dict': {...}, 'meta': {...}}`` (mmcv CheckpointHook;
ref: tools/train.py:141-147), with tensors in OIHW (conv) / (out,in)
(linear) layouts. Our param trees mirror state_dict naming exactly, so
conversion is: split dotted names into a nested dict and transpose conv
kernels OIHW -> HWIO. Linear weights stay (out, in) — ``layers.Linear``
keeps the torch layout.
"""
from __future__ import annotations

import numpy as np

SKIP_SUFFIXES = ('num_batches_tracked',)

# torch ConvTranspose2d weights are IOHW (not OIHW) and torch scatters with
# an unflipped kernel while lax.conv_transpose correlates — so these need
# transpose(2,3,0,1) + a spatial flip to produce the HWIO kernel our
# ConvTranspose2d module consumes (verified vs torch in
# tests/test_layers_vs_torch.py).
TRANSPOSED_CONV_SUFFIXES = ('upsample.weight',)


def tensor_to_array(name: str, tensor) -> np.ndarray:
    arr = np.asarray(tensor.detach().cpu().numpy() if hasattr(tensor, 'detach')
                     else tensor)
    if arr.ndim == 4 and name.endswith(TRANSPOSED_CONV_SUFFIXES):
        arr = arr.transpose(2, 3, 0, 1)[::-1, ::-1]  # IOHW -> HWIO + flip
    elif arr.ndim == 4 and name.endswith('weight'):
        arr = arr.transpose(2, 3, 1, 0)  # OIHW -> HWIO
    return np.ascontiguousarray(arr.astype(np.float32))


def state_dict_to_params(state_dict, prefix_map=None, skip_prefixes=()):
    """Convert a flat torch state_dict to a nested param dict.

    Args:
        state_dict: mapping name -> tensor.
        prefix_map: optional {old_prefix: new_prefix} renames, applied first
            (longest match wins).
        skip_prefixes: names starting with any of these are dropped
            (e.g. ('fc.',) for torchvision classification heads).
    """
    prefix_map = dict(prefix_map or {})
    params: dict = {}
    for name, tensor in state_dict.items():
        if any(name.endswith(s) for s in SKIP_SUFFIXES):
            continue
        if any(name.startswith(p) for p in skip_prefixes):
            continue
        for old, new in sorted(prefix_map.items(), key=lambda kv: -len(kv[0])):
            if name.startswith(old):
                name = new + name[len(old):]
                break
        parts = name.split('.')
        # mmcv's ConvModule names its norm child by type ('bn'/'gn'/'ln');
        # arfe_tpu modules use 'bn' uniformly — fold the aliases
        parts = ['bn' if p in ('gn', 'ln') else p for p in parts]
        d = params
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = tensor_to_array(name, tensor)
    return params


def load_torch_checkpoint(path, prefix_map=None, skip_prefixes=()):
    """Load an mmdet/torchvision ``.pth`` and return (params, meta)."""
    import torch
    ckpt = torch.load(path, map_location='cpu', weights_only=False)
    meta = {}
    if isinstance(ckpt, dict) and 'state_dict' in ckpt:
        meta = ckpt.get('meta', {})
        state_dict = ckpt['state_dict']
    else:
        state_dict = ckpt
    state_dict = {k[7:] if k.startswith('module.') else k: v
                  for k, v in state_dict.items()}
    return state_dict_to_params(state_dict, prefix_map, skip_prefixes), meta


def params_to_jax(params):
    import jax.numpy as jnp
    import jax
    return jax.tree_util.tree_map(jnp.asarray, params)


def diff_trees(a, b, path=''):
    """Structural diff of two param trees -> list of mismatch strings.
    Used by the per-layer numerical diff harness (SURVEY.md §7)."""
    msgs = []
    if isinstance(a, dict) != isinstance(b, dict):
        return [f'{path}: type mismatch {type(a).__name__} vs '
                f'{type(b).__name__}']
    if isinstance(a, dict):
        for k in sorted(set(a) | set(b)):
            if k not in a:
                msgs.append(f'{path}.{k}: missing in left')
            elif k not in b:
                msgs.append(f'{path}.{k}: missing in right')
            else:
                msgs += diff_trees(a[k], b[k], f'{path}.{k}')
        return msgs
    if tuple(np.shape(a)) != tuple(np.shape(b)):
        msgs.append(f'{path}: shape {np.shape(a)} vs {np.shape(b)}')
    return msgs
