"""Pretrained-backbone initialization.

TPU-native counterpart of ref: mmdet ``pretrained='torchvision://resnet50'``
(configs/_base_/models/*.py; ResNet.init_weights,
mmdet/models/backbones/resnet.py:634-658, which downloads from the torch
hub). This environment has zero egress, so ``torchvision://<name>`` resolves
to a LOCAL file ``$ARFE_PRETRAINED_DIR/<name>.pth`` (default
``~/.cache/arfe_tpu/pretrained/<name>.pth``) — place a torch state_dict
there (e.g. copied from a machine with network access) and the mechanical
converter (convert/torch2jax.py) maps it onto the backbone param tree.
A plain local path (``.pth`` torch state_dict or ``.pkl`` converted
pytree) is also accepted.
"""
from __future__ import annotations

import os

DEFAULT_DIR = os.path.expanduser('~/.cache/arfe_tpu/pretrained')


def _resolve(spec):
    if spec.startswith('torchvision://'):
        name = spec[len('torchvision://'):]
        root = os.environ.get('ARFE_PRETRAINED_DIR', DEFAULT_DIR)
        path = os.path.join(root, name + '.pth')
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"pretrained='{spec}' resolves to {path}, which does not "
                'exist. This environment cannot download weights; place '
                f'the torchvision {name} state_dict there (or set '
                'ARFE_PRETRAINED_DIR), or drop the pretrained= key to '
                'train from scratch.')
        return path
    if spec.startswith(('open_mmlab://', 'http://', 'https://')):
        raise ValueError(
            f"pretrained='{spec}' is not loadable here (no network / no "
            'mmcv model zoo). Convert the checkpoint to a local file and '
            'point pretrained= at it.')
    if not os.path.exists(spec):
        raise FileNotFoundError(f"pretrained file '{spec}' not found")
    return spec


def _merge(dst, src, prefix, missing, loaded):
    for k, v in src.items():
        path = f'{prefix}.{k}' if prefix else k
        if isinstance(v, dict):
            if isinstance(dst.get(k), dict):
                _merge(dst[k], v, path, missing, loaded)
            else:
                missing.append(path)
        elif k in dst:
            import numpy as np
            if tuple(np.shape(dst[k])) != tuple(np.shape(v)):
                missing.append(f'{path} (shape {np.shape(v)} vs '
                               f'{np.shape(dst[k])})')
            else:
                dst[k] = v
                loaded.append(path)
        else:
            missing.append(path)


def load_pretrained_backbone(spec, params, log=print):
    """Initialize ``params['backbone']`` from a pretrained checkpoint.

    Args:
        spec: 'torchvision://<name>', or a local .pth/.pkl path.
        params: full model param pytree (host numpy or jax arrays).
    Returns:
        params with matching backbone leaves replaced (in place on the
        nested dicts, also returned for convenience).
    """
    path = _resolve(spec)
    if path.endswith('.pkl'):
        import pickle
        with open(path, 'rb') as f:
            tree = pickle.load(f)
        if isinstance(tree, dict) and 'params' in tree:
            tree = tree['params']
        conv = tree.get('backbone', tree)
    else:
        from ..convert.torch2jax import state_dict_to_params
        import torch
        sd = torch.load(path, map_location='cpu', weights_only=False)
        if isinstance(sd, dict) and 'state_dict' in sd:
            sd = sd['state_dict']
        # torchvision classification heads don't exist in the detector
        conv = state_dict_to_params(sd, skip_prefixes=('fc.',))
        conv = conv.get('backbone', conv)

    import jax.numpy as jnp
    missing, loaded = [], []
    if 'backbone' not in params:
        raise KeyError('param tree has no backbone subtree')
    _merge(params['backbone'], {k: v for k, v in conv.items()},
           '', missing, loaded)
    # re-device any numpy leaves we just wrote
    import jax
    params['backbone'] = jax.tree_util.tree_map(jnp.asarray,
                                                params['backbone'])
    log(f'pretrained backbone: loaded {len(loaded)} tensors from {path}'
        + (f'; {len(missing)} unmatched ({missing[:5]}...)' if missing
           else ''))
    if not loaded:
        raise ValueError(
            f'pretrained checkpoint {path} matched no backbone params — '
            'wrong architecture or naming?')
    return params
