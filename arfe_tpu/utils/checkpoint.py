"""Checkpoint save/load.

TPU-native counterpart of the reference's mmcv checkpoint layer (ref:
tools/train.py:141-147 meta embedding, apis/train.py:175-178 resume/load,
tools/publish_model.py). Native format: a pickle of numpy-ified param /
optimizer trees + meta (version, config text, CLASSES). PyTorch ``.pth``
checkpoints load transparently through the converter
(convert/torch2jax.py).
"""
from __future__ import annotations

import hashlib
import os
import pickle

import numpy as np

from ..version import __version__


def _to_numpy_tree(tree):
    import jax
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


_ASYNC_CKPTR = None


def _orbax_checkpointer(async_save):
    """Lazy orbax checkpointer; the async one is shared so in-flight
    saves are awaited before the next save starts (orbax semantics)."""
    global _ASYNC_CKPTR
    import orbax.checkpoint as ocp
    if not async_save:
        return ocp.PyTreeCheckpointer()
    if _ASYNC_CKPTR is None:
        _ASYNC_CKPTR = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
    return _ASYNC_CKPTR


def wait_for_checkpoints():
    """Block until any in-flight async orbax save has committed."""
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()


def save_checkpoint(filename, params, optimizer_state=None, meta=None,
                    backend='pickle', async_save=False):
    """Save a checkpoint.

    backend='pickle' writes the native single-file format; 'orbax' writes
    an orbax directory (the idiomatic TPU format — SURVEY.md §5.3/§5.4:
    frequent async checkpointing + restart-from-latest), with
    ``async_save=True`` committing in a background thread so the train
    loop never blocks on IO. Call :func:`wait_for_checkpoints` (the train
    loop does) before exiting.
    """
    meta = dict(meta or {})
    meta.setdefault('arfe_tpu_version', __version__)
    if backend == 'orbax':
        path = os.path.abspath(filename)
        ckpt = {'state_dict': _to_numpy_tree(params), 'meta': meta}
        if optimizer_state is not None:
            ckpt['optimizer'] = _to_numpy_tree(optimizer_state)
        ckptr = _orbax_checkpointer(async_save)
        if async_save:
            ckptr.wait_until_finished()
        import shutil
        if os.path.isdir(path):
            shutil.rmtree(path)
        ckptr.save(path, ckpt)
        return path
    ckpt = {'meta': meta, 'state_dict': _to_numpy_tree(params)}
    if optimizer_state is not None:
        ckpt['optimizer'] = _to_numpy_tree(optimizer_state)
    dirname = os.path.dirname(os.path.abspath(filename))
    os.makedirs(dirname, exist_ok=True)
    with open(filename, 'wb') as f:
        pickle.dump(ckpt, f, protocol=4)
    return filename


def load_checkpoint(filename, to_jax=True):
    """Returns (params, meta, optimizer_state_or_None). ``.pth`` files go
    through the torch converter; orbax directories restore via orbax."""
    if filename.endswith('.pth'):
        from ..convert import load_torch_checkpoint
        params, meta = load_torch_checkpoint(filename)
        return params, meta, None
    if os.path.isdir(filename):
        import orbax.checkpoint as ocp
        wait_for_checkpoints()
        ckpt = ocp.PyTreeCheckpointer().restore(os.path.abspath(filename))
    else:
        with open(filename, 'rb') as f:
            ckpt = pickle.load(f)
    params = ckpt['state_dict']
    if to_jax:
        import jax.numpy as jnp
        import jax
        params = jax.tree_util.tree_map(jnp.asarray, params)
    return params, ckpt.get('meta', {}), ckpt.get('optimizer')


def publish_model(in_file, out_file):
    """Strip optimizer state and append a content hash to the filename
    (ref: tools/publish_model.py)."""
    with open(in_file, 'rb') as f:
        ckpt = pickle.load(f)
    ckpt.pop('optimizer', None)
    tmp = out_file
    with open(tmp, 'wb') as f:
        pickle.dump(ckpt, f, protocol=4)
    with open(tmp, 'rb') as f:
        sha = hashlib.sha256(f.read()).hexdigest()[:8]
    root, ext = os.path.splitext(out_file)
    final = f'{root}-{sha}{ext or ".pkl"}'
    os.rename(tmp, final)
    return final
