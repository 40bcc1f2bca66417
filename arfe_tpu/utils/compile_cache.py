"""Opt-out persistent XLA compilation cache.

Detector-sized graphs take 1.5-4 min to compile through the remote-compile
tunnel; the remote service caches per worker, but a worker restart loses
everything. Caching serialized executables locally makes tools/bench runs
robust to that (same graph -> load from disk, no recompile), and speeds the
compile-dominated CPU test suite the same way.

Call :func:`enable` early (before the first jit). Disabled by setting
``ARFE_TPU_COMPILE_CACHE=0``; the directory defaults to
``~/.cache/arfe_tpu_xla`` and can be overridden with
``ARFE_TPU_COMPILE_CACHE_DIR``.
"""
from __future__ import annotations

import os


def enable():
    if os.environ.get('ARFE_TPU_COMPILE_CACHE', '1') == '0':
        return False
    import jax
    path = os.environ.get(
        'ARFE_TPU_COMPILE_CACHE_DIR',
        os.path.join(os.path.expanduser('~'), '.cache', 'arfe_tpu_xla'))
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update('jax_compilation_cache_dir', path)
        # cache every entry: even sub-second compiles add up through the
        # tunnel, and entry size is irrelevant next to recompile latency
        jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
        return True
    except Exception:
        # an unwritable cache dir or an old jax must never break the run
        return False
