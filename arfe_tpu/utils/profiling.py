"""Profiling helpers.

TPU-native counterpart of ref: mmdet/utils/profiling.py:10-40 (CUDA-event
profile_time) — here wall-clock with block_until_ready, plus jax.profiler
trace capture for Perfetto/XProf (SURVEY.md §5.1).
"""
from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def profile_time(trace_name, name, enabled=True, stream=None,
                 end_stream=None):
    """Print wall-clock of a block, synchronizing outstanding device work."""
    if not enabled:
        yield
        return
    import jax
    try:
        (jax.device_put(0.0) + 0).block_until_ready()
    except Exception:
        pass
    t0 = time.time()
    try:
        with jax.named_scope(f'{trace_name}_{name}'):
            yield
    finally:
        try:
            (jax.device_put(0.0) + 0).block_until_ready()
        except Exception:
            pass
        print(f'{trace_name} {name} elapsed_ms: {(time.time()-t0)*1e3:.2f}')


@contextlib.contextmanager
def trace(log_dir='/tmp/jax-trace'):
    """Capture a profiler trace viewable in Perfetto/XProf."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
        print(f'trace written to {log_dir}')
