"""Async helpers for the non-blocking inference API.

TPU-native counterpart of ref: mmdet/utils/contextmanagers.py:15-80
(``completed``/``concurrent`` used by async_inference_detector). The
reference synchronizes CUDA streams; on TPU jax dispatch is already
async, so these context managers only provide the structured-concurrency
surface: ``completed`` awaits device results inside an async context and
``concurrent`` bounds parallel inference tasks with a semaphore.
"""
from __future__ import annotations

import asyncio
import contextlib
import time


@contextlib.asynccontextmanager
async def completed(trace_name='', name='', streams=None):
    """Await-friendly region; yields, then lets other tasks run before
    results are consumed (jax arrays block lazily on materialization)."""
    try:
        yield
    finally:
        await asyncio.sleep(0)


@contextlib.asynccontextmanager
async def concurrent(semaphore, streams=None):
    """Bound concurrent inference regions with an ``asyncio.Semaphore``
    (the reference multiplexes CUDA streams; TPU programs serialize on
    device, so the semaphore only bounds host-side task fan-out)."""
    async with semaphore:
        yield


class profile_time_async:
    """Async-region wall-clock probe (host side)."""

    def __init__(self, name, logger=None):
        self.name = name
        self.logger = logger

    async def __aenter__(self):
        self.t0 = time.time()
        return self

    async def __aexit__(self, *exc):
        dt = time.time() - self.t0
        msg = f'{self.name}: {dt * 1000:.2f} ms'
        if self.logger is not None:
            self.logger.info(msg)
        return False
