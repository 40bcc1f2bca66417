"""Environment report (ref: mmdet/utils/collect_env.py:14 and the
compiling_info native op — here reporting jax/libtpu instead of CUDA)."""
from __future__ import annotations

import sys


def collect_env():
    import jax
    import numpy as np

    env = {
        'sys.platform': sys.platform,
        'Python': sys.version.replace('\n', ''),
        'JAX': jax.__version__,
        'numpy': np.__version__,
        'devices': str(jax.devices()),
        'default_backend': jax.default_backend(),
    }
    try:
        import jaxlib
        env['jaxlib'] = jaxlib.__version__
    except Exception:
        pass
    from ..version import __version__
    env['arfe_tpu'] = __version__
    return env
