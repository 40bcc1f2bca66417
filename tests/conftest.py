"""Test env: force an 8-device virtual CPU mesh so pjit/psum logic is
exercised without TPUs (SURVEY.md §4).

Note: this machine's sitecustomize force-registers the `axon` TPU platform
and overrides the JAX_PLATFORMS env var, so platform selection must go
through jax.config AFTER import (env-var setdefault is not enough).
"""
import os

flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

# the suite is compile-dominated (~63 min cold); persist XLA executables
# across runs (ARFE_TPU_COMPILE_CACHE=0 disables)
from arfe_tpu.utils.compile_cache import enable as _enable_cache  # noqa: E402

_enable_cache()
