"""Compatibility shim — layers moved to arfe_tpu.layers (ops depend on them
and must not import the models package)."""
from ..layers import *  # noqa: F401,F403
from ..layers import (Module, Conv2d, Linear, BatchNorm, GroupNorm,
                      ConvModule, build_norm, max_pool2d, avg_pool2d,
                      adaptive_max_pool2d, global_avg_pool, resize_nearest,
                      resize_bilinear, upsample2x_nearest,
                      stop_gradient_tree)  # noqa: F401
