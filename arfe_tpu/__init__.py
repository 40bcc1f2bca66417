"""arfe_tpu — TPU-native (JAX/XLA/Pallas) object-detection framework with the
capabilities of the ARFE reference (an mmdetection-2.0 fork)."""
import os as _os

if _os.environ.get('ARFE_TPU_FORCE_CPU') == '1':
    # Escape hatch for environments whose sitecustomize force-selects a
    # TPU platform and ignores JAX_PLATFORMS (e.g. CI drives of the CLI
    # tools on CPU): the jax config knob still works post-import.
    import jax as _jax
    _jax.config.update('jax_platforms', 'cpu')

from .version import __version__
from .config import Config, ConfigDict
from .registry import (ANCHOR_GENERATORS, BACKBONES, BBOX_ASSIGNERS,
                       BBOX_CODERS, BBOX_SAMPLERS, DATASETS, DETECTORS, HEADS,
                       LOSSES, NECKS, PIPELINES, ROI_EXTRACTORS, Registry,
                       build_from_cfg)

__all__ = [
    '__version__', 'Config', 'ConfigDict', 'Registry', 'build_from_cfg',
    'BACKBONES', 'NECKS', 'ROI_EXTRACTORS', 'HEADS', 'LOSSES', 'DETECTORS',
    'BBOX_CODERS', 'BBOX_ASSIGNERS', 'BBOX_SAMPLERS', 'ANCHOR_GENERATORS',
    'DATASETS', 'PIPELINES',
]
