"""arfe_tpu — TPU-native (JAX/XLA/Pallas) object-detection framework with the
capabilities of the ARFE reference (an mmdetection-2.0 fork)."""
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
