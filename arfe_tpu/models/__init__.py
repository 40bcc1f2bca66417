from .builder import (build_backbone, build_detector, build_head, build_neck,
                      build_roi_extractor)
from .backbones import *  # noqa: F401,F403
from .losses import *  # noqa: F401,F403
from .necks import *  # noqa: F401,F403
from .dense_heads import *  # noqa: F401,F403
from .roi_heads import *  # noqa: F401,F403
from .detectors import *  # noqa: F401,F403

__all__ = ['build_backbone', 'build_neck', 'build_head',
           'build_roi_extractor', 'build_detector']
