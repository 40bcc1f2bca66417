from .single_stage import (ATSS, FCOS, FOVEA, FSAF, SSD, RetinaNet,
                           SingleStageDetector)

__all__ = ['SingleStageDetector', 'RetinaNet', 'FCOS', 'FSAF', 'ATSS',
           'FOVEA', 'SSD']
