from .single_stage import (ATSS, FCOS, FOVEA, FSAF, SSD, RetinaNet,
                           SingleStageDetector)
from .two_stage import RPN, FasterRCNN, FastRCNN, MaskRCNN, TwoStageDetector

__all__ = ['SingleStageDetector', 'RetinaNet', 'FCOS', 'FSAF', 'ATSS',
           'FOVEA', 'SSD', 'TwoStageDetector', 'FasterRCNN', 'MaskRCNN',
           'FastRCNN', 'RPN']
