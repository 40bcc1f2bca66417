from .rfp import RecursiveFeaturePyramid
from .single_stage import (ATSS, FCOS, FOVEA, FSAF, SSD, NASFCOS,
                           RepPointsDetector, RetinaNet,
                           SingleStageDetector)
from .two_stage import RPN, FasterRCNN, FastRCNN, MaskRCNN, TwoStageDetector

__all__ = ['SingleStageDetector', 'RetinaNet', 'FCOS', 'FSAF', 'ATSS',
           'NASFCOS', 'RepPointsDetector', 'RecursiveFeaturePyramid',
           'FOVEA', 'SSD', 'TwoStageDetector', 'FasterRCNN', 'MaskRCNN',
           'FastRCNN', 'RPN']
