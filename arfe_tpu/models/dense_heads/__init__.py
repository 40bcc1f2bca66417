from .anchor_head import AnchorHead
from .fcos_head import FCOSHead
from .retina_head import RetinaHead
from .rpn_head import RPNHead

__all__ = ['AnchorHead', 'RetinaHead', 'RPNHead', 'FCOSHead']
