from .anchor_head import AnchorHead
from .atss_head import ATSSHead
from .fcos_head import FCOSHead
from .fsaf_head import FSAFHead
from .retina_head import RetinaHead
from .rpn_head import RPNHead
from .ssd_head import SSDHead

__all__ = ['AnchorHead', 'RetinaHead', 'RPNHead', 'FCOSHead', 'SSDHead',
           'FSAFHead', 'ATSSHead']
