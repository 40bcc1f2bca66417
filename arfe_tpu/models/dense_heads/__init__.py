from .anchor_head import AnchorHead
from .atss_head import ATSSHead
from .fcos_head import FCOSHead
from .fovea_head import FoveaHead
from .free_anchor_retina_head import FreeAnchorRetinaHead
from .fsaf_head import FSAFHead
from .ga_retina_head import GARetinaHead
from .guided_anchor_head import GARPNHead, GuidedAnchorHead
from .nasfcos_head import NASFCOSHead
from .pisa_retinanet_head import PISARetinaHead, PISASSDHead
from .reppoints_head import RepPointsHead
from .retina_head import RetinaHead
from .retina_sepbn_head import RetinaSepBNHead
from .rpn_head import RPNHead
from .ssd_head import SSDHead

__all__ = ['AnchorHead', 'RetinaHead', 'RPNHead', 'FCOSHead', 'SSDHead',
           'FSAFHead', 'ATSSHead', 'FoveaHead', 'FreeAnchorRetinaHead',
           'RetinaSepBNHead', 'NASFCOSHead', 'RepPointsHead',
           'GuidedAnchorHead', 'GARPNHead', 'GARetinaHead',
           'PISARetinaHead', 'PISASSDHead']
