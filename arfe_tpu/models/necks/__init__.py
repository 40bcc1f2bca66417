from .fpn import FPN
from .pafpn import HRFPN, PAFPN
from .wfpn import (BFP, WFPN, WFPNAVG, WFPNChannel, WFPNChannelADD,
                   WFPNDeform, WFPNDualSpatial, WFPNPool, WFPNPreTreat)

__all__ = ['FPN', 'PAFPN', 'HRFPN', 'WFPNDualSpatial', 'WFPN', 'WFPNChannel',
           'WFPNChannelADD', 'WFPNAVG', 'WFPNPool', 'WFPNPreTreat',
           'WFPNDeform', 'BFP']
