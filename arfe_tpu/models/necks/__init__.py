from .experimental_fpns import (ATTFF, ATTFF2, ATTSEP, MULTISEC, CbamModule,
                                DeformFPN, FPNBAM, FPNBU, FPNCBAM, FPNCROSS,
                                FPNDAM, FPNDENOISE, FPNDENOISEBU,
                                FPNDualSpatial, FPNFEATSEL, FPNIPT,
                                FPNIPTWHOLE, FPNMULTI, FPNMultiRF, FPNNEWTD,
                                FPNRECOMB, FPNRF, FPNRelation)
from .fpn import FPN
from .fpn_carafe import FPN_CARAFE
from .nas_fpn import NASFPN
from .nasfcos_fpn import NASFCOS_FPN
from .pafpn import HRFPN, PAFPN
from .wfpn import (BFP, WFPN, WFPNAVG, WFPNChannel, WFPNChannelADD,
                   WFPNDeform, WFPNDilated, WFPNDualSpatial,
                   WFPNLargeKerne, WFPNPool, WFPNPreTreat)

__all__ = ['FPN', 'PAFPN', 'HRFPN', 'WFPNDualSpatial', 'WFPN', 'WFPNChannel',
           'WFPNChannelADD', 'WFPNAVG', 'WFPNPool', 'WFPNPreTreat',
           'WFPNDeform', 'WFPNDilated', 'WFPNLargeKerne', 'BFP',
           'NASFPN', 'FPN_CARAFE', 'NASFCOS_FPN',
           'ATTFF', 'ATTFF2', 'ATTSEP', 'MULTISEC', 'DeformFPN', 'FPNBAM',
           'FPNBU', 'FPNCBAM', 'FPNCROSS', 'FPNDAM', 'FPNDENOISE',
           'FPNDENOISEBU', 'FPNDualSpatial', 'FPNFEATSEL', 'FPNIPT',
           'FPNIPTWHOLE', 'FPNMULTI', 'FPNMultiRF', 'FPNNEWTD', 'FPNRECOMB',
           'FPNRF', 'FPNRelation', 'CbamModule']
