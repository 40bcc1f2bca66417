from .attention import (CbamModule, EcaModule, LightCbamModule, SEModule,
                        SelectiveKernelAttn)

__all__ = ['CbamModule', 'LightCbamModule', 'SEModule', 'EcaModule',
           'SelectiveKernelAttn']
