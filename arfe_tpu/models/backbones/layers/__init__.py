from .attention import (CbamModule, EcaModule, LightCbamModule, SEModule,
                        SelectiveKernelAttn)
from .extras import (AvgPool2dSame, BlurPool2d, CondConv2d, Conv2dSame,
                     ConvBnAct, DropPath, MedianPool2d, MixedConv2d,
                     SelectAdaptivePool2d, SpaceToDepthModule, SplitAttn,
                     SplitBatchNorm2d, adaptive_avgmax_pool2d,
                     adaptive_catavgmax_pool2d, drop_block_2d, drop_path,
                     hard_mish, hard_sigmoid, hard_swish, mish, pad_same,
                     swish)

__all__ = ['CbamModule', 'LightCbamModule', 'SEModule', 'EcaModule',
           'SelectiveKernelAttn', 'BlurPool2d', 'CondConv2d', 'Conv2dSame',
           'AvgPool2dSame', 'ConvBnAct', 'DropPath', 'MedianPool2d',
           'MixedConv2d', 'SelectAdaptivePool2d', 'SpaceToDepthModule',
           'SplitAttn', 'SplitBatchNorm2d', 'adaptive_avgmax_pool2d',
           'adaptive_catavgmax_pool2d', 'drop_block_2d', 'drop_path',
           'swish', 'mish', 'hard_sigmoid', 'hard_swish', 'hard_mish',
           'pad_same']
