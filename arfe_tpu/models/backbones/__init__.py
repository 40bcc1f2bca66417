from .hrnet import HRNet
from .regnet import RegNet
from .res2net import Res2Net
from .resnet import ResNet, ResNetV1d
from .resnext import ResNeXt
from .ssd_vgg import SSDVGG

__all__ = ['ResNet', 'ResNetV1d', 'ResNeXt', 'SSDVGG', 'Res2Net', 'RegNet',
           'HRNet']
