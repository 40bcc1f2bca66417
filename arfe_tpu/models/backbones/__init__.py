from .resnet import ResNet, ResNetV1d
from .resnext import ResNeXt
from .ssd_vgg import SSDVGG

__all__ = ['ResNet', 'ResNetV1d', 'ResNeXt', 'SSDVGG']
