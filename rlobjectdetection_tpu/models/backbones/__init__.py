from .vgg import VGGBase, VGGHead, vgg_param_trainable
from .resnet import FrozenBatchNorm, ResNetBase, ResNetHead, resnet_param_trainable

__all__ = ["VGGBase", "VGGHead", "vgg_param_trainable", "ResNetBase", "ResNetHead", "FrozenBatchNorm", "resnet_param_trainable"]
