from rscotr_tpu.models.backbones.resnet import ResNet
from rscotr_tpu.models.backbones.swin import SwinTransformer

__all__ = ["SwinTransformer", "ResNet"]
