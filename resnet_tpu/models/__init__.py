from resnet_tpu.models.resnet import ResNet, ResidualUnit, IMAGENET_UNITS
from resnet_tpu.models.registry import get_model, model_spec

__all__ = ["ResNet", "ResidualUnit", "IMAGENET_UNITS", "get_model",
           "model_spec"]
