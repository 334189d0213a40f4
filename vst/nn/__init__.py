"""vst.nn — flax.linen building blocks (NHWC, torch-parity semantics)."""

from vst.nn.conv import ConvLayer, UpsampleConvLayer, ConvTanh, TorchConv
from vst.nn.norm import InstanceNorm, ConditionalInstanceNorm, AdaIN

__all__ = [
    "ConvLayer",
    "UpsampleConvLayer",
    "ConvTanh",
    "TorchConv",
    "InstanceNorm",
    "ConditionalInstanceNorm",
    "AdaIN",
]
