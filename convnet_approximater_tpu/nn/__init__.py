from .module import Ctx, Identity, Module, ModuleList, Sequential
from .layers import (
    AdaptiveAvgPool2d,
    BatchNorm2d,
    Conv2d,
    Dropout,
    Flatten,
    GELU,
    GroupNorm,
    LayerNorm,
    Linear,
    MaxPool2d,
    ReLU,
)
