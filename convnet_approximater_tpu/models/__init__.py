from .switchable import MODEL, SwitchableModel, build_model
from .alexnet import AlexNet
from .mscan import MSCAN, MSCAN_Classifier
from .vgg import VGG, VGG16
from .resnet import ResNet, ResNet18, ResNet50
from .convnext import ConvNeXt, ConvNeXtTiny

# register the segmentation family in the MODEL registry (imported last to
# avoid a cycle: segnext.py pulls from models.mscan / models.switchable).
# When the segmentation package itself is mid-import (user imported it
# first), skip — its own module execution registers SegNeXt anyway.
try:
    from convnet_approximater_tpu.segmentation import SegNeXt  # noqa: E402,F401
except ImportError:  # circular bootstrap only
    pass
