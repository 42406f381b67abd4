from .switchable import MODEL, SwitchableModel, build_model
from .alexnet import AlexNet
from .mscan import MSCAN, MSCAN_Classifier
from .vgg import VGG, VGG16

# register the segmentation family in the MODEL registry (imported last to
# avoid a cycle: segnext.py pulls from models.mscan / models.switchable)
from convnet_approximater_tpu.segmentation import SegNeXt  # noqa: E402,F401
