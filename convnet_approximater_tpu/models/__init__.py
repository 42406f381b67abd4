from .switchable import MODEL, SwitchableModel, build_model
from .alexnet import AlexNet
from .mscan import MSCAN, MSCAN_Classifier
from .vgg import VGG, VGG16
