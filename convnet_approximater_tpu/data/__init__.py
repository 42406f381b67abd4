from .datasets import (
    ArrayDataset,
    CIFAR10,
    CIFAR10_MEAN,
    CIFAR10_STD,
    DATASET,
    IMAGENET_DEFAULT_MEAN,
    IMAGENET_DEFAULT_STD,
    ImageFolder,
    Npz,
    Synthetic,
    build_dataset,
)
from .loader import Loader
from .mixup import cutmix_batch, mixup_batch, mixup_cutmix
from .randaug import RAND_AUG_OPS, rand_augment_batch
