"""SegNeXt segmentation (TPU-native extension — the reference's
``src/approx/segmentation/`` is an empty placeholder and its
``models/segnext.py`` is fully commented out; this completes the family the
msca-rep experiments were aimed at).  ``SegNeXt`` is a ``SwitchableModel``
over the same MSCAN backbone, so the full register -> MscaRep ->
deploy pipeline applies to segmentation unchanged."""

from .ham_head import Hamburger, LightHamHead, nmf2d, resize_bilinear, upsample_logits
from .segnext import SegNeXt
from .losses import seg_cross_entropy
from .metrics import confusion_matrix, iou_from_confusion
from .data import SyntheticSeg
from .finetune import SegL2Reconstruct

__all__ = ["SegNeXt", "LightHamHead", "Hamburger", "nmf2d",
           "resize_bilinear", "upsample_logits", "seg_cross_entropy",
           "confusion_matrix", "iou_from_confusion", "SyntheticSeg",
           "SegL2Reconstruct"]
