"""SegNeXt segmentation model: MSCAN backbone + Light-Ham decode head.

Completes what the reference only sketched: its ``models/segnext.py`` is
fully commented out and ``src/approx/segmentation/`` is empty (the msca-rep
paper experiments targeted SegNeXt, but the public repo never landed the
model).  The backbone is the same switchable ``MSCAN`` the classifier uses
— ``register_switchable(MSCA, ...)`` and the whole MscaRep pipeline work on
this model unchanged, so re-parameterized segmentation serving falls out of
the existing machinery.
"""

from __future__ import annotations

import jax.numpy as jnp

from convnet_approximater_tpu.models.mscan import MSCAN
from convnet_approximater_tpu.models.switchable import MODEL, SwitchableModel
from convnet_approximater_tpu.nn import Ctx

from .ham_head import LightHamHead, upsample_logits


@MODEL.register_module()
class SegNeXt(SwitchableModel):
    """SegNeXt-T/S by ``num_channels``/``num_blocks`` (mscan-t defaults).

    ``__call__`` returns logits at 1/8 input resolution (the mmseg
    resize-in-loss convention); ``full_res=True`` upsamples to the input
    size on the way out.
    """

    def __init__(
        self,
        in_channels: int = 3,
        num_channels=(32, 64, 160, 256),
        num_blocks=(3, 3, 5, 2),
        exp_ratios=(8, 8, 4, 4),
        drop_rate: float = 0.0,
        drop_path_rate: float = 0.0,
        num_classes: int = 150,
        ham_channels: int = 256,
        ham_rank: int = 64,
        ham_iters: int = 6,
        in_indices=(1, 2, 3),
        init_cfg=None,
        scan_blocks: str = "auto",
        remat: bool = False,
        full_res: bool = False,
    ):
        super().__init__(init_cfg=init_cfg)
        self.num_classes = num_classes
        self.in_indices = tuple(in_indices)
        self.full_res = full_res
        self.backbone = MSCAN(
            in_channels=in_channels,
            num_channels=num_channels,
            num_blocks=num_blocks,
            exp_ratios=exp_ratios,
            drop_rate=drop_rate,
            drop_path_rate=drop_path_rate,
            scan_blocks=scan_blocks,
            remat=remat,
        )
        self.decode_head = LightHamHead(
            in_channels=[num_channels[i] for i in self.in_indices],
            num_classes=num_classes,
            ham_channels=ham_channels,
            rank=ham_rank,
            iters=ham_iters,
        )

    def trunk_groups(self):
        """``deploy.prune_trunks`` groups: the backbone's, with the Ham
        head's squeeze conv consuming each tapped stage as one SEGMENT of
        its channel-concatenated input (offset = summed final widths of
        the earlier tapped stages' LayerNorms — groups slice in stage
        order, so those are final when this group is processed)."""
        groups = self.backbone.trunk_groups(prefix="backbone.")
        names = [n for n, _ in self.backbone.layers.named_children()]
        for pos, i in enumerate(self.in_indices):
            groups[i]["consumers"].append(dict(
                path="decode_head.squeeze",
                offset_modules=[f"backbone.layers.{names[j]}.2"
                                for j in self.in_indices[:pos]]))
        return groups

    def __call__(self, params, x, ctx: Ctx):
        feats = self.child("backbone", params, x, ctx)
        logits = self.child("decode_head", params,
                            [feats[i] for i in self.in_indices], ctx)
        if self.full_res:
            logits = upsample_logits(logits, x.shape[1:3])
        return logits
