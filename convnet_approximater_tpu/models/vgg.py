"""VGG model family.

Not present in the reference, but BASELINE.json names "decompose and
fine-tune a VGG-16-class backbone" as the target workload class, so the
framework ships the standard VGG A/B/D/E configurations (11/13/16/19
layers) as switchable models — every 3x3 conv is a scheme-1/scheme-2
substitution candidate.
"""

from __future__ import annotations

import convnet_approximater_tpu.nn as nn

from .switchable import MODEL, SwitchableModel

_CFGS = {
    "A": [64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"],
    "B": [64, 64, "M", 128, 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"],
    "D": [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M", 512, 512, 512, "M"],
    "E": [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M", 512, 512, 512, 512, "M",
          512, 512, 512, 512, "M"],
}


@MODEL.register_module()
class VGG(SwitchableModel):
    def __init__(
        self,
        depth: int = 16,
        num_classes: int = 10,
        dropout: float = 0.5,
        batch_norm: bool = False,
        init_cfg=None,
    ):
        super().__init__(init_cfg=init_cfg)
        cfg_key = {11: "A", 13: "B", 16: "D", 19: "E"}[depth]
        layers = []
        in_c = 3
        for v in _CFGS[cfg_key]:
            if v == "M":
                layers.append(nn.MaxPool2d(kernel_size=2, stride=2))
            else:
                layers.append(nn.Conv2d(in_c, v, kernel_size=3, padding=1))
                if batch_norm:
                    layers.append(nn.BatchNorm2d(v))
                layers.append(nn.ReLU())
                in_c = v
        self.features = nn.Sequential(*layers)
        self.avgpool = nn.AdaptiveAvgPool2d((7, 7))
        self.classifier = nn.Sequential(
            nn.Linear(512 * 7 * 7, 4096),
            nn.ReLU(),
            nn.Dropout(p=dropout),
            nn.Linear(4096, 4096),
            nn.ReLU(),
            nn.Dropout(p=dropout),
            nn.Linear(4096, num_classes),
        )

    def __call__(self, params, x, ctx):
        x = self.child("features", params, x, ctx)
        x = self.child("avgpool", params, x, ctx)
        x = x.reshape(x.shape[0], -1)
        return self.child("classifier", params, x, ctx)


@MODEL.register_module()
class VGG16(VGG):
    def __init__(self, num_classes: int = 10, dropout: float = 0.5,
                 batch_norm: bool = False, init_cfg=None):
        super().__init__(16, num_classes, dropout, batch_norm, init_cfg)
