"""CIFAR-adapted AlexNet (reference ``src/approx/models/alexnet.py:8-42``):
5 convs + 4096 -> 1024 -> num_classes head; the scheme-1 workload."""

from __future__ import annotations

import convnet_approximater_tpu.nn as nn

from .switchable import MODEL, SwitchableModel


@MODEL.register_module()
class AlexNet(SwitchableModel):
    def __init__(self, num_classes: int = 10, dropout: float = 0.5, init_cfg=None):
        super().__init__(init_cfg=init_cfg)
        self.features = nn.Sequential(
            nn.Conv2d(3, 64, kernel_size=11, stride=4, padding=2),
            nn.ReLU(),
            nn.MaxPool2d(kernel_size=3, stride=2),
            nn.Conv2d(64, 192, kernel_size=5, padding=2),
            nn.ReLU(),
            nn.MaxPool2d(kernel_size=3, stride=2),
            nn.Conv2d(192, 384, kernel_size=3, padding=1),
            nn.ReLU(),
            nn.Conv2d(384, 256, kernel_size=3, padding=1),
            nn.ReLU(),
            nn.Conv2d(256, 256, kernel_size=3, padding=1),
            nn.ReLU(),
            nn.MaxPool2d(kernel_size=3, stride=2),
        )
        self.avgpool = nn.AdaptiveAvgPool2d((6, 6))
        self.classifier = nn.Sequential(
            nn.Dropout(p=dropout),
            nn.Linear(256 * 6 * 6, 4096),
            nn.ReLU(),
            nn.Dropout(p=dropout),
            nn.Linear(4096, 1024),
            nn.ReLU(),
            nn.Linear(1024, num_classes),
        )

    def __call__(self, params, x, ctx):
        x = self.child("features", params, x, ctx)
        x = self.child("avgpool", params, x, ctx)
        x = x.reshape(x.shape[0], -1)
        return self.child("classifier", params, x, ctx)
