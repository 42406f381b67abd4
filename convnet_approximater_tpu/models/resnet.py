"""ResNet model family (18/34/50/101/152).

Not present in the reference (its model zoo is AlexNet + MSCAN,
``src/approx/models/__init__.py:1-5``), but residual ConvNets are the
canonical scheme-1/scheme-2 substitution target beyond plain feed-forward
stacks: every 3x3 conv inside a ``BasicBlock``/``Bottleneck`` is a
switchable candidate, and the skip connections exercise the substitution
machinery on a non-sequential graph.

Module naming deliberately mirrors torchvision (``conv1``, ``bn1``,
``layer{1..4}.{i}.conv{j}``, ``downsample.0/1``, ``fc``) so torchvision
ResNet checkpoints convert with the generic torch->TPU converter
(``scripts/ckpt_converter/torch_to_tpu.py``) with no rename table.

TPU notes: the whole network is dense convs + BN + ReLU — every FLOP lands
on the MXU, BN folds into the convs on the deploy surface
(``deploy.fold_batchnorm``), and the residual adds fuse into the preceding
conv's epilogue under XLA.
"""

from __future__ import annotations

import convnet_approximater_tpu.nn as nn
from convnet_approximater_tpu.nn.module import Module

from .switchable import MODEL, SwitchableModel


class BasicBlock(Module):
    """Two 3x3 convs + identity (torchvision ``BasicBlock`` topology)."""

    expansion = 1

    def __init__(self, in_c: int, planes: int, stride: int = 1):
        super().__init__()
        self.conv1 = nn.Conv2d(in_c, planes, 3, stride=stride, padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.relu = nn.ReLU()
        self.conv2 = nn.Conv2d(planes, planes, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        if stride != 1 or in_c != planes * self.expansion:
            self.downsample = nn.Sequential(
                nn.Conv2d(in_c, planes * self.expansion, 1, stride=stride, bias=False),
                nn.BatchNorm2d(planes * self.expansion),
            )
        else:
            self.downsample = None

    def __call__(self, params, x, ctx):
        identity = x
        y = self.child("conv1", params, x, ctx)
        y = self.child("bn1", params, y, ctx)
        y = self.child("relu", params, y, ctx)
        y = self.child("conv2", params, y, ctx)
        y = self.child("bn2", params, y, ctx)
        if self.downsample is not None:
            identity = self.child("downsample", params, x, ctx)
        return self.child("relu", params, y + identity, ctx)


class Bottleneck(Module):
    """1x1 reduce -> 3x3 -> 1x1 expand (torchvision ``Bottleneck``: stride
    on the 3x3, i.e. ResNet v1.5)."""

    expansion = 4

    def __init__(self, in_c: int, planes: int, stride: int = 1):
        super().__init__()
        self.conv1 = nn.Conv2d(in_c, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * self.expansion, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * self.expansion)
        self.relu = nn.ReLU()
        if stride != 1 or in_c != planes * self.expansion:
            self.downsample = nn.Sequential(
                nn.Conv2d(in_c, planes * self.expansion, 1, stride=stride, bias=False),
                nn.BatchNorm2d(planes * self.expansion),
            )
        else:
            self.downsample = None

    def __call__(self, params, x, ctx):
        identity = x
        y = self.child("conv1", params, x, ctx)
        y = self.child("bn1", params, y, ctx)
        y = self.child("relu", params, y, ctx)
        y = self.child("conv2", params, y, ctx)
        y = self.child("bn2", params, y, ctx)
        y = self.child("relu", params, y, ctx)
        y = self.child("conv3", params, y, ctx)
        y = self.child("bn3", params, y, ctx)
        if self.downsample is not None:
            identity = self.child("downsample", params, x, ctx)
        return self.child("relu", params, y + identity, ctx)


_DEPTHS = {
    18: (BasicBlock, (2, 2, 2, 2)),
    34: (BasicBlock, (3, 4, 6, 3)),
    50: (Bottleneck, (3, 4, 6, 3)),
    101: (Bottleneck, (3, 4, 23, 3)),
    152: (Bottleneck, (3, 8, 36, 3)),
}


@MODEL.register_module()
class ResNet(SwitchableModel):
    def __init__(self, depth: int = 18, num_classes: int = 1000, init_cfg=None):
        super().__init__(init_cfg=init_cfg)
        block, counts = _DEPTHS[depth]
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU()
        self.maxpool = nn.MaxPool2d(kernel_size=3, stride=2, padding=1)
        in_c = 64
        for i, (planes, n) in enumerate(zip((64, 128, 256, 512), counts)):
            blocks = []
            for j in range(n):
                stride = 2 if (i > 0 and j == 0) else 1
                blocks.append(block(in_c, planes, stride=stride))
                in_c = planes * block.expansion
            self.add_module(f"layer{i + 1}", nn.Sequential(*blocks))
        self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
        self.fc = nn.Linear(512 * block.expansion, num_classes)

    def __call__(self, params, x, ctx):
        x = self.child("conv1", params, x, ctx)
        x = self.child("bn1", params, x, ctx)
        x = self.child("relu", params, x, ctx)
        x = self.child("maxpool", params, x, ctx)
        for name in ("layer1", "layer2", "layer3", "layer4"):
            x = self.child(name, params, x, ctx)
        x = self.child("avgpool", params, x, ctx)
        x = x.reshape(x.shape[0], -1)
        return self.child("fc", params, x, ctx)

    def pipeline_units(self, variables):
        """Whole-model decomposition for ``parallel/pp_model.py``: the
        conv1+bn1+relu+maxpool stem, every residual block (substituted or
        not), and one avgpool+fc tail unit."""
        from convnet_approximater_tpu.parallel.pp_model import (
            Unit, subtree, unit_from_module)

        params = variables.get("params", {})
        state = variables.get("state", {})

        stem_mods = [(n, getattr(self, n))
                     for n in ("conv1", "bn1", "relu", "maxpool")]

        def stem_fn(p, s, h):
            for n, m in stem_mods:
                h, _, _ = m.apply(p.get(n, {}), h, state=s.get(n, {}),
                                  training=False)
            return h

        units = [Unit("stem", stem_fn,
                      {n: subtree(params, n) for n, _ in stem_mods},
                      {n: subtree(state, n) for n, _ in stem_mods})]
        for lname in ("layer1", "layer2", "layer3", "layer4"):
            layer = getattr(self, lname)
            for bname, block in layer.named_children():
                units.append(unit_from_module(
                    f"{lname}.{bname}", block,
                    subtree(params, lname, bname),
                    subtree(state, lname, bname)))

        fc = self.fc

        def tail_fn(p, s, h):
            v = h.mean(axis=(1, 2))
            y, _, _ = fc.apply(p, v, training=False)
            return y

        units.append(Unit("avgpool+fc", tail_fn, subtree(params, "fc"), {}))
        return units


@MODEL.register_module()
class ResNet18(ResNet):
    def __init__(self, num_classes: int = 1000, init_cfg=None):
        super().__init__(18, num_classes, init_cfg)


@MODEL.register_module()
class ResNet50(ResNet):
    def __init__(self, num_classes: int = 1000, init_cfg=None):
        super().__init__(50, num_classes, init_cfg)
