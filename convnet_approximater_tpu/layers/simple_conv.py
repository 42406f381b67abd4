"""Registry alias: the reference registers a ``SimpleConv`` wrapper exposing
``nn.Conv2d`` construction through the LAYER registry
(``src/approx/layers/simple_conv.py:7-47``).  Our :class:`Conv2d` already
exposes the same constructor surface, so it *is* the registered layer."""

from __future__ import annotations

from convnet_approximater_tpu.nn import Conv2d

from .substitution import LAYER

SimpleConv = LAYER.register_module(name="SimpleConv", module=Conv2d)
