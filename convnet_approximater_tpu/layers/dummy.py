"""No-op layer for pipeline smoke tests (reference ``layers/dummy.py``)."""

from __future__ import annotations

from convnet_approximater_tpu.nn import Ctx, Module

from .substitution import LAYER


@LAYER.register_module()
class DummyLayer(Module):
    def __call__(self, params, x, ctx: Ctx):
        return x
