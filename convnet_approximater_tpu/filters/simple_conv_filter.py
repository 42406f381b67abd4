"""Scheme-1 precondition filter (reference ``filters/simple_conv_filter.py:7-22``):
rejects grouped, dilated, or bias-less convs (transposed convs don't exist as
a separate type here — Conv2d is always forward)."""

from __future__ import annotations

from convnet_approximater_tpu.nn import Conv2d

from .module_filter import FILTER, ModuleFilter


@FILTER.register_module()
class SimpleConvFilter(ModuleFilter):
    def filter(self, module) -> bool:
        assert isinstance(module, Conv2d)
        if module.groups > 1:
            return False
        if module.dilation[0] > 1 or module.dilation[1] > 1:
            return False
        if not module.use_bias:
            return False
        return True
