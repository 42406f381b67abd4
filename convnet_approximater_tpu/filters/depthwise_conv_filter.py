"""Depthwise-conv precondition filter (no reference counterpart — added
for :class:`~convnet_approximater_tpu.core.dw_sep_rep.DwSepRep`, whose
per-channel separable split applies only to square stride-1 depthwise
kernels, e.g. ConvNeXt's 7x7 ``dwconv``)."""

from __future__ import annotations

from convnet_approximater_tpu.nn import Conv2d

from .module_filter import FILTER, ModuleFilter


@FILTER.register_module()
class DepthwiseConvFilter(ModuleFilter):
    """Passes square stride-1 undilated depthwise convs with k >= min_kernel."""

    def __init__(self, min_kernel: int = 3):
        self.min_kernel = min_kernel

    def filter(self, module) -> bool:
        assert isinstance(module, Conv2d)
        kh, kw = module.kernel_size
        return (module.groups == module.in_channels == module.out_channels
                and kh == kw >= self.min_kernel
                and module.stride == (1, 1)
                and module.dilation == (1, 1))
