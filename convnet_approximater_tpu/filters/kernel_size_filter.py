"""Spatial-kernel-size precondition filter (no reference counterpart —
added for the ResNet family, whose switchable stream mixes 3x3 block convs
with 1x1 downsample/bottleneck convs that a spatial low-rank expansion
cannot compress)."""

from __future__ import annotations

from convnet_approximater_tpu.nn import Conv2d

from .module_filter import FILTER, ModuleFilter


@FILTER.register_module()
class KernelSizeFilter(ModuleFilter):
    """Passes convs whose spatial kernel is at least ``min_kernel`` in both
    dims (default 2: rejects exactly the 1x1 pointwise convs)."""

    def __init__(self, min_kernel: int = 2, max_kernel: int = 10**9):
        self.min_kernel = min_kernel
        self.max_kernel = max_kernel

    def filter(self, module) -> bool:
        assert isinstance(module, Conv2d)
        kh, kw = module.kernel_size
        return (min(kh, kw) >= self.min_kernel
                and max(kh, kw) <= self.max_kernel)
