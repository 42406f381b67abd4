"""Dense spatial-conv filter (the planner's factorization-target gate).

No direct reference counterpart (its filters are SimpleConvFilter /
IndicesFilter, ``src/approx/filters``); this encodes the measured V3/V4
applicability rule as a reusable, config-expressible filter: dense
(groups == 1, undilated) spatial convs with enough input channels for a
channel-rank cut to matter — the 3-channel stem's ``C*k^2`` is too small
for V3/V4 to win anything.
"""

from __future__ import annotations

from convnet_approximater_tpu.nn import Conv2d

from .module_filter import FILTER, ModuleFilter


@FILTER.register_module()
class DenseKxKFilter(ModuleFilter):
    def __init__(self, min_kernel: int = 2, min_in: int = 8):
        self.min_kernel = min_kernel
        self.min_in = min_in

    def filter(self, module) -> bool:
        assert isinstance(module, Conv2d)
        return (module.groups == 1
                and module.dilation == (1, 1)  # V3/V4 reject dilated convs
                and min(module.kernel_size) >= self.min_kernel
                and module.in_channels >= self.min_in)
