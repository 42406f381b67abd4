"""Module filter base + registry (reference ``src/approx/filters/module_filter.py``)."""

from __future__ import annotations

from abc import ABC, abstractmethod

from convnet_approximater_tpu.nn import Module
from convnet_approximater_tpu.utils.registry import Registry, build_from_cfg


class ModuleFilter(ABC):
    @abstractmethod
    def filter(self, module: Module) -> bool:
        ...

    def __call__(self, module: Module) -> bool:
        return self.filter(module)

    def rewind(self):
        """Reset stateful cursors for a second registration pass."""


FILTER = Registry("FILTER")


def build_filter(cfg, **kwargs) -> ModuleFilter:
    return build_from_cfg(cfg, FILTER, **kwargs)
