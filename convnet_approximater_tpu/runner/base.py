"""Runner ABC (reference ``src/approx/runner/base.py``)."""

from __future__ import annotations

from abc import ABC, abstractmethod


class BaseRunner(ABC):
    @abstractmethod
    def run(self):
        ...
