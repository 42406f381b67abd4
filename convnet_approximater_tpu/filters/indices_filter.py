"""Stateful 1-based positional selector (reference ``filters/indices_filter.py:9-21``).

The cursor advances once per *candidate* module seen, so the selected indices
are positions in the BFS registration stream; ``rewind()`` resets for the
teacher-model re-registration pass in the fine-tune hook.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from .module_filter import FILTER, ModuleFilter


@FILTER.register_module()
class IndicesFilter(ModuleFilter):
    def __init__(self, indices: Tuple[int, ...]):
        indices = tuple(indices)
        self.records = np.zeros(max(indices) + 1, dtype=bool)
        self.records[list(indices)] = True
        self.curr = 1

    def filter(self, module) -> bool:
        passed = bool(self.records[self.curr]) if self.curr < len(self.records) else False
        self.curr += 1
        return passed

    def rewind(self):
        self.curr = 1
