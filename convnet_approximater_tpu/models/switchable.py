"""Switchable-model machinery: the model-side half of the substitution engine.

Rebuild of ``/root/reference/src/approx/models/switchable.py:12-96``.  The BFS
registration order over ``named_children`` is reproduced exactly (stateful
filters like ``IndicesFilter`` and per-layer ``num_bases`` cursors depend on
it — SURVEY.md §7 "hard parts" #2).  Because params live outside modules, the
torch mutations become paired (structure, param-tree) edits, and
``freeze_except`` returns a boolean *mask pytree* for ``optax.masked`` instead
of toggling ``requires_grad``.
"""

from __future__ import annotations

from typing import Iterable, List, Optional

import jax

from convnet_approximater_tpu.nn import Module
from convnet_approximater_tpu.utils.registry import Registry, build_from_cfg
from convnet_approximater_tpu.utils.serialize import load_model, tree_get, tree_set


class SwitchableModel(Module):
    def __init__(self, init_cfg: Optional[str] = None):
        super().__init__()
        self._switchable_names: List[str] = []
        self.init_cfg = init_cfg

    # -- weight init ---------------------------------------------------
    def init_weights(self, variables: dict) -> dict:
        """Load pretrained weights from ``init_cfg`` (non-strict) if set."""
        if isinstance(self.init_cfg, str):
            return load_model(variables, self.init_cfg)
        return variables

    # -- registration ---------------------------------------------------
    def register_switchable(self, src_type: type, filters, verbose: bool = False):
        """BFS over named children; matching modules pass the filter chain.

        Matches the reference's traversal exactly: FIFO queue seeded with the
        model's direct children, matches are not recursed into.
        """
        from convnet_approximater_tpu.utils.logger import get_logger

        self._switchable_names = []
        queue = [(name, module) for name, module in self.named_children()]
        while queue:
            name, module = queue.pop(0)
            if isinstance(module, src_type):
                passed = True
                for f in filters:
                    if not f(module):
                        passed = False
                        if verbose:
                            get_logger().info(f"{name} filtered out by {type(f).__name__}")
                        break
                if passed:
                    self._switchable_names.append(name)
                continue  # src_type assumed non-recursive
            for child_name, child in module.named_children():
                queue.append((f"{name}.{child_name}", child))

    @property
    def length_switchable(self) -> int:
        return len(self._switchable_names)

    @property
    def switchable_names(self) -> List[str]:
        return list(self._switchable_names)

    # -- get / set -------------------------------------------------------
    def get_switchable_module(self, index: int) -> Module:
        return self.get_submodule(self._switchable_names[index])

    def set_switchable_module(self, index: int, module: Module, variables: dict,
                              sub_variables: dict):
        """Replace switchable ``index`` with ``module`` and graft its param/
        state subtrees into ``variables`` (in place).

        ``variables`` / ``sub_variables`` are ``{'params': ..., 'state': ...}``
        trees; either collection may be absent.
        """
        name = self._switchable_names[index]
        self.set_submodule(name, module)
        for coll in ("params", "state"):
            if coll in variables:
                sub = sub_variables.get(coll, {})
                tree_set(variables[coll], name, sub)

    def switchable_modules(self) -> Iterable[Module]:
        for idx in range(self.length_switchable):
            yield self.get_switchable_module(idx)

    # -- freeze masks ----------------------------------------------------
    def freeze_except(self, params: dict, *indices: int) -> dict:
        """Boolean mask pytree: True = trainable.

        All params frozen except those under the listed switchables; if the
        module at a path defines ``switchable_layer()`` (e.g. MSCA ->
        ``sd_convs``) only that sub-path unfreezes — mirroring the reference's
        ``freeze_except`` semantics (``switchable.py:63-84``).
        """
        mask = jax.tree_util.tree_map(lambda _: False, params)
        for index in indices:
            name = self._switchable_names[index]
            module = self.get_submodule(name)
            target = name
            if hasattr(module, "switchable_layer"):
                target = f"{name}.{module.switchable_layer()}"
            sub = tree_get(params, target)
            tree_set(mask, target, jax.tree_util.tree_map(lambda _: True, sub))
        return mask

    def unfreeze(self, params: dict) -> dict:
        return jax.tree_util.tree_map(lambda _: True, params)


MODEL = Registry("MODEL")


def build_model(cfg) -> SwitchableModel:
    return build_from_cfg(cfg, MODEL)
