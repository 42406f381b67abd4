"""The pivotal abstraction: a module holding both old and new variants.

Rebuild of ``/root/reference/src/approx/layers/substituton.py:15-45``.  A
:class:`Substitution` wraps the source module (``old``) and its cheap
replacement (``new``); ``use_old`` routes the forward; ``switch_new`` /
``switch_old`` drop the other branch (host-side structure mutation — the
corresponding param subtree is pruned by the caller via the model-level
helpers).  The reference's free-form ``cache`` dict + forward hooks (used by
the fine-tuning loop to collect per-substitution outputs/L2 norms) become
:meth:`Ctx.tap` captures keyed ``<path>.out``: purely functional, jit-safe,
and automatically collected from ``Module.apply``'s taps return.
"""

from __future__ import annotations

from convnet_approximater_tpu.nn.module import Ctx, Module
from convnet_approximater_tpu.utils.registry import Registry, build_from_cfg

TAP_OUT = "out"
TAP_IN = "in"


class Substitution(Module):
    def __init__(self, old_module: Module, new_module: Module, use_old: bool = True):
        super().__init__()
        self.old = old_module
        self.new = new_module
        self.use_old = use_old
        self.capture = False  # when True, forward taps its output into ctx

    @property
    def old_module(self) -> Module:
        return self.old

    @property
    def new_module(self) -> Module:
        return self.new

    def switch_new(self, remove_old: bool = True):
        self.use_old = False
        if remove_old and "old" in self._children:
            delattr(self, "old")

    def switch_old(self, remove_new: bool = False):
        self.use_old = True
        if remove_new and "new" in self._children:
            delattr(self, "new")

    def __call__(self, params, x, ctx: Ctx):
        if ctx.force_branch is not None:
            branch = ctx.force_branch
        else:
            branch = "old" if self.use_old else "new"
        if self.capture and getattr(ctx, "capture_inputs", False):
            ctx.tap(TAP_IN, x)
        y = self.child(branch, params, x, ctx)
        if self.capture:
            ctx.tap(TAP_OUT, y)
        return y


LAYER = Registry("LAYER")


def build_layer(cfg, **kwargs) -> Module:
    return build_from_cfg(cfg, LAYER, **kwargs)
