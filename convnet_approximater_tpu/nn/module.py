"""Functional module system: mutable structure, pure compute.

Design
------
The reference (``src/approx/models/switchable.py``, ``src/approx/layers/``)
relies on *module surgery*: walking a tree of named submodules, replacing a
submodule with a :class:`Substitution` wrapper, switching branches, and caching
intermediate outputs through forward hooks.  A torch-style mutable object tree
is the right host-side representation for that — but on TPU all compute must be
pure functions of parameter pytrees so it can be traced once by XLA.

So a :class:`Module` here holds only *structure* (children + hyperparameters)
and owns no arrays.  Parameters and mutable state (BatchNorm running stats)
live in separate nested dicts mirroring the child-name tree, created by
:meth:`Module.init` / :meth:`Module.init_state` and passed through every
``__call__``.  Structure mutation (substitution, branch switching) happens
host-side between jit traces; ``__call__`` is pure and jit-safe.

The :class:`Ctx` object threads through a forward pass and replaces the
reference's torch machinery:

* ``training`` flag        -> ``module.train()/eval()`` modes
* ``ctx.rng(...)``         -> per-path PRNG streams (dropout / drop-path)
* ``ctx.get_state/put_state`` -> BN running stats (read + functional update)
* ``ctx.tap(...)``         -> forward hooks / ``Substitution.cache`` (L2 losses)

Path scoping is explicit: container modules call children through
``self.child(name, params, x, ctx)``, which pushes the child's name onto the
ctx path so state/taps are keyed by the same dotted names the substitution
engine uses.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Any, Dict, Iterator, Optional, Tuple

import jax


def _stable_fold(key, name: str):
    """Fold a string into a PRNG key deterministically across processes."""
    h = 2166136261
    for ch in name.encode():
        h = ((h ^ ch) * 16777619) & 0xFFFFFFFF
    return jax.random.fold_in(key, h)


class Ctx:
    """Per-forward-pass context: mode, rng, state I/O, tapped intermediates."""

    def __init__(self, training: bool = False, rng=None, state: Optional[dict] = None,
                 force_branch: Optional[str] = None):
        self.training = training
        self._rng = rng
        self.state_in = state or {}
        self.state_out: Dict[str, Any] = {}  # flat dotted-path -> new state dict
        self.taps: Dict[str, Any] = {}  # flat dotted-path -> tapped value
        # When set ('old'/'new'), Substitution modules route to that branch
        # regardless of their use_old flag — the jit-safe replacement for the
        # reference's per-batch switch_old/switch_new double-pass trick
        # (finetune.py:300-312): both passes live in ONE traced step.
        self.force_branch = force_branch
        # scan-over-blocks support: a traced per-block drop-path rate set by
        # MSCAN._scan_stage for the duration of one scan-body trace (None
        # everywhere else; DropPath falls back to its static rate)
        self.drop_path_rate = None
        self._path = []

    # -- path scoping ---------------------------------------------------
    def enter(self, name: str):
        self._path.append(name)

    def exit(self):
        self._path.pop()

    def scope(self, name: str):
        """Context manager form of enter/exit."""
        from contextlib import contextmanager

        @contextmanager
        def _scope():
            self.enter(name)
            try:
                yield
            finally:
                self.exit()

        return _scope()

    @property
    def path(self) -> str:
        return ".".join(self._path)

    # -- rng ------------------------------------------------------------
    def rng(self):
        """A PRNG key unique to the current module path."""
        if self._rng is None:
            raise ValueError(f"module at {self.path!r} needs an rng but none was supplied")
        key = self._rng
        for name in self._path:
            key = _stable_fold(key, name)
        return key

    # -- state (e.g. BN running stats) ----------------------------------
    def get_state(self) -> dict:
        node = self.state_in
        for p in self._path:
            if not isinstance(node, dict) or p not in node:
                return {}
            node = node[p]
        return node if isinstance(node, dict) else {}

    def put_state(self, new_state: dict):
        self.state_out[self.path] = new_state

    # -- taps (forward-hook replacement) --------------------------------
    def tap(self, name: str, value):
        key = f"{self.path}.{name}" if self.path else name
        self.taps[key] = value


class Module:
    """Base class: named-children tree + pure apply."""

    def __init__(self):
        object.__setattr__(self, "_children", OrderedDict())

    # -- tree bookkeeping ----------------------------------------------
    def __setattr__(self, name, value):
        children = self.__dict__.get("_children")
        if children is not None:
            if isinstance(value, Module):
                children[name] = value
            elif name in children:
                del children[name]
        object.__setattr__(self, name, value)

    def __delattr__(self, name):
        children = self.__dict__.get("_children")
        if children is not None and name in children:
            del children[name]
        object.__delattr__(self, name)

    def add_module(self, name: str, module: "Module"):
        self._children[name] = module
        object.__setattr__(self, name, module)

    def named_children(self) -> Iterator[Tuple[str, "Module"]]:
        return iter(list(self._children.items()))

    def get_submodule(self, path: str) -> "Module":
        if not path:
            return self
        mod = self
        for p in path.split("."):
            mod = mod._children[p]
        return mod

    def set_submodule(self, path: str, module: "Module"):
        parts = path.split(".")
        parent = self.get_submodule(".".join(parts[:-1]))
        name = parts[-1]
        if hasattr(parent, name) or name in parent._children:
            setattr(parent, name, module)
        else:
            raise AttributeError(f"module {parent} does not have attr {name}")

    def named_modules(self, prefix: str = "") -> Iterator[Tuple[str, "Module"]]:
        yield prefix, self
        for name, child in self.named_children():
            sub_prefix = f"{prefix}.{name}" if prefix else name
            yield from child.named_modules(sub_prefix)

    # -- params / state -------------------------------------------------
    def init_params(self, rng) -> Dict[str, Any]:
        """Own (non-child) parameters; leaves override."""
        return {}

    def init_own_state(self) -> Dict[str, Any]:
        """Own (non-child) mutable state; e.g. BN overrides."""
        return {}

    def init(self, rng) -> Dict[str, Any]:
        params: Dict[str, Any] = {}
        for name, child in self.named_children():
            sub = child.init(_stable_fold(rng, name))
            if sub:
                params[name] = sub
        own = self.init_params(rng)
        assert not (set(own) & set(params)), "param name collides with child name"
        params.update(own)
        return params

    def init_state(self) -> Dict[str, Any]:
        state: Dict[str, Any] = {}
        for name, child in self.named_children():
            sub = child.init_state()
            if sub:
                state[name] = sub
        own = self.init_own_state()
        assert not (set(own) & set(state))
        state.update(own)
        return state

    # -- apply ----------------------------------------------------------
    def child(self, name: str, params, x, ctx: Ctx, **kw):
        """Call child ``name`` with its param slice under a ctx scope."""
        mod = self._children[name]
        p = params.get(name, {}) if isinstance(params, dict) else {}
        ctx.enter(name)
        try:
            return mod(p, x, ctx, **kw)
        finally:
            ctx.exit()

    def __call__(self, params, x, ctx: Ctx, **kw):
        raise NotImplementedError

    # -- convenience ----------------------------------------------------
    def apply(self, params, x, *, state=None, training=False, rng=None):
        """Run a forward pass; returns ``(y, new_state, taps)``.

        ``new_state`` is ``state`` with any updates grafted back in (a new
        nested dict; unchanged leaves shared)."""
        ctx = Ctx(training=training, rng=rng, state=state or {})
        y = self(params, x, ctx)
        new_state = _merge_state(state or {}, ctx.state_out)
        return y, new_state, ctx.taps

    def __repr__(self):
        lines = [self.__class__.__name__]
        for name, child in self.named_children():
            child_repr = repr(child).split("\n")
            lines.append(f"  ({name}): {child_repr[0]}")
            lines.extend("  " + l for l in child_repr[1:])
        return "\n".join(lines)


def _merge_state(state: dict, updates: Dict[str, dict]) -> dict:
    if not updates:
        return state

    def set_path(tree, parts, value):
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value

    # deep-copy the dict spine only; leaves stay shared
    def copy_spine(t):
        if isinstance(t, dict):
            return {k: copy_spine(v) for k, v in t.items()}
        return t

    out = copy_spine(state or {})
    for path, value in updates.items():
        if not path:  # a stateful leaf module applied directly (root scope)
            out.update(value)
        else:
            set_path(out, path.split("."), value)
    return out


class Sequential(Module):
    """Children named '0', '1', ... applied in order (torch nn.Sequential)."""

    def __init__(self, *modules: Module):
        super().__init__()
        for i, m in enumerate(modules):
            self.add_module(str(i), m)

    def __len__(self):
        return len(self._children)

    def __getitem__(self, idx: int):
        return self._children[str(idx)]

    def __setitem__(self, idx: int, module: Module):
        name = str(idx)
        assert name in self._children
        self.add_module(name, module)

    def __call__(self, params, x, ctx: Ctx):
        for name in self._children:
            x = self.child(name, params, x, ctx)
        return x


class ModuleList(Module):
    """Indexable container; has no forward of its own."""

    def __init__(self, modules=()):
        super().__init__()
        for i, m in enumerate(modules):
            self.add_module(str(i), m)

    def append(self, module: Module):
        self.add_module(str(len(self._children)), module)

    def __len__(self):
        return len(self._children)

    def __getitem__(self, idx: int):
        return self._children[str(idx)]

    def __iter__(self):
        return iter(self._children.values())


class Identity(Module):
    def __call__(self, params, x, ctx: Ctx):
        return x
