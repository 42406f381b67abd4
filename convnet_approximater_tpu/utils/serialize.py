"""Checkpoint save/load for param/state pytrees.

TPU-native rebuild of ``/root/reference/src/approx/utils/serialize.py``: the
reference stored ``{'state_dict': ...}`` torch pickles with ``strict=False``
loading and missing/unexpected-key warnings.  Here checkpoints are a single
``.npz`` of flat ``/``-joined keys over the nested ``{'params': ..., 'state':
...}`` collections (host numpy arrays — safe, portable, no pickling), and
``load_into`` grafts matching keys into an existing tree, warning about
missing / unexpected keys exactly like the reference's non-strict load.
"""

from __future__ import annotations

import io
import os
from typing import Any, Dict

import numpy as np

from .logger import get_logger

SEP = "/"

# numpy's npz container cannot represent the accelerator-only dtypes
# (they pickle to raw void records and lose their identity on reload) —
# store them bit-cast to a same-width integer with a ``::name`` key marker
# and view them back at load (ml_dtypes provides the numpy-side dtypes).
_EXOTIC_DTYPES = {
    "bfloat16": np.uint16,
    "float8_e4m3fn": np.uint8,
    "float8_e5m2": np.uint8,
}
_DTYPE_MARK = "::"


def flatten_tree(tree: Dict[str, Any], prefix: str = "") -> Dict[str, Any]:
    out = {}
    for k, v in tree.items():
        key = f"{prefix}{SEP}{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(flatten_tree(v, key))
        elif v is None:
            continue
        else:
            out[key] = v
    return out


def unflatten_tree(flat: Dict[str, Any]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for key, v in flat.items():
        parts = key.split(SEP)
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


ORBAX_SUFFIX = ".orbax"


def save_model(variables: Dict[str, Any], path: str):
    """Save a ``{'params': ..., 'state': ...}`` tree to ``path``.

    Default format is a single ``.npz`` of flat keys (portable, atomic).
    A path ending in ``.orbax`` selects the orbax-checkpoint backend
    (sharded/async-capable TensorStore storage — the right choice for
    multi-host or very large models); the same flat key space is stored, so
    the two formats are drop-in interchangeable through ``load_ckpt``."""
    flat = flatten_tree(variables)
    flat = {k: np.asarray(v) for k, v in flat.items()}
    if not str(path).endswith(ORBAX_SUFFIX):  # orbax stores dtypes natively
        marked = {}
        for k, v in flat.items():
            # a param key containing the marker would make load_ckpt's
            # rpartition mis-fire and silently bit-reinterpret the array —
            # refuse rather than corrupt (no real tree produces such keys)
            if _DTYPE_MARK in k:
                raise ValueError(
                    f"param key {k!r} contains the reserved dtype marker "
                    f"{_DTYPE_MARK!r}; rename the module/param")
            name = v.dtype.name
            if name in _EXOTIC_DTYPES:
                marked[f"{k}{_DTYPE_MARK}{name}"] = v.view(_EXOTIC_DTYPES[name])
            else:
                marked[k] = v
        flat = marked
    if str(path).endswith(ORBAX_SUFFIX):
        return _save_orbax(flat, path)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    # Write via a buffer for atomicity on interrupted runs.
    buf = io.BytesIO()
    np.savez(buf, **flat)
    with open(path, "wb") as f:
        f.write(buf.getvalue())


def _save_orbax(flat: Dict[str, Any], path: str):
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    if os.path.exists(path):
        import shutil

        shutil.rmtree(path)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with ocp.PyTreeCheckpointer() as ckptr:
        # '/' is orbax's tree separator; store the flat keys '|'-escaped
        ckptr.save(path, {k.replace(SEP, "|"): v for k, v in flat.items()})


def _load_orbax(path: str) -> Dict[str, Any]:
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        flat = ckptr.restore(os.path.abspath(path))
    return unflatten_tree({k.replace("|", SEP): np.asarray(v)
                           for k, v in flat.items()})


def load_ckpt(path: str) -> Dict[str, Any]:
    """Load a checkpoint (.npz file, .orbax dir or .oshard sharded dir) into a
    nested numpy tree."""
    from .sharded_ckpt import is_sharded_ckpt, restore_sharded

    if is_sharded_ckpt(path):
        return restore_sharded(path)
    if os.path.isdir(path) or str(path).endswith(ORBAX_SUFFIX):
        return _load_orbax(path)
    with np.load(path, allow_pickle=False) as data:
        flat = {}
        for k in data.files:
            key, _, dname = k.rpartition(_DTYPE_MARK)
            if key and dname in _EXOTIC_DTYPES:  # only names we ever write
                import ml_dtypes

                flat[key] = data[k].view(getattr(ml_dtypes, dname))
            else:
                flat[k] = data[k]
    return unflatten_tree(flat)


def load_into(variables: Dict[str, Any], loaded: Dict[str, Any],
              strict: bool = False) -> Dict[str, Any]:
    """Graft ``loaded`` into ``variables``.

    Non-strict (reference semantics, ``strict=False``): warns on missing /
    unexpected keys and keeps the current values there.  ``strict=True``
    raises instead — use at deploy time to avoid silently evaluating with
    randomly-initialised weights when the config does not match the
    checkpoint's structure."""
    cur = flatten_tree(variables)
    new = flatten_tree(loaded)
    missing = sorted(set(cur) - set(new))
    unexpected = sorted(set(new) - set(cur))
    if strict and (missing or unexpected):
        raise ValueError(
            f"checkpoint does not match model: missing={missing[:8]}... "
            f"unexpected={unexpected[:8]}... (strict load)"
        )
    logger = get_logger()
    if missing:
        logger.warning(f"missing keys in checkpoint: {missing}")
    if unexpected:
        logger.warning(f"unexpected keys in checkpoint: {unexpected}")
    merged = dict(cur)
    for k in set(cur) & set(new):
        if tuple(np.shape(cur[k])) != tuple(np.shape(new[k])):
            logger.warning(
                f"shape mismatch for {k}: ckpt {np.shape(new[k])} vs model {np.shape(cur[k])}; skipped"
            )
            continue
        merged[k] = new[k]
    out = unflatten_tree(merged)
    # empty subtrees (e.g. a state-less model's 'state' collection) have no
    # flat keys and would vanish in the round-trip; preserve them
    for k, v in variables.items():
        out.setdefault(k, v)
    return out


def load_model(variables: Dict[str, Any], path: str, strict: bool = False) -> Dict[str, Any]:
    """Load checkpoint at ``path`` into ``variables``."""
    get_logger().info(f"loading checkpoint from {path}")
    return load_into(variables, load_ckpt(path), strict=strict)


def tree_get(tree: Dict[str, Any], path: str):
    """Fetch a subtree/leaf by dotted path ('' returns the tree itself)."""
    if not path:
        return tree
    node = tree
    for p in path.split("."):
        node = node[p]
    return node


def tree_set(tree: Dict[str, Any], path: str, value) -> None:
    """Set a subtree/leaf by dotted path, in place."""
    parts = path.split(".")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def tree_del(tree: Dict[str, Any], path: str) -> None:
    parts = path.split(".")
    node = tree
    for p in parts[:-1]:
        node = node[p]
    node.pop(parts[-1], None)
