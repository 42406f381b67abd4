"""Device-sharded distributed checkpointing (orbax/TensorStore backend).

The reference checkpoints by host-gathering the whole ``state_dict`` into one
torch pickle (``/root/reference/src/approx/hooks/finetune.py:190-203`` via
timm's ``CheckpointSaver``).  That is fine on one GPU; on a TPU pod it
serializes O(model) HBM->host traffic through a single process on every save.

This module is the TPU-native path: the train-state pytree is saved **as it
lives on the mesh** — orbax/TensorStore writes every device's shards in
parallel (and, multi-host, every host writes only its own shards), and the
save is asynchronous so the train loop keeps stepping while bytes drain.
Restore reshards onto an arbitrary target topology: a run saved on a
``4x2`` data×model mesh resumes on ``2x4`` (elastic resume) — the classic
"save on N chips, load on M" recipe from the scaling playbook.

Formats interop: a ``*.oshard`` checkpoint directory restores to a host
numpy tree via :func:`restore_sharded` (no target) and is therefore loadable
through :func:`~.serialize.load_ckpt` like any ``.npz``/``.orbax`` file.
"""

from __future__ import annotations

import os
import shutil
from typing import Any, Dict, Optional

import jax
import numpy as np

SHARDED_SUFFIX = ".oshard"

_CKPTR = None


def _checkpointer():
    global _CKPTR
    if _CKPTR is None:
        import orbax.checkpoint as ocp

        _CKPTR = ocp.StandardCheckpointer()
    return _CKPTR


def is_sharded_ckpt(path: str) -> bool:
    return str(path).rstrip("/").endswith(SHARDED_SUFFIX)


def save_sharded(path: str, tree: Dict[str, Any], *, wait: bool = True) -> str:
    """Save a pytree of (possibly sharded) ``jax.Array``s without gathering.

    ``tree`` may mix device arrays (saved shard-parallel), host numpy arrays
    and python scalars (epoch counters etc).  With ``wait=False`` the save is
    asynchronous — the commit happens on a background thread; call
    :func:`wait_for_saves` (or the next ``save_sharded``, which serializes on
    the in-flight save) before reading the checkpoint back.
    """
    path = os.path.abspath(path)
    ckptr = _checkpointer()
    ckptr.wait_until_finished()  # one in-flight save at a time
    # multihost: the save is COLLECTIVE (every process writes its shards) —
    # call it on ALL processes; only process 0 cleans a stale directory
    # (shared-filesystem assumption), with a barrier before anyone writes
    if jax.process_index() == 0 and os.path.exists(path):
        shutil.rmtree(path)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("sharded_ckpt_pre_save")
    ckptr.save(path, tree)
    if wait:
        ckptr.wait_until_finished()
    return path


def wait_for_saves() -> None:
    """Block until any asynchronous :func:`save_sharded` has committed."""
    if _CKPTR is not None:
        _CKPTR.wait_until_finished()


def abstract_like(tree: Dict[str, Any], shardings: Optional[Dict[str, Any]] = None):
    """Build the restore target: ``ShapeDtypeStruct``s shaped like ``tree``.

    ``shardings`` is an optional matching pytree of ``jax.sharding.Sharding``
    (e.g. from :func:`~..parallel.mesh.param_shardings`); where given, restore
    places the leaf directly onto that sharding — resharding from whatever
    topology the checkpoint was saved under.  Non-array leaves (python
    scalars) pass through and are restored as saved.
    """

    def leaf(x, s=None):
        if not hasattr(x, "shape") or not hasattr(x, "dtype"):
            return x
        return jax.ShapeDtypeStruct(np.shape(x), x.dtype, sharding=s)

    if shardings is None:
        return jax.tree_util.tree_map(leaf, tree)
    return jax.tree_util.tree_map(leaf, tree, shardings)


def restore_sharded(path: str, target: Optional[Dict[str, Any]] = None):
    """Restore a ``save_sharded`` checkpoint.

    With ``target`` (see :func:`abstract_like`), leaves come back as
    ``jax.Array``s on the requested shardings — no host round-trip for the
    resharding path.  Without, the tree is restored to host numpy (the
    portable interop form used by ``load_ckpt``).
    """
    path = os.path.abspath(path)
    wait_for_saves()
    ckptr = _checkpointer()
    if target is not None:
        return ckptr.restore(path, target)
    restored = ckptr.restore(path)

    def to_host(x):
        return np.asarray(x) if hasattr(x, "shape") else x

    return jax.tree_util.tree_map(to_host, restored)
