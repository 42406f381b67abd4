"""Device mesh + sharding helpers: the SPMD replacement for the reference's
torchrun/DDP/NCCL stack (SURVEY.md §2.8).

The reference launched one process per GPU with NCCL all-reduce
(``dist_main.sh``, ``scripts/main.py:46-67``).  Here a single program jits
over a ``jax.sharding.Mesh`` with named axes:

* ``data``  — batch (data parallelism; gradient psum is compiler-inserted)
* ``model`` — channel/feature sharding for tensor parallelism of the wide
  1x1 mixing convs and classifier heads

so DP/TP compose by laying arrays out with ``NamedSharding``; XLA schedules
the collectives over ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(data: Optional[int] = None, model: int = 1, devices=None) -> Mesh:
    """Build a (data, model) mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // model
    assert data * model == n, f"{data}x{model} mesh != {n} devices"
    arr = np.array(devices).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def spatial_sharding(mesh: Mesh) -> NamedSharding:
    """Shard NHWC activations over batch (data axis) AND image rows (model
    axis) — the conv-net analog of sequence parallelism.  XLA inserts the
    halo exchanges a spatially-sharded convolution needs (kernel-width rows
    traded with neighbors over ICI), so giant images that don't fit one
    chip's HBM run without any manual tiling; see
    ``tests/test_parallel.py::test_spatial_sharding_matches_replicated``."""
    return NamedSharding(mesh, P(DATA_AXIS, MODEL_AXIS))


def shard_batch(batch, mesh: Mesh):
    """Device-put a (possibly nested) batch with the leading axis sharded."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree, mesh: Mesh):
    rep = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), tree)


def param_shardings(params: dict, mesh: Mesh, tp_rules: Sequence[tuple] = (),
                    warn: bool = True) -> dict:
    """Shardings for a param tree: replicated by default, with optional
    tensor-parallel rules ``(path_suffix, PartitionSpec)`` matched against the
    '/'-joined flat path (e.g. ``("head/weight", P(None, MODEL_AXIS))`` to
    column-shard the classifier).  A ``^``-prefixed rule matches the FULL
    path only — use it to pin a root-level param whose name is a suffix of
    deeper ones (e.g. ResNet's stem ``^conv1/weight`` vs the blocks'
    ``layerN/i/conv1/weight``).  A ``?`` prefix (before any ``^``) marks a
    rule OPTIONAL: it matches normally but is excluded from the unmatched
    warning — used by the presets' int8-serving aliases, which only exist
    on quantized trees.  First matching rule wins.

    A non-optional rule that matches no param is almost always a typo'd
    path (the model would silently train fully replicated); it is reported
    with a warning so misconfigured TP layouts are visible."""
    from convnet_approximater_tpu.utils.logger import get_logger
    from convnet_approximater_tpu.utils.serialize import flatten_tree, unflatten_tree

    flat = flatten_tree(params)
    out = {}
    used = [False] * len(tp_rules)
    stripped = [(s[1:] if s.startswith("?") else s, s.startswith("?"))
                for s, _ in tp_rules]
    for key in flat:
        spec = P()
        for i, (suffix, _opt) in enumerate(stripped):
            if (key == suffix[1:] if suffix.startswith("^")
                    else key.endswith(suffix)):
                spec = tp_rules[i][1]
                used[i] = True
                break
        out[key] = NamedSharding(mesh, spec)
    matched_suffixes = {stripped[i][0] for i, u in enumerate(used) if u}
    unmatched = [
        tp_rules[i][0] for i, u in enumerate(used)
        if not u and not stripped[i][1]
        # a dense rule whose int8 twin matched is not a typo — the tree is
        # quantized (weight -> weight_q) and the layout is carried by the
        # alias
        and not (stripped[i][0].endswith("/weight")
                 and stripped[i][0][:-len("/weight")] + "/weight_q"
                 in matched_suffixes)]
    if not warn:
        unmatched = []  # deploy-rewritten trees (folded/pruned) drop params
                        # the training-time preset legitimately names
    if unmatched:
        get_logger().warning(
            f"param_shardings: tp rules matched no params (typo?): {unmatched}"
        )
    return unflatten_tree(out)


def pad_to_multiple(batch_arr, multiple: int):
    """Pad the leading axis up to a multiple (for even sharding); returns
    (padded, valid_count)."""
    n = batch_arr.shape[0]
    rem = (-n) % multiple
    if rem == 0:
        return batch_arr, n
    pad = [(0, rem)] + [(0, 0)] * (batch_arr.ndim - 1)
    return np.pad(np.asarray(batch_arr), pad), n
