"""Pipeline parallelism (GPipe-style) over stacked identical blocks.

The reference has no pipeline path at all — its scaling story is one GPU per
process with NCCL all-reduce (SURVEY.md §2.8, ``dist_main.sh``).  On TPU the
idiomatic construction is SPMD: shard the *stacked per-block params* (the
same ``(L, ...)`` stacks the scan-over-blocks path already builds,
``models/mscan.py::MSCAN._scan_stage``) over a mesh axis so each device owns
``L / n`` consecutive blocks, then rotate microbatch activations through the
stages with ``lax.ppermute`` over ICI.  XLA overlaps the permute with the
next microbatch's compute; the bubble is the standard ``(n-1) / (M+n-1)``.

This is the conv-net analog of the stacked-transformer-layer pipeline in the
public scaling-book recipe: a ``shard_map`` over the pipeline axis whose body
runs the local chunk of blocks with ``lax.scan`` and predicates the first /
last stage's IO on ``lax.axis_index``.

Constraints (checked): every block must share one param structure and an
activation-preserving signature ``block_fn(block_params, h) -> h`` (true for
any MSCAN stage's repeated blocks — widths only change at stage
boundaries), ``L % n == 0``, and the batch must split evenly into
microbatches.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from convnet_approximater_tpu.parallel.mesh import MODEL_AXIS

__all__ = ["pipeline_blocks", "pipeline_blocks_train", "stack_shardings"]


def stack_shardings(p_stack, mesh: Mesh, axis: str = MODEL_AXIS):
    """NamedShardings that split every ``(L, ...)`` leaf of a per-block param
    stack over the pipeline axis (device i holds blocks ``[i*L/n, (i+1)*L/n)``)."""
    return jax.tree_util.tree_map(
        lambda leaf: NamedSharding(mesh, P(axis, *([None] * (leaf.ndim - 1)))),
        p_stack,
    )


def pipeline_blocks(
    block_fn,
    p_stack,
    x,
    mesh: Mesh,
    axis: str = MODEL_AXIS,
    num_microbatches: int | None = None,
):
    """Apply ``L`` stacked identical blocks to ``x`` as an ``n``-stage
    pipeline over ``mesh``'s ``axis``.

    Semantically equal to ``lax.scan(lambda h, p: (block_fn(p, h), None), x,
    p_stack)[0]`` — the sequential composition of the blocks — but executed
    with block ``i`` resident only on pipeline stage ``i // (L/n)``.

    Args:
      block_fn: ``(block_params, h) -> h`` with ``h`` shape-preserved.
      p_stack:  pytree whose leaves lead with the block axis ``L``.
      x:        ``(B, ...)`` batch (replicated or batch-sharded on *other*
                mesh axes; this function only communicates over ``axis``).
      num_microbatches: ``M`` (default: the pipeline depth ``n``); ``B % M == 0``.

    Returns the ``(B, ...)`` result, replicated over ``axis``.
    """
    n = mesh.shape[axis]
    leaves = jax.tree_util.tree_leaves(p_stack)
    if not leaves:
        return x
    L = leaves[0].shape[0]
    if any(l.shape[0] != L for l in leaves):
        raise ValueError("pipeline_blocks: ragged block stack")
    if L % n:
        raise ValueError(f"pipeline_blocks: {L} blocks don't split over {n} stages")
    M = int(num_microbatches or n)
    B = x.shape[0]
    if B % M:
        raise ValueError(f"pipeline_blocks: batch {B} % microbatches {M} != 0")
    xs = x.reshape(M, B // M, *x.shape[1:])

    p_specs = jax.tree_util.tree_map(
        lambda leaf: P(axis, *([None] * (leaf.ndim - 1))), p_stack
    )

    def stage(local_p, xs_all):
        idx = lax.axis_index(axis)
        mb_zero = jnp.zeros_like(xs_all[0])

        def chunk(h):
            def body(h, p):
                return block_fn(p, h), None

            h, _ = lax.scan(body, h, local_p)
            return h

        def step(carry, t):
            prev, outs = carry
            # stage 0 injects microbatch t (clipped: past-end steps feed
            # garbage that never reaches a recorded output)
            inp = jnp.where(idx == 0, xs_all[jnp.clip(t, 0, M - 1)], prev)
            out = chunk(inp)
            # the LAST stage finishes microbatch j = t - (n-1) at step t
            j = t - (n - 1)
            jc = jnp.clip(j, 0, M - 1)
            valid = (idx == n - 1) & (j >= 0) & (j < M)
            cur = lax.dynamic_index_in_dim(outs, jc, 0, keepdims=False)
            outs = lax.dynamic_update_index_in_dim(
                outs, jnp.where(valid, out, cur), jc, 0
            )
            nxt = lax.ppermute(out, axis, [(i, (i + 1) % n) for i in range(n)])
            return (nxt, outs), None

        # the carry is device-varying (each stage holds different activations
        # / outputs) — mark it so from step 0 for the scan's VMA typing
        _vary = (lambda v: lax.pcast(v, (axis,), to="varying")) \
            if hasattr(lax, "pcast") else (lambda v: lax.pvary(v, (axis,)))
        carry0 = (_vary(mb_zero), _vary(jnp.zeros_like(xs_all)))
        (_, outs), _ = lax.scan(step, carry0, jnp.arange(M + n - 1))
        # only the last stage holds real outputs; psum replicates them
        # (every other stage contributes zeros)
        return lax.psum(outs, axis)

    x_spec = P()  # microbatch IO replicated over the pipeline axis
    # manual only over the pipeline axis; other mesh axes (e.g. data) stay
    # automatic so dp x pp composes without the body knowing about dp
    fn = jax.shard_map(
        stage,
        mesh=mesh,
        in_specs=(p_specs, x_spec),
        out_specs=x_spec,
        axis_names=frozenset({axis}),
    )
    out = fn(p_stack, xs)
    return out.reshape(B, *x.shape[1:])


def pipeline_blocks_train(
    block_fn,
    stack,
    x,
    mesh: Mesh,
    axis: str = MODEL_AXIS,
    num_microbatches: int | None = None,
):
    """Differentiable GPipe with per-block auxiliary outputs (training path).

    Like :func:`pipeline_blocks`, but ``block_fn(block_stack_slice, h,
    mb_idx) -> (h, aux)`` may consume per-block data beyond params (state,
    drop-path rates, the block index for rng folding — anything the caller
    stacks into ``stack``) and emit a per-block aux tree (e.g. BatchNorm
    running-stat updates).  Returns ``(y, aux_stack)`` where ``aux_stack``
    leads with the block axis ``L`` and each block's aux is the MEAN over
    its ``M`` microbatch activations — the standard GPipe treatment of
    batch statistics (each microbatch normalizes by its own stats; the
    running-stat update is their average, equal to the full-batch update at
    M=1).

    The whole construction is reverse-differentiable: the transpose of the
    forward ``ppermute`` rotation is the inverse rotation, so ``jax.grad``
    of a loss through this function IS the pipeline-parallel backward —
    gradients flow stage-to-stage over ICI with no further machinery.
    """
    n = mesh.shape[axis]
    leaves = jax.tree_util.tree_leaves(stack)
    if not leaves:
        return x, stack
    L = leaves[0].shape[0]
    if any(l.shape[0] != L for l in leaves):
        raise ValueError("pipeline_blocks_train: ragged block stack")
    if L % n:
        raise ValueError(
            f"pipeline_blocks_train: {L} blocks don't split over {n} stages")
    M = int(num_microbatches or n)
    B = x.shape[0]
    if B % M:
        raise ValueError(
            f"pipeline_blocks_train: batch {B} % microbatches {M} != 0")
    xs = x.reshape(M, B // M, *x.shape[1:])

    specs = jax.tree_util.tree_map(
        lambda leaf: P(axis, *([None] * (leaf.ndim - 1))), stack
    )

    def stage(local_stack, xs_all):
        idx = lax.axis_index(axis)
        mb_zero = jnp.zeros_like(xs_all[0])

        def _vary(v):
            # mark device-varying over the pipe axis; no-op if already so
            try:
                if hasattr(lax, "pcast"):
                    return lax.pcast(v, (axis,), to="varying")
                return lax.pvary(v, (axis,))
            except ValueError:
                return v

        def chunk(h, mb_idx):
            def body(h, ps):
                return block_fn(ps, h, mb_idx)

            # h enters device-varying (each stage computes its own blocks)
            return lax.scan(body, _vary(h), local_stack)

        aux_shape = jax.eval_shape(chunk, mb_zero, jnp.int32(0))[1]
        aux0 = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), aux_shape)

        def step(carry, t):
            prev, outs, aux_acc = carry
            j = t - idx  # this stage's microbatch index at step t
            mb = jnp.clip(j, 0, M - 1)
            inp = jnp.where(idx == 0, xs_all[jnp.clip(t, 0, M - 1)], prev)
            out, auxs = chunk(inp, mb)
            active = (j >= 0) & (j < M)
            aux_acc = jax.tree_util.tree_map(
                lambda acc, u: acc + jnp.where(active, u, jnp.zeros_like(u)) / M,
                aux_acc, auxs)
            jo = t - (n - 1)  # the LAST stage finishes microbatch jo here
            joc = jnp.clip(jo, 0, M - 1)
            valid = (idx == n - 1) & (jo >= 0) & (jo < M)
            cur = lax.dynamic_index_in_dim(outs, joc, 0, keepdims=False)
            outs = lax.dynamic_update_index_in_dim(
                outs, jnp.where(valid, out, cur), joc, 0)
            nxt = lax.ppermute(out, axis, [(i, (i + 1) % n) for i in range(n)])
            return (nxt, outs, aux_acc), None

        carry0 = (_vary(mb_zero), _vary(jnp.zeros_like(xs_all)),
                  jax.tree_util.tree_map(_vary, aux0))
        (_, outs, aux_acc), _ = lax.scan(step, carry0, jnp.arange(M + n - 1))
        return lax.psum(outs, axis), aux_acc

    x_spec = P()
    fn = jax.shard_map(
        stage,
        mesh=mesh,
        in_specs=(specs, x_spec),
        out_specs=(x_spec, P(axis)),  # P(axis) prefix-broadcasts over aux
        axis_names=frozenset({axis}),
    )
    out, aux_stack = fn(stack, xs)
    return out.reshape(B, *x.shape[1:]), aux_stack
