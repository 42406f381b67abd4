"""Shared stage-execution engine: scan-over-blocks + GPipe pipelining.

Any model whose stages are Sequentials of structurally-identical blocks
(MSCAN's attention blocks, ConvNeXt's dw7x7-MLP blocks) gets, via
:class:`BlockStageExec`:

* ``_scan_stage`` — the stage's blocks as ONE ``lax.scan`` over stacked
  per-block params/state (~5x smaller HLO; 110x compile-time win measured
  on MSCAN-t, doc/perf-notes.md), training included: per-block BN state,
  drop-path rates, and rng thread through as data, taps escape stacked.
* ``_pipeline_stage`` — the same stacked blocks as a GPipe pipeline over a
  mesh axis (``parallel/pp.py``): device ``i`` owns blocks
  ``[i*L/n, (i+1)*L/n)``; microbatch activations rotate with ``ppermute``
  over ICI.  No reference counterpart (its scaling story is one GPU per
  process + NCCL all-reduce, SURVEY.md §2.8).
* ``_exec_stage`` — the dispatcher: pipeline if enabled and divisible,
  else scan if structurally allowed, else the unrolled Sequential.

Extracted from ``models/mscan.py`` (round 3g) so ConvNeXt — whose -S/-B
variants carry 27-block stage 3s, the worst compile offenders — shares the
exact same engine and tests.
"""

from __future__ import annotations

import jax.numpy as jnp

from convnet_approximater_tpu.nn import Ctx


class BlockStageExec:
    """Mixin for ``Module`` subclasses; see the module docstring.

    Host-side knobs (plain attrs, safe to default at class level):
    ``scan_blocks`` ('auto'/'off'), ``remat`` (checkpoint the scan body on
    the backward pass), ``_pipeline`` (set via :meth:`enable_pipeline`).
    """

    scan_blocks: str = "auto"
    remat: bool = False
    _pipeline = None


    def enable_pipeline(self, mesh, axis=None, num_microbatches=None):
        """Run each scannable stage's blocks as a GPipe pipeline over
        ``mesh``'s model axis (``parallel/pp.py``): device ``i`` owns blocks
        ``[i*L/n, (i+1)*L/n)`` and microbatch activations rotate through the
        stages with ``ppermute`` over ICI.  Eval is exact (per-microbatch
        BN/LN eval matches the full batch); training differentiates straight
        through the rotation (GPipe batch-stat semantics — see
        ``_pipeline_stage``).  Stages whose block count doesn't divide the
        pipeline depth fall back to the scan.  ``enable_pipeline(None)``
        disables."""
        if mesh is None:
            self._pipeline = None
        else:
            from convnet_approximater_tpu.parallel.mesh import MODEL_AXIS

            self._pipeline = (mesh, axis or MODEL_AXIS, num_microbatches)

    def _pipeline_stage(self, stage, stage_params, x, ctx: Ctx):
        """Eval: :func:`parallel.pp.pipeline_blocks`.  Training:
        :func:`parallel.pp.pipeline_blocks_train` — per-block BN state rides
        the sharded stack, drop-path rng folds per (block, microbatch), and
        the running-stat updates come back averaged over microbatches (GPipe
        semantics: each microbatch normalizes by its own stats; exactly the
        full-batch update at ``num_microbatches=1``).  Taps do NOT escape a
        pipelined stage (capture-enabled Substitutions already force the
        unrolled path via ``_stage_scannable``) — run calibration or
        L2-reconstruct tapping with the pipeline disabled."""
        import jax

        from convnet_approximater_tpu.parallel.pp import (
            pipeline_blocks,
            pipeline_blocks_train,
        )

        mesh, axis, M = self._pipeline
        blocks = list(stage.named_children())
        template = blocks[0][1]
        p_stack = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *[stage_params.get(n, {}) for n, _ in blocks]
        )
        stage_state = ctx.get_state()
        states = [stage_state.get(n, {}) for n, _ in blocks]
        stacked = {"p": p_stack}
        if any(states):
            stacked["s"] = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)

        if not ctx.training:
            def block_fn(ps, h):
                bctx = Ctx(training=False, rng=None, state=ps.get("s", {}))
                return template(ps["p"], h, bctx)

            return pipeline_blocks(block_fn, stacked, x, mesh, axis=axis,
                                   num_microbatches=M)

        stacked["rate"] = jnp.asarray(
            [float(getattr(getattr(b, "drop_path", None), "drop_prob", 0.0))
             for _, b in blocks],
            jnp.float32,
        )
        stacked["i"] = jnp.arange(len(blocks))
        base_rng = ctx.rng() if ctx._rng is not None else None

        def train_block_fn(ps, h, mb):
            brng = None
            if base_rng is not None:
                brng = jax.random.fold_in(
                    jax.random.fold_in(base_rng, ps["i"]), mb)
            bctx = Ctx(training=True, rng=brng, state=ps.get("s", {}))
            bctx.drop_path_rate = ps["rate"]
            y = template(ps["p"], h, bctx)
            return y, bctx.state_out

        y, s_out = pipeline_blocks_train(train_block_fn, stacked, x, mesh,
                                         axis=axis, num_microbatches=M)
        prefix = ctx.path
        for rel, stacked_v in s_out.items():
            for n_i, (n, _) in enumerate(blocks):
                full = f"{prefix}.{n}.{rel}" if prefix else f"{n}.{rel}"
                ctx.state_out[full] = jax.tree_util.tree_map(
                    lambda v, n_i=n_i: v[n_i], stacked_v)
        return y

    def _stage_pipelineable(self, stage, ctx: Ctx) -> bool:
        pipe = getattr(self, "_pipeline", None)
        if pipe is None:
            return False
        mesh, axis, M = pipe
        nb = len(list(stage.named_children()))
        n = mesh.shape[axis]
        return n > 1 and nb % n == 0

    # -- scan-over-blocks path (inference AND training) --------------------
    def _stage_scannable(self, stage, stage_params, ctx: Ctx) -> bool:
        if self.scan_blocks == "off" or ctx.force_branch is not None:
            return False
        blocks = list(stage.named_children())
        if len(blocks) < 2:
            return False
        # capture-enabled Substitutions need their taps to escape; no scan
        for _, block in blocks:
            for _, mod in block.named_modules():
                if getattr(mod, "capture", False):
                    return False
        # all per-block param subtrees must be structurally identical
        import jax

        trees = [stage_params.get(n, {}) for n, _ in blocks]
        ref = jax.tree_util.tree_structure(trees[0])
        if any(jax.tree_util.tree_structure(t) != ref for t in trees[1:]):
            return False
        shapes = [tuple(jnp.shape(l) for l in jax.tree_util.tree_leaves(t)) for t in trees]
        return all(s == shapes[0] for s in shapes[1:])

    def _scan_stage(self, stage, stage_params, x, ctx: Ctx):
        """Run a stage's blocks as one ``lax.scan``.

        Training support: per-block BatchNorm state rides the scan ``xs``
        (each block reads/writes only its own stats) and the updated stacks
        are grafted back into ``ctx.state_out`` per block; per-block
        drop-path rates and a per-block-folded rng thread through as data so
        heterogeneous stochastic-depth schedules don't break the single-trace
        requirement."""
        import jax
        from jax import lax

        blocks = list(stage.named_children())
        template = blocks[0][1]
        p_stack = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *[stage_params.get(n, {}) for n, _ in blocks]
        )
        stage_state = ctx.get_state()
        states = [stage_state.get(n, {}) for n, _ in blocks]
        have_state = any(states)
        s_stack = (
            jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states) if have_state else None
        )
        training = ctx.training
        rates = jnp.asarray(
            [float(getattr(getattr(b, "drop_path", None), "drop_prob", 0.0))
             for _, b in blocks],
            jnp.float32,
        )
        idx = jnp.arange(len(blocks))
        base_rng = ctx.rng() if (training and ctx._rng is not None) else None

        def body(x, inp):
            p, s, rate, i = inp
            brng = jax.random.fold_in(base_rng, i) if base_rng is not None else None
            bctx = Ctx(training=training, rng=brng, state=s or {})
            if training:
                bctx.drop_path_rate = rate
            y = template(p, x, bctx)
            return y, (bctx.state_out, bctx.taps)

        body_fn = body
        if self.remat and training:
            # recompute block activations during backward instead of saving
            # them across the scan (see __init__ docstring)
            body_fn = jax.checkpoint(body, prevent_cse=False)
        y, (s_out, taps_out) = lax.scan(body_fn, x, (p_stack, s_stack, rates, idx))
        # per-block taps come back stacked along the scan axis; re-key them
        # under each block's dotted path (uniform shapes across blocks are
        # guaranteed by the scannability check) — this lets e.g. the int8
        # calibration pass (deploy.quantize_int8) run with the scan ON
        prefix = ctx.path
        for rel, stacked in taps_out.items():
            for n_i, (n, _) in enumerate(blocks):
                full = f"{prefix}.{n}.{rel}" if prefix else f"{n}.{rel}"
                ctx.taps[full] = jax.tree_util.tree_map(
                    lambda v, n_i=n_i: v[n_i], stacked)
        # graft the stacked per-block state updates back under dotted paths
        for rel, stacked in s_out.items():
            for n_i, (n, _) in enumerate(blocks):
                full = f"{prefix}.{n}.{rel}" if prefix else f"{n}.{rel}"
                ctx.state_out[full] = jax.tree_util.tree_map(
                    lambda v, n_i=n_i: v[n_i], stacked
                )
        return y


    def _exec_stage(self, stage, stage_params, x, ctx: Ctx):
        """Run one stage by the best available engine (see module docstring)."""
        if self._stage_scannable(stage, stage_params, ctx):
            if self._stage_pipelineable(stage, ctx):
                return self._pipeline_stage(stage, stage_params, x, ctx)
            return self._scan_stage(stage, stage_params, x, ctx)
        return stage(stage_params, x, ctx)


def resolve_pipeline_carrier(model):
    """The module carrying this stage engine: ``model.backbone`` for the
    MSCAN family, the model itself for ConvNeXt-style models, else None.
    Shared by ClassInference and TrainHelper so carrier discovery can't
    drift between the serving and training paths."""
    backbone = getattr(model, "backbone", None)
    if hasattr(backbone, "enable_pipeline"):
        return backbone
    if hasattr(model, "enable_pipeline"):
        return model
    return None
