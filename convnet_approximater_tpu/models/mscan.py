"""MSCAN (SegNeXt) backbone + classifier — the msca-rep workload.

Rebuild of ``/root/reference/src/approx/models/mscan.py``: 4 stages of
(StemConv/DownSample -> MultiScaleConvAttnModule x n -> LayerNorm), blocks =
BN -> SpatialAttention(proj -> GELU -> MSCA -> proj + shortcut) -> BN ->
conv-FFN with per-block layer-scale and drop-path; classifier adds GAP +
Linear head.  NHWC throughout (the reference's NCHW <-> (B, N, C) flattening
dance around LayerNorm disappears: LN over the trailing channel axis is a
no-op layout-wise).
"""

from __future__ import annotations

import jax.numpy as jnp

import convnet_approximater_tpu.nn as nn
from convnet_approximater_tpu.layers import MSCA, DropPath
from convnet_approximater_tpu.nn import Ctx, Module

from .switchable import MODEL, SwitchableModel


class StemConv(Module):
    def __init__(self, in_channels: int, out_channels: int):
        super().__init__()
        self.proj = nn.Sequential(
            nn.Conv2d(in_channels, out_channels // 2, 3, stride=2, padding=1),
            nn.BatchNorm2d(out_channels // 2),
            nn.GELU(),
            nn.Conv2d(out_channels // 2, out_channels, 3, stride=2, padding=1),
            nn.BatchNorm2d(out_channels),
        )

    def __call__(self, params, x, ctx: Ctx):
        return self.child("proj", params, x, ctx)


class FFN(Module):
    """1x1 conv -> depthwise 3x3 -> GELU -> 1x1 conv -> dropout."""

    def __init__(self, num_channel: int, hidden_channel: int, drop: float):
        super().__init__()
        self.num_channel = num_channel
        self.hidden_channel = hidden_channel
        self.drop_rate = drop
        self.fc1 = nn.Conv2d(num_channel, hidden_channel, 1)
        self.dconv = nn.Conv2d(hidden_channel, hidden_channel, 3, padding=1, groups=hidden_channel)
        self.fc2 = nn.Conv2d(hidden_channel, num_channel, 1)
        self.drop = nn.Dropout(drop)

    def __call__(self, params, x, ctx: Ctx):
        x = self.child("fc1", params, x, ctx)
        x = self.child("dconv", params, x, ctx)
        x = nn.GELU()({}, x, ctx)
        x = self.child("fc2", params, x, ctx)
        return self.child("drop", params, x, ctx)


class SpatialAttention(Module):
    def __init__(self, num_channel: int, k1_size: int = 5, k_sizes=(7, 11, 21)):
        super().__init__()
        self.proj_1 = nn.Conv2d(num_channel, num_channel, 1)
        self.spatial_gating_unit = MSCA(num_channel, k1_size, k_sizes)
        self.proj_2 = nn.Conv2d(num_channel, num_channel, 1)

    def __call__(self, params, x, ctx: Ctx):
        shortcut = x
        x = self.child("proj_1", params, x, ctx)
        x = nn.GELU()({}, x, ctx)
        x = self.child("spatial_gating_unit", params, x, ctx)
        x = self.child("proj_2", params, x, ctx)
        return x + shortcut


class MultiScaleConvAttnModule(Module):
    """One MSCAN block (reference ``mscan.py:83-116``)."""

    LAYER_SCALE_INIT = 1e-2

    def __init__(self, num_channel: int, hidden_channel: int, drop: float, drop_path: float):
        super().__init__()
        self.num_channel = num_channel
        self.norm1 = nn.BatchNorm2d(num_channel)
        self.attn = SpatialAttention(num_channel)
        self.norm2 = nn.BatchNorm2d(num_channel)
        self.mlp = FFN(num_channel, hidden_channel, drop)
        # always a DropPath module (rate 0.0 is the identity) so blocks of a
        # stage stay structurally identical under any drop-path schedule —
        # the per-block rates thread through the scan body as data
        self.drop_path = DropPath(drop_path)

    def init_params(self, rng):
        scale = self.LAYER_SCALE_INIT * jnp.ones((self.num_channel,))
        return {"layer_scale_1": scale, "layer_scale_2": scale}

    def __call__(self, params, x, ctx: Ctx):
        y = self.child("attn", params, self.child("norm1", params, x, ctx), ctx)
        x = x + self.child("drop_path", params, params["layer_scale_1"] * y, ctx)
        y = self.child("mlp", params, self.child("norm2", params, x, ctx), ctx)
        x = x + self.child("drop_path", params, params["layer_scale_2"] * y, ctx)
        return x


class DownSample(Module):
    def __init__(self, in_channel: int, out_channel: int):
        super().__init__()
        self.proj = nn.Conv2d(in_channel, out_channel, 3, stride=2, padding=1)
        self.norm = nn.BatchNorm2d(out_channel)

    def __call__(self, params, x, ctx: Ctx):
        return self.child("norm", params, self.child("proj", params, x, ctx), ctx)


class MSCAN(Module):
    """The backbone: returns per-stage feature maps.

    ``scan_blocks='auto'``: each stage's repeated blocks run as ONE
    ``lax.scan`` body over stacked per-block params/state instead of an
    unrolled chain — ~5x smaller HLO, which cuts the (minutes-long on the
    remote-compile tunnel) XLA compile of the full model accordingly.  The
    scan engages only when every block in the stage is structurally identical
    (heterogeneous per-layer substitutions fall back to the unrolled path).
    Training scans too: per-block BN state rides the scan inputs/outputs and
    is grafted back into ``ctx.state_out``, and per-block drop-path rates +
    rng keys thread through as data; only tap captures (the L2-reconstruct
    teachers/students) and ``force_branch`` double-passes fall back to the
    unrolled path, since their intermediates must escape the scan body.
    """

    def __init__(
        self,
        in_channels: int = 3,
        num_channels=(32, 64, 160, 256),
        num_blocks=(3, 3, 5, 2),
        exp_ratios=(8, 8, 4, 4),
        drop_rate: float = 0.0,
        drop_path_rate: float = 0.0,
        scan_blocks: str = "auto",
        remat: bool = False,
    ):
        super().__init__()
        # remat: rematerialize each scanned block on the backward pass
        # (jax.checkpoint over the scan body) — activation memory becomes
        # O(1) in depth instead of O(num_blocks); the recompute FLOPs are
        # one extra forward per block, the standard trade for training
        # models that don't otherwise fit HBM.
        self.remat = remat
        assert len(num_channels) == len(num_blocks) == len(exp_ratios)
        self.num_channels = tuple(num_channels)
        self.num_blocks = tuple(num_blocks)
        self.scan_blocks = scan_blocks
        self._pipeline = None  # see enable_pipeline
        total = sum(num_blocks)
        dpr = [drop_path_rate * i / max(total - 1, 1) for i in range(total)]
        self.layers = nn.ModuleList()
        cur = 0
        for i, nb in enumerate(num_blocks):
            out_c = num_channels[i]
            hid_c = num_channels[i] * exp_ratios[i]
            down = StemConv(in_channels, num_channels[0]) if i == 0 else DownSample(num_channels[i - 1], out_c)
            stage = nn.Sequential(
                *[
                    MultiScaleConvAttnModule(out_c, hid_c, drop_rate, dpr[cur + j])
                    for j in range(nb)
                ]
            )
            norm = nn.LayerNorm(out_c)
            self.layers.append(nn.ModuleList([down, stage, norm]))
            cur += nb

    # -- pipeline-parallel path (eval + training) --------------------------
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

    def __call__(self, params, x, ctx: Ctx):
        features = []
        layers_params = params.get("layers", {})
        with ctx.scope("layers"):
            for name, layer in self.layers.named_children():
                lp = layers_params.get(name, {})
                with ctx.scope(name):
                    # layer is ModuleList([downsample, stage, norm])
                    x = layer.child("0", lp, x, ctx)
                    stage = layer[1]
                    with ctx.scope("1"):
                        if self._stage_scannable(stage, lp.get("1", {}), ctx):
                            if self._stage_pipelineable(stage, ctx):
                                x = self._pipeline_stage(stage, lp.get("1", {}), x, ctx)
                            else:
                                x = self._scan_stage(stage, lp.get("1", {}), x, ctx)
                        else:
                            x = stage(lp.get("1", {}), x, ctx)
                    x = layer.child("2", lp, x, ctx)
                features.append(x)
        return features


@MODEL.register_module()
class MSCAN_Classifier(SwitchableModel):
    def __init__(
        self,
        in_channels: int = 3,
        num_channels=(32, 64, 160, 256),
        num_blocks=(3, 3, 5, 2),
        exp_ratios=(8, 8, 4, 4),
        drop_rate: float = 0.0,
        drop_path_rate: float = 0.0,
        num_classes: int = 1000,
        init_cfg=None,
        scan_blocks: str = "auto",
        remat: bool = False,
    ):
        super().__init__(init_cfg=init_cfg)
        self.num_classes = num_classes
        self.backbone = MSCAN(
            in_channels=in_channels,
            num_channels=num_channels,
            num_blocks=num_blocks,
            exp_ratios=exp_ratios,
            drop_rate=drop_rate,
            drop_path_rate=drop_path_rate,
            scan_blocks=scan_blocks,
            remat=remat,
        )
        self.head = nn.Linear(num_channels[-1], num_classes, bias=True)

    def __call__(self, params, x, ctx: Ctx):
        x = self.child("backbone", params, x, ctx)[-1]
        x = jnp.mean(x, axis=(1, 2))  # global average pool
        return self.child("head", params, x, ctx)
