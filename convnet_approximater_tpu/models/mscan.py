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

from .stage_exec import BlockStageExec
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
    """``inner_channel`` (default: ``num_channel``) is the width of the
    gated MSCA branch between the two projections — the axis
    :class:`~convnet_approximater_tpu.core.AttnPrune` shrinks (the
    elementwise gate inside MSCA ties the branch in/out widths, so the
    whole chain rides one mask)."""

    def __init__(self, num_channel: int, k1_size: int = 5, k_sizes=(7, 11, 21),
                 inner_channel: int = None):
        super().__init__()
        self.num_channel = num_channel
        self.inner_channel = inner_channel or num_channel
        inner = self.inner_channel
        self.proj_1 = nn.Conv2d(num_channel, inner, 1)
        self.spatial_gating_unit = MSCA(inner, k1_size, k_sizes)
        self.proj_2 = nn.Conv2d(inner, num_channel, 1)

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


class MSCAN(BlockStageExec, Module):
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

    def trunk_groups(self, prefix: str = ""):
        """Residual-trunk channel groups for ``deploy.prune_trunks``.

        Each stage's width is pinned by the block residual adds, so its
        trunk is one shared-mask group: the stem/downsample's last conv
        (+BN) and every block's ``attn.proj_2`` / ``mlp.fc2`` produce it;
        every block's ``attn.proj_1`` / ``mlp.fc1`` and the next stage's
        downsample consume it; the block BNs, the stage LayerNorm, and
        the per-block layer-scale vectors slice along (``norms`` /
        ``vectors``).  The MSCA internals and FFN hiddens are untouched
        (disjoint axes — FfnPrune and the rep rewrites stack on top).
        Paths are DENSE module names: run the trunk pass before any
        substitution (the ``structure_passes`` ordering guarantees it).
        """
        groups = []
        names = [n for n, _ in self.layers.named_children()]
        for i, (name, layer) in enumerate(self.layers.named_children()):
            base = f"{prefix}layers.{name}"
            producers = ([(f"{base}.0.proj.3", f"{base}.0.proj.4")] if i == 0
                         else [(f"{base}.0.proj", f"{base}.0.norm")])
            consumers, norms, vectors, attrs = [], [], [], []
            for bname, _blk in layer[1].named_children():
                bb = f"{base}.1.{bname}"
                consumers += [f"{bb}.attn.proj_1", f"{bb}.mlp.fc1"]
                producers += [(f"{bb}.attn.proj_2", None),
                              (f"{bb}.mlp.fc2", None)]
                norms += [f"{bb}.norm1", f"{bb}.norm2"]
                vectors += [f"{bb}.layer_scale_1", f"{bb}.layer_scale_2"]
                # width attrs the prune/rep apps construct targets from
                attrs += [(bb, "num_channel"), (f"{bb}.attn", "num_channel"),
                          (f"{bb}.mlp", "num_channel")]
            norms.append(f"{base}.2")  # the stage LayerNorm
            groups.append(dict(producers=producers, consumers=consumers,
                               norms=norms, vectors=vectors, attrs=attrs))
        for i in range(len(groups) - 1):
            groups[i]["consumers"].append(
                f"{prefix}layers.{names[i + 1]}.0.proj")
        return groups

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
                        x = self._exec_stage(stage, lp.get("1", {}), x, ctx)
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

    def trunk_groups(self):
        """`deploy.prune_trunks` groups: the backbone's, plus the GAP head
        consuming the last trunk."""
        groups = self.backbone.trunk_groups(prefix="backbone.")
        groups[-1]["consumers"].append("head")
        return groups

    def __call__(self, params, x, ctx: Ctx):
        x = self.child("backbone", params, x, ctx)[-1]
        x = jnp.mean(x, axis=(1, 2))  # global average pool
        return self.child("head", params, x, ctx)

    def pipeline_units(self, variables):
        """Ordered whole-model decomposition for the heterogeneous pipeline
        (``parallel/pp_model.py``): every stem/downsample, every block
        (substituted or not — each is its own unit), every stage norm, and
        the GAP+head, whose sequential composition IS the eval forward."""
        from convnet_approximater_tpu.parallel.pp_model import (
            Unit, subtree, unit_from_module)

        params = variables.get("params", {})
        state = variables.get("state", {})

        units = []
        for lname, layer in self.backbone.layers.named_children():
            base = ("backbone", "layers", lname)
            units.append(unit_from_module(".".join(base + ("0",)), layer[0],
                                          subtree(params, *base, "0"),
                                          subtree(state, *base, "0")))
            for bname, block in layer[1].named_children():
                units.append(unit_from_module(
                    ".".join(base + ("1", bname)), block,
                    subtree(params, *base, "1", bname),
                    subtree(state, *base, "1", bname)))
            units.append(unit_from_module(".".join(base + ("2",)), layer[2],
                                          subtree(params, *base, "2"),
                                          subtree(state, *base, "2")))

        head = self.head

        def head_fn(p, s, h):
            y, _, _ = head.apply(p, jnp.mean(h, axis=(1, 2)), state=s,
                                 training=False)
            return y

        units.append(Unit("head", head_fn, subtree(params, "head"),
                          subtree(state, "head")))
        return units
