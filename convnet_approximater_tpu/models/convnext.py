"""ConvNeXt model family (tiny/small/base).

Not present in the reference (its model zoo is AlexNet + MSCAN,
``src/approx/models/__init__.py:1-5``), but ConvNeXt is the canonical
*depthwise-7x7* ConvNet — exactly the kernel shape this framework's
strip-conv machinery targets: each block's ``dwconv`` is a switchable
candidate for :class:`~convnet_approximater_tpu.core.dw_sep_rep.DwSepRep`
(per-channel SVD into rank-r (7,1)/(1,7) cascades, which the
banded-Toeplitz lowering can then run as MXU contractions instead of
VPU-bound depthwise ops).

Module naming mirrors the official ConvNeXt repo
(``downsample_layers.{0..3}``, ``stages.{s}.{i}.dwconv/norm/pwconv1/
pwconv2/gamma``, ``norm``, ``head``) so official checkpoints convert with
only the ``gamma`` leaf renamed (theirs is a bare tensor; ours lives in a
``LayerScale`` leaf module).

TPU notes: NHWC end to end — the official block's NCHW<->NHWC permutes
around LayerNorm/Linear vanish entirely; the pointwise MLP (`pwconv1/2`)
is two trailing-axis matmuls that land on the MXU; only the depthwise
7x7 is VPU-bound, which is what DwSepRep attacks.
"""

from __future__ import annotations

import jax.numpy as jnp

import convnet_approximater_tpu.nn as nn
from convnet_approximater_tpu.layers import DropPath
from convnet_approximater_tpu.nn import Ctx, Module, ModuleList

from .stage_exec import BlockStageExec
from .switchable import MODEL, SwitchableModel


class LayerScale(Module):
    """Per-channel learnable scale (the block's ``gamma``)."""

    def __init__(self, dim: int, init_value: float = 1e-6):
        super().__init__()
        self.dim = dim
        self.init_value = init_value

    def init_params(self, rng):
        return {"gamma": jnp.full((self.dim,), self.init_value, jnp.float32)}

    def __call__(self, params, x, ctx: Ctx):
        return x * params["gamma"].astype(x.dtype)


class ConvNeXtBlock(Module):
    """dw 7x7 -> LN -> 1x1 MLP (4x expand, GELU) -> gamma -> drop-path + res.

    ``hidden`` overrides the 4x MLP expansion — the structural knob
    :class:`~convnet_approximater_tpu.core.ffn_prune.MlpPrune` shrinks.
    """

    def __init__(self, dim: int, drop_path: float = 0.0,
                 layer_scale: float = 1e-6, hidden: int = None):
        super().__init__()
        self.dim = dim
        self.hidden = 4 * dim if hidden is None else hidden
        self.dwconv = nn.Conv2d(dim, dim, 7, padding=3, groups=dim)
        # official ConvNeXt LayerNorms use eps=1e-6 (not torch's 1e-5)
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.pwconv1 = nn.Linear(dim, self.hidden)
        self.act = nn.GELU()
        self.pwconv2 = nn.Linear(self.hidden, dim)
        self.gamma = LayerScale(dim, layer_scale)
        self.drop_path = DropPath(drop_path)

    def __call__(self, params, x, ctx: Ctx):
        y = self.child("dwconv", params, x, ctx)
        y = self.child("norm", params, y, ctx)
        y = self.child("pwconv1", params, y, ctx)
        y = self.child("act", params, y, ctx)
        y = self.child("pwconv2", params, y, ctx)
        y = self.child("gamma", params, y, ctx)
        return x + self.child("drop_path", params, y, ctx)


_ARCHS = {
    "tiny": ((3, 3, 9, 3), (96, 192, 384, 768)),
    "small": ((3, 3, 27, 3), (96, 192, 384, 768)),
    "base": ((3, 3, 27, 3), (128, 256, 512, 1024)),
}


@MODEL.register_module()
class ConvNeXt(BlockStageExec, SwitchableModel):
    def __init__(self, arch: str = "tiny", num_classes: int = 1000,
                 drop_path_rate: float = 0.0, layer_scale: float = 1e-6,
                 depths=None, dims=None, init_cfg=None,
                 scan_blocks: str = "auto", remat: bool = False):
        super().__init__(init_cfg=init_cfg)
        # scan/pipeline engine knobs (models/stage_exec.py) — ConvNeXt-S/B
        # carry 27-block stage 3s, the worst unrolled-compile offenders
        self.scan_blocks = scan_blocks
        self.remat = remat
        if depths is None or dims is None:
            depths, dims = _ARCHS[arch]
        depths, dims = tuple(depths), tuple(dims)
        self.depths, self.dims = depths, dims
        downs = [nn.Sequential(nn.Conv2d(3, dims[0], 4, stride=4),
                               nn.LayerNorm(dims[0], eps=1e-6))]
        for i in range(3):
            downs.append(nn.Sequential(nn.LayerNorm(dims[i], eps=1e-6),
                                       nn.Conv2d(dims[i], dims[i + 1], 2, stride=2)))
        self.downsample_layers = ModuleList(downs)
        rates = [float(r) for r in
                 jnp.linspace(0, drop_path_rate, sum(depths))]
        stages, k = [], 0
        for i in range(4):
            blocks = [ConvNeXtBlock(dims[i], rates[k + j], layer_scale)
                      for j in range(depths[i])]
            k += depths[i]
            stages.append(nn.Sequential(*blocks))
        self.stages = ModuleList(stages)
        self.norm = nn.LayerNorm(dims[-1], eps=1e-6)
        self.head = nn.Linear(dims[-1], num_classes)

    def trunk_groups(self):
        """``deploy.prune_trunks`` groups: per stage, the downsample conv
        and every block's ``pwconv2`` produce the trunk; every block's
        ``pwconv1`` and the next downsample conv consume it; the
        channel-tied dw 7x7 rides the mask as a ``depthwise``
        pass-through, block LNs + the inter-stage/final LNs slice along,
        and the ``gamma`` layer-scale vectors too.  Disjoint from
        MlpPrune's hidden axis and DwSepRep's kernel factorization."""
        groups = []
        for i in range(4):
            if i == 0:
                producers = [("downsample_layers.0.0", None)]
                norms = ["downsample_layers.0.1"]
            else:
                producers = [(f"downsample_layers.{i}.1", None)]
                norms = []
            consumers, vectors, depthwise = [], [], []
            attrs = []
            for bname, _blk in self.stages[i].named_children():
                bb = f"stages.{i}.{bname}"
                depthwise.append(f"{bb}.dwconv")
                consumers.append(f"{bb}.pwconv1")
                producers.append((f"{bb}.pwconv2", None))
                norms.append(f"{bb}.norm")
                vectors.append(f"{bb}.gamma.gamma")
                attrs.append((bb, "dim"))  # MlpPrune rebuilds from dim
            if i < 3:
                norms.append(f"downsample_layers.{i + 1}.0")
                consumers.append(f"downsample_layers.{i + 1}.1")
            else:
                norms.append("norm")
                consumers.append("head")
            groups.append(dict(producers=producers, consumers=consumers,
                               norms=norms, vectors=vectors,
                               depthwise=depthwise, attrs=attrs))
        return groups

    def __call__(self, params, x, ctx: Ctx):
        dp = params.get("downsample_layers", {})
        sp = params.get("stages", {})
        for i in range(4):
            with ctx.scope("downsample_layers"):
                x = self.downsample_layers.child(str(i), dp, x, ctx)
            with ctx.scope("stages"):
                with ctx.scope(str(i)):
                    x = self._exec_stage(self.stages[int(i)], sp.get(str(i), {}),
                                         x, ctx)
        x = x.mean(axis=(1, 2))
        x = self.child("norm", params, x, ctx)
        return self.child("head", params, x, ctx)

    def pipeline_units(self, variables):
        """Whole-model decomposition for ``parallel/pp_model.py``: each
        downsample layer, each (possibly substituted) block, and one
        GAP+norm+head tail unit."""
        from convnet_approximater_tpu.parallel.pp_model import (
            Unit, subtree, unit_from_module)

        params = variables.get("params", {})
        state = variables.get("state", {})
        units = []
        for i in range(4):
            units.append(unit_from_module(
                f"downsample_layers.{i}", self.downsample_layers[i],
                subtree(params, "downsample_layers", str(i)),
                subtree(state, "downsample_layers", str(i))))
            for bname, block in self.stages[i].named_children():
                units.append(unit_from_module(
                    f"stages.{i}.{bname}", block,
                    subtree(params, "stages", str(i), bname),
                    subtree(state, "stages", str(i), bname)))

        norm, head = self.norm, self.head

        def tail_fn(p, s, h):
            v = h.mean(axis=(1, 2))
            v, _, _ = norm.apply(p["norm"], v, training=False)
            y, _, _ = head.apply(p["head"], v, training=False)
            return y

        units.append(Unit("norm+head", tail_fn,
                          {"norm": subtree(params, "norm"),
                           "head": subtree(params, "head")}, {}))
        return units


@MODEL.register_module()
class ConvNeXtTiny(ConvNeXt):
    def __init__(self, num_classes: int = 1000, drop_path_rate: float = 0.0,
                 init_cfg=None):
        super().__init__("tiny", num_classes, drop_path_rate,
                         init_cfg=init_cfg)
