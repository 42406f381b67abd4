"""Deploy-time graph transforms (serving-only structure rewrites).

``fold_batchnorm`` folds inference-mode BatchNorm into the preceding conv's
weights — the standard serving rewrite torch/TensorRT users get from
``fuse_modules``.  Under jit the BN scale/shift cannot be constant-folded by
XLA (params are runtime arguments), and the round-2 TPU trace showed the
MSCAN stem paying two layout copies (~0.26 ms/fwd at b=64) around the
BN+GELU elementwise fusion between its convs; folding removes the BN ops
from the graph entirely instead of hoping the compiler hides them.

The transform pairs every structure edit with the matching param/state-tree
edit (the framework invariant — see ``SwitchableModel.set_switchable_module``).
It is exact algebra (modulo float rounding): only valid for inference
(``training=False``) — running stats are frozen into the weights.

Foldable sites are discovered two ways:

* adjacent ``(Conv2d, BatchNorm2d)`` children inside a ``Sequential``;
* per-class attribute patterns registered in ``FOLD_PATTERNS`` (call order
  is not discoverable from structure alone, so attribute-based modules
  opt in explicitly — e.g. MSCAN's ``DownSample`` runs ``proj`` then
  ``norm``).

Either way the conv side is resolved through composites: a substituted /
factored site (``Substitution``, LowRankExpConvV1/V2/V3, ``Sequential``
tail) folds into the terminal conv(s) that actually produce its output —
so a V3-decomposed ResNet still gets the BN-free bf16 serving surface.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

from convnet_approximater_tpu.nn import Identity, Sequential
from convnet_approximater_tpu.nn.layers import BatchNorm2d, Conv2d

# class-name -> list of (conv_attr, bn_attr) pairs where the module is known
# to call conv_attr immediately followed by bn_attr
FOLD_PATTERNS: Dict[str, List[Tuple[str, str]]] = {
    "DownSample": [("proj", "norm")],
    # ResNet family (models/resnet.py): every conv is immediately followed
    # by its BN, so the whole deploy surface folds to biased convs.
    "ResNet": [("conv1", "bn1")],
    "BasicBlock": [("conv1", "bn1"), ("conv2", "bn2")],
    "Bottleneck": [("conv1", "bn1"), ("conv2", "bn2"), ("conv3", "bn3")],
}

# class-name -> child attribute that produces the module's output, for
# composite layers that end in a single linear conv.  Lets fold_batchnorm
# fold BN *through* a substituted/factored conv site (e.g. a ResNet conv
# replaced by LowRankExpConvV3: BN folds into the trailing 1x1 mix_conv,
# enabling the BN-free bf16 serving surface on decomposed models).
FOLD_TAILS: Dict[str, str] = {
    "LowRankExpConvV1": "d_conv",   # grouped bases -> 1x1 mix (bias carrier)
    "LowRankExpConvV2": "h_conv",   # vertical -> horizontal (bias carrier)
    "LowRankExpConvV3": "mix_conv", # dense kxk basis -> 1x1 mix
    "LowRankExpConvV4": "out_conv", # Tucker-2: 1x1 -> kxk core -> 1x1
}


def _terminal_convs(model, path: str):
    """Resolve the module at ``path`` to the Conv2d(s) that produce its
    output — the valid BN fold targets.  Follows composite low-rank layers
    (``FOLD_TAILS``), ``Sequential`` tails, and BOTH live branches of a
    ``Substitution`` (each branch feeds the same BN, so each must absorb
    the fold for branch switching to stay exact).  Returns a list of dotted
    paths, or ``None`` if any leaf is not a plain Conv2d."""
    mod = model.get_submodule(path)
    if isinstance(mod, Conv2d):
        # exact class only: Conv2d subclasses with custom forward math
        # (e.g. SpaceToDepthConv) still scale per out-channel, which is all
        # the fold touches, so subclasses are fine too.
        return [path]
    name = type(mod).__name__
    if name == "Substitution":
        out = []
        for branch in ("old", "new"):
            if branch in mod._children:
                sub = _terminal_convs(model, f"{path}.{branch}")
                if sub is None:
                    return None
                out.extend(sub)
        return out or None
    tail = FOLD_TAILS.get(name)
    if tail is not None and tail in mod._children:
        return _terminal_convs(model, f"{path}.{tail}")
    if isinstance(mod, Sequential) and mod._children:
        last = list(mod._children)[-1]
        return _terminal_convs(model, f"{path}.{last}")
    return None


def _get(tree, path):
    node = tree
    for p in path:
        if not isinstance(node, dict) or p not in node:
            return None
        node = node[p]
    return node


def _pop(tree, path):
    parent = _get(tree, path[:-1])
    if isinstance(parent, dict):
        parent.pop(path[-1], None)


def _fold_pair(conv: Conv2d, conv_p: dict, bn: BatchNorm2d, bn_p: dict,
               bn_s: dict):
    """Return folded (weight, bias) in f32, cast back to the weight dtype."""
    w = conv_p["weight"]
    dtype = w.dtype
    w32 = w.astype(jnp.float32)
    scale = bn_p["scale"].astype(jnp.float32)
    shift = bn_p["bias"].astype(jnp.float32)
    mean = bn_s["mean"].astype(jnp.float32)
    var = bn_s["var"].astype(jnp.float32)
    r = scale / jnp.sqrt(var + bn.eps)  # (C_out,)
    new_w = (w32 * r[None, None, None, :]).astype(dtype)
    b0 = conv_p.get("bias")
    b032 = b0.astype(jnp.float32) if b0 is not None else jnp.zeros_like(mean)
    new_b = ((b032 - mean) * r + shift).astype(dtype)
    return new_w, new_b


def fold_batchnorm(model, variables: dict, verbose: bool = False) -> int:
    """Fold every discoverable conv->BN pair in place; returns the count.

    ``variables`` is the usual ``{"params": ..., "state": ...}`` dict; both
    trees are edited in place (BN param/state subtrees removed, conv weights
    rewritten, BN modules replaced with ``Identity``).
    """
    params = variables["params"]
    state = variables.get("state", {})
    pairs: List[Tuple[str, str]] = []  # (conv_path, bn_path) dotted

    for path, mod in list(model.named_modules()):
        def sub(name):
            return f"{path}.{name}" if path else name

        if isinstance(mod, Sequential):
            names = list(mod._children)
            for a, b in zip(names, names[1:]):
                if isinstance(mod._children[b], BatchNorm2d):
                    pairs.append((sub(a), sub(b)))
        # walk the MRO so subclasses inherit their family's patterns
        # (ResNet50's stem conv1/bn1 registers under "ResNet")
        for klass in type(mod).__mro__:
            for conv_attr, bn_attr in FOLD_PATTERNS.get(klass.__name__, ()):
                n = mod._children.get(bn_attr)
                if conv_attr in mod._children and isinstance(n, BatchNorm2d):
                    pairs.append((sub(conv_attr), sub(bn_attr)))

    n_folded = 0
    for site_path, bn_path in pairs:
        conv_paths = _terminal_convs(model, site_path)
        if conv_paths is None:
            continue  # site doesn't end in a (set of) plain conv(s)
        bn = model.get_submodule(bn_path)
        bp = _get(params, bn_path.split("."))
        bs = _get(state, bn_path.split("."))
        if bp is None or bs is None:
            continue  # already folded / structurally stale
        n_features = bp["scale"].shape[0]
        targets = []
        for conv_path in conv_paths:
            conv = model.get_submodule(conv_path)
            cp = _get(params, conv_path.split("."))
            if cp is None or cp["weight"].shape[-1] != n_features:
                targets = None
                break
            targets.append((conv, cp))
        if not targets:
            continue
        # every branch feeding the BN absorbs the same affine (valid for any
        # ``groups``: the HWIO kernel's last dim is always out_channels, and
        # BN scales per output channel)
        for conv, cp in targets:
            new_w, new_b = _fold_pair(conv, cp, bn, bp, bs)
            cp["weight"] = new_w
            cp["bias"] = new_b
            conv.use_bias = True
        model.set_submodule(bn_path, Identity())
        _pop(params, bn_path.split("."))
        _pop(state, bn_path.split("."))
        n_folded += 1
        if verbose:
            print(f"fold_batchnorm: {' + '.join(conv_paths)} <- {bn_path}")
    return n_folded


def enable_pw_matmul(model, verbose: bool = False) -> int:
    """Opt every qualifying 1x1 conv into the flattened-matmul lowering.

    The round-2c trace showed XLA's conv emitter running small-spatial 1x1
    convs (stage-3/4 FFN fc1/fc2 at 14^2/7^2) at ~6% of the bf16 MXU
    roofline (H in the lanes); ``ops/conv.py::pointwise_matmul`` tiles
    M = B*H*W properly and wins -0.13 ms on the best serving config.  The
    spatial gate (H*W <= 196, measured) lives in the lowering — this just
    sets the per-layer opt-in flag, so structure (not params) changes and
    the rewrite is trivially idempotent.  Serving surfaces call this next
    to ``fold_batchnorm``; ``CAT_PW_MATMUL`` still force-overrides.
    """
    n = 0
    for path, mod in model.named_modules():
        if (isinstance(mod, Conv2d) and mod.kernel_size == (1, 1)
                and mod.groups == 1 and mod.stride == (1, 1)
                and mod.padding == (0, 0) and mod.dilation == (1, 1)
                and not mod.pw_matmul):
            mod.pw_matmul = True
            n += 1
            if verbose:
                print(f"enable_pw_matmul: {path}")
    return n


def quantize_int8(model, variables: dict, calib_batches, filter_fn=None,
                  linears: bool = True, verbose: bool = False) -> int:
    """int8 post-training quantization of every dense conv (serving only).

    Two phases (see ``layers/quant.py`` for the scheme and the measured
    ~1.4x int8-vs-bf16 MXU rate that motivates it):

    1. **Calibrate** — flags every target conv to tap its input absmax
       (``Conv2d._calib`` -> ``ctx.tap``), then runs the (jitted) model
       over ``calib_batches`` (any iterable of input arrays) and takes the
       max per conv.  Scan-over-blocks stays ON: per-block taps escape the
       scan as stacked ys (``MSCAN._scan_stage``), so each block still
       gets its own calibrated scale without an unrolled compile.
    2. **Rewrite** — swaps each conv for ``QuantConv2d`` with int8 weights,
       per-channel weight scales and the calibrated activation scale,
       pairing the structure edit with the param-tree edit as always.

    Call AFTER ``fold_batchnorm`` (folding rewrites conv weights).  Only
    ``groups == 1`` convs quantize; ``linears=True`` (default) also
    rewrites every ``Linear`` to ``QuantLinear`` (the fc-heavy families'
    MACs live there); ``filter_fn(path, module) -> bool`` narrows the set
    further.  Returns the number of modules quantized.
    """
    from convnet_approximater_tpu.layers.quant import QuantConv2d, QuantLinear
    from convnet_approximater_tpu.nn.layers import Linear

    params = variables["params"]
    state = variables.get("state", {})

    targets = []
    for path, mod in list(model.named_modules()):
        # exact types only: Conv2d subclasses with custom forward math
        # (SpaceToDepthConv's block reshape) would lose it under the
        # generic QuantConv2d rewrite
        ok = (type(mod) is Conv2d and mod.groups == 1) \
            or (linears and type(mod) is Linear)
        if ok and (filter_fn is None or filter_fn(path, mod)):
            targets.append((path, mod))
    if not targets:
        return 0

    # -- phase 1: calibrate ------------------------------------------------
    for _, conv in targets:
        conv._calib = True
    try:
        @jax.jit
        def _calib_fwd(p, s, x):
            _, _, taps = model.apply(p, x, state=s, training=False)
            return taps

        absmax: Dict[str, float] = {}
        n_batches = 0
        for x in calib_batches:
            taps = _calib_fwd(params, state, x)
            n_batches += 1
            for path, _ in targets:
                key = f"{path}.in_absmax"
                if key not in taps:
                    raise RuntimeError(
                        f"calibration tap missing for {path} — did the "
                        f"forward reach it?")
                v = float(taps[key])
                absmax[path] = max(absmax.get(path, 0.0), v)
        if n_batches == 0:
            raise ValueError("quantize_int8 needs at least one calib batch")
    finally:
        for _, conv in targets:
            conv._calib = False

    # -- phase 2: rewrite --------------------------------------------------
    n = 0
    for path, conv in targets:
        cp = _get(params, path.split("."))
        if cp is None or "weight" not in cp:
            continue  # structurally stale (e.g. replaced by an earlier pass)
        act_scale = max(absmax[path], 1e-12) / 127.0
        if isinstance(conv, Conv2d):
            qmod, qparams = QuantConv2d.from_conv(conv, cp, act_scale)
        else:
            qmod, qparams = QuantLinear.from_linear(conv, cp, act_scale)
        model.set_submodule(path, qmod)
        parent = _get(params, path.split(".")[:-1])
        parent[path.split(".")[-1]] = qparams
        n += 1
        if verbose:
            print(f"quantize_int8: {path} (act_scale={act_scale:.3e})")
    return n


def qat_substitution_filter(model):
    """``filter_fn`` excluding modules inside ``Substitution`` branches.

    The measured disjoint-layer stacking rule (doc/serving.md): QAT covers
    the dense remainder while substitutions cover their own sites.  Shared
    by the ``PrepareQAT`` hook and ``export_model``'s structural replay so
    the training-time and export-time module selections cannot drift.
    """
    from convnet_approximater_tpu.layers.substitution import Substitution

    prefixes = tuple(path + "." for path, mod in model.named_modules()
                     if isinstance(mod, Substitution))

    def filter_fn(path, mod):
        return not path.startswith(prefixes) if prefixes else True

    return filter_fn


def prepare_qat(model, variables: dict, filter_fn=None, linears: bool = True,
                momentum: float = 0.1, verbose: bool = False) -> int:
    """Swap dense ``Conv2d``/``Linear`` modules for their fake-quant QAT
    twins (``layers/quant.py::QATConv2d/QATLinear``) so a fine-tune phase
    trains the weights *under int8 numerics* (straight-through estimator).

    The param tree is untouched (QAT twins share the dense param structure),
    so every existing trainer — L2Reconstruct's recovery protocol
    (reference ``hooks/finetune.py:95-420``) and TrainHelper — runs
    unchanged; only the *state* tree gains one ``act_absmax`` EMA-observer
    scalar per site (seeded here so the state pytree structure is stable
    across jitted train steps).  Selection matches :func:`quantize_int8`
    (dense ``groups==1`` convs; ``linears=True`` adds every ``Linear``;
    ``filter_fn(path, module)`` narrows).  Call AFTER ``fold_batchnorm``
    if the serving surface folds BN — QAT must see the folded weights.
    Returns the number of modules swapped.
    """
    from convnet_approximater_tpu.layers.quant import QATConv2d, QATLinear
    from convnet_approximater_tpu.nn.layers import Linear

    state = variables.setdefault("state", {})
    n = 0
    for path, mod in list(model.named_modules()):
        ok = (type(mod) is Conv2d and mod.groups == 1) \
            or (linears and type(mod) is Linear)
        if not ok or (filter_fn is not None and not filter_fn(path, mod)):
            continue
        if isinstance(mod, Conv2d):
            qat = QATConv2d.from_conv(mod, qat_momentum=momentum)
        else:
            qat = QATLinear.from_linear(mod, qat_momentum=momentum)
        model.set_submodule(path, qat)
        node = state
        for p in path.split("."):
            node = node.setdefault(p, {})
        node["act_absmax"] = jnp.zeros((), jnp.float32)
        n += 1
        if verbose:
            print(f"prepare_qat: {path}")
    return n


def convert_qat_to_int8(model, variables: dict, verbose: bool = False) -> int:
    """Emit the serving int8 form of a QAT-fine-tuned model.

    Each ``QATConv2d``/``QATLinear`` becomes a ``QuantConv2d``/
    ``QuantLinear`` whose activation scale is the *learned* EMA observer
    (``state[...]["act_absmax"]``) — the QAT analog of PTQ calibration,
    with quantization math bit-identical to :func:`quantize_int8`'s
    output (same per-channel weight grid, same static act scale).  The
    observer state entries are removed.  Returns the number converted.
    """
    from convnet_approximater_tpu.layers.quant import (
        QATConv2d, QATLinear, QuantConv2d, QuantLinear)

    params = variables["params"]
    state = variables.get("state", {})
    n = 0
    for path, mod in list(model.named_modules()):
        if not isinstance(mod, (QATConv2d, QATLinear)):
            continue
        parts = path.split(".")
        st = _get(state, parts)
        if st is None or "act_absmax" not in st:
            raise RuntimeError(
                f"convert_qat_to_int8: no observer state for {path} — was "
                f"the model fine-tuned (training=True) after prepare_qat?")
        absmax = float(st["act_absmax"])
        if absmax <= 0:
            raise RuntimeError(
                f"convert_qat_to_int8: observer at {path} never saw a "
                f"training batch (act_absmax=0)")
        act_scale = absmax / 127.0
        cp = _get(params, parts)
        if isinstance(mod, QATConv2d):
            qmod, qparams = QuantConv2d.from_conv(mod, cp, act_scale)
        else:
            qmod, qparams = QuantLinear.from_linear(mod, cp, act_scale)
        model.set_submodule(path, qmod)
        _get(params, parts[:-1])[parts[-1]] = qparams
        _pop(state, parts + ["act_absmax"])
        n += 1
        if verbose:
            print(f"convert_qat_to_int8: {path} (act_scale={act_scale:.3e})")
    return n


class SpaceToDepthConv(Conv2d):
    """Exact space-to-depth rewrite of a stride-2 stem conv (serving only).

    A ``Conv2d(3, C, 3, stride=2, padding=1)`` on a (B, 2h, 2w, 3) input
    wastes the MXU's 128 input lanes (C_in = 3) and forces an input layout
    copy (the round-2b trace's copy.152/copy.82).  The identical contraction
    over 2x2 pixel blocks is a ``Conv2d(12, C, 2, stride=1)`` with
    asymmetric pad (1, 0) on a (B, h, w, 12) input:

        y[o] = sum_j w[j] x[2o + j - 1]
             = w2[0, e1] blk[o-1] + w2[1, e0] blk[o] + w2[1, e1] blk[o]

    i.e. ``W2[bh, bw, (eh, ew, c), n] = W[2bh + eh - 1, 2bw + ew - 1, c, n]``
    (zero where the source index falls outside the 3x3 kernel).  The 4x
    channel width tiles the lanes properly and the reshape replaces the
    layout copy with a fusable transpose — and a serving host can deliver
    batches pre-blocked (``expects_s2d_input=True`` skips the reshape).
    """

    def __init__(self, out_channels: int):
        super().__init__(12, out_channels, 2, stride=1, padding=((1, 0), (1, 0)))
        self.expects_s2d_input = False

    @staticmethod
    def s2d(x: jnp.ndarray) -> jnp.ndarray:
        """(B, 2h, 2w, c) -> (B, h, w, 4c); channel index = (eh, ew, c)."""
        B, H, W, C = x.shape
        x = x.reshape(B, H // 2, 2, W // 2, 2, C)
        x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
        return x.reshape(B, H // 2, W // 2, 4 * C)

    @staticmethod
    def convert_weight(w: jnp.ndarray) -> jnp.ndarray:
        """HWIO (3, 3, c, N) -> (2, 2, 4c, N) per the block algebra above."""
        kh, kw, c, n = w.shape
        assert (kh, kw) == (3, 3)
        w2 = jnp.zeros((2, 2, 2, 2, c, n), w.dtype)
        for bh in range(2):
            for eh in range(2):
                src_h = 2 * bh + eh - 1
                if not 0 <= src_h < 3:
                    continue
                for bw in range(2):
                    for ew in range(2):
                        src_w = 2 * bw + ew - 1
                        if 0 <= src_w < 3:
                            w2 = w2.at[bh, bw, eh, ew].set(w[src_h, src_w])
        return w2.reshape(2, 2, 4 * c, n)

    def __call__(self, params, x, ctx):
        if not self.expects_s2d_input:
            x = self.s2d(x)
        return super().__call__(params, x, ctx)


def space_to_depth_stem(model, variables: dict, verbose: bool = False) -> int:
    """Rewrite every qualifying stride-2 3x3 first-layer conv to the
    space-to-depth form (see :class:`SpaceToDepthConv`).  Exact; serving
    only (the param tree changes shape — fold BN first if folding at all).
    Returns the number of convs rewritten."""
    params = variables["params"]
    n = 0
    for path, mod in list(model.named_modules()):
        if (type(mod) is Conv2d and mod.kernel_size == (3, 3)
                and mod.stride == (2, 2) and mod.padding == (1, 1)
                and mod.groups == 1 and mod.in_channels <= 4):
            cp = _get(params, path.split("."))
            if cp is None or "weight" not in cp:
                continue
            new = SpaceToDepthConv(mod.out_channels)
            new.in_channels = 4 * mod.in_channels
            new.use_bias = "bias" in cp
            cp["weight"] = SpaceToDepthConv.convert_weight(cp["weight"])
            model.set_submodule(path, new)
            n += 1
            if verbose:
                print(f"space_to_depth_stem: {path}")
    return n


def rematerialize_dense(module, params: dict):
    """Exact dense ``Conv2d`` equivalent of a low-rank target layer.

    ``W = A·B`` re-materialization (VERDICT r2 #2): the factored layers are
    linear, so the dense kernel they represent can be rebuilt exactly —

    * ``LowRankExpConvV1`` (grouped ``s_conv`` + 1x1 ``d_conv``):
      ``W[u,v,c,n] = sum_m s[u,v,0,c*M+m] * d[c*M+m,n]``
    * decomposed (``SeparableConv`` strips): the rank-1 outer product
      ``v ⊗ h`` substitutes for ``s`` per output channel
    * ``LowRankExpConvV2`` (dense vertical C->M, horizontal M->N):
      ``W[u,v,c,n] = sum_m V[u,c,m] * H[v,m,n]``

    Returns ``(Conv2d, params)`` or ``None`` if the module is not a
    re-materializable low-rank layer (e.g. the ``grouped=True`` V2 parity
    shape, which has no dense N-output equivalent).  Math in f32, cast back
    to the stored dtype.  The compressed checkpoint keeps the factors; this
    only changes the *serving* execution form.
    """
    from convnet_approximater_tpu.layers import (
        LowRankExpConvV1,
        LowRankExpConvV2,
    )
    from convnet_approximater_tpu.layers.low_rank_conv import SeparableConv

    if isinstance(module, LowRankExpConvV1):
        C, N, M = module.in_channels, module.out_channels, module.num_base
        kh, kw = module.kernel_size
        d = params["d_conv"]["weight"].astype(jnp.float32)  # (1,1,C*M,N)
        dtype = params["d_conv"]["weight"].dtype
        d2 = d[0, 0].reshape(C, M, N)
        if isinstance(module.s_conv, SeparableConv):
            v = params["s_conv"]["v_conv"]["weight"].astype(jnp.float32)
            h = params["s_conv"]["h_conv"]["weight"].astype(jnp.float32)
            v2 = v[:, 0, 0, :].reshape(kh, C, M)
            h2 = h[0, :, 0, :].reshape(kw, C, M)
            W = jnp.einsum("ucm,vcm,cmn->uvcn", v2, h2, d2)
        else:
            s = params["s_conv"]["weight"].astype(jnp.float32)  # (kh,kw,1,C*M)
            s2 = s[:, :, 0, :].reshape(kh, kw, C, M)
            W = jnp.einsum("uvcm,cmn->uvcn", s2, d2)
        bias = params["d_conv"].get("bias")
        conv = Conv2d(C, N, (kh, kw), stride=module.stride,
                      padding=module.padding, bias=bias is not None)
        new_p = {"weight": W.astype(dtype)}
        if bias is not None:
            new_p["bias"] = bias
        return conv, new_p

    from convnet_approximater_tpu.layers import LowRankExpConvV3

    if isinstance(module, LowRankExpConvV3):
        C, N = module.in_channels, module.out_channels
        kh, kw = module.kernel_size
        b_w = params["basis_conv"]["weight"].astype(jnp.float32)  # (kh,kw,C,r)
        m_w = params["mix_conv"]["weight"].astype(jnp.float32)    # (1,1,r,N)
        dtype = params["mix_conv"]["weight"].dtype
        W = jnp.einsum("uvcr,rn->uvcn", b_w, m_w[0, 0])
        bias = params["mix_conv"].get("bias")
        conv = Conv2d(C, N, (kh, kw), stride=module.stride,
                      padding=module.padding, bias=bias is not None)
        new_p = {"weight": W.astype(dtype)}
        if bias is not None:
            new_p["bias"] = bias
        return conv, new_p

    from convnet_approximater_tpu.layers import LowRankExpConvV4

    if isinstance(module, LowRankExpConvV4):
        C, N = module.in_channels, module.out_channels
        kh, kw = module.kernel_size
        ci = params["in_conv"]["weight"].astype(jnp.float32)    # (1,1,C,r1)
        g = params["core_conv"]["weight"].astype(jnp.float32)   # (kh,kw,r1,r2)
        co = params["out_conv"]["weight"].astype(jnp.float32)   # (1,1,r2,N)
        dtype = params["out_conv"]["weight"].dtype
        W = jnp.einsum("ca,uvab,bn->uvcn", ci[0, 0], g, co[0, 0])
        bias = params["out_conv"].get("bias")
        conv = Conv2d(C, N, (kh, kw), stride=module.stride,
                      padding=module.padding, bias=bias is not None)
        new_p = {"weight": W.astype(dtype)}
        if bias is not None:
            new_p["bias"] = bias
        return conv, new_p

    if isinstance(module, LowRankExpConvV2):
        if module.grouped:
            return None  # reference parity shape: no dense N-out equivalent
        C, N = module.in_channels, module.out_channels
        v = params["v_conv"]["weight"].astype(jnp.float32)  # (kh,1,C,M)
        h = params["h_conv"]["weight"].astype(jnp.float32)  # (1,kw,M,N)
        dtype = params["h_conv"]["weight"].dtype
        kh, kw = v.shape[0], h.shape[1]
        W = jnp.einsum("ucm,vmn->uvcn", v[:, 0], h[0])
        sh, sw = module.v_conv.stride[0], module.h_conv.stride[1]
        ph, pw = module.v_conv.padding[0], module.h_conv.padding[1]
        bias = params["h_conv"].get("bias")
        conv = Conv2d(C, N, (kh, kw), stride=(sh, sw), padding=(ph, pw),
                      bias=bias is not None)
        new_p = {"weight": W.astype(dtype)}
        if bias is not None:
            new_p["bias"] = bias
        return conv, new_p

    # DwSepRep targets: depthwise separable cascades merge back to one
    # dense depthwise kernel, W_c = sum_j w2_j[:,c] (outer) w1_j[:,c] —
    # exact only when the first convs are bias-free (else the merge needs
    # border residuals; DwSepRep always builds first_bias=False).
    from convnet_approximater_tpu.layers import CascadeConv, ParallelConv

    def _merge_cascades(dim, pairs):
        # pairs: [(cascade_params, kernel_size, padding)] with equal k
        W = None
        bias = None
        for cp, k, pad in pairs:
            if "bias" in cp["conv1"]:
                return None
            w1 = cp["conv1"]["weight"].astype(jnp.float32)  # (1,k,1,C)
            w2 = cp["conv2"]["weight"].astype(jnp.float32)  # (k,1,1,C)
            Wj = w2[:, 0, 0, :][:, None, :] * w1[0, :, 0, :][None, :, :]
            W = Wj if W is None else W + Wj
            b = cp["conv2"].get("bias")
            if b is not None:
                bias = b if bias is None else bias + b
        dtype = pairs[0][0]["conv2"]["weight"].dtype
        conv = Conv2d(dim, dim, (k, k), padding=pad, groups=dim,
                      bias=bias is not None)
        new_p = {"weight": W[:, :, None, :].astype(dtype)}
        if bias is not None:
            new_p["bias"] = bias.astype(dtype)
        return conv, new_p

    if isinstance(module, CascadeConv):
        if module.conv1.stride != (1, 1) or module.conv2.stride != (1, 1):
            return None
        return _merge_cascades(
            module.dim,
            [(params, module.kernel_size, module.conv2.padding[0])])
    if isinstance(module, ParallelConv):
        branches = list(module.branches.named_children())
        if not all(isinstance(b, CascadeConv) for _, b in branches):
            return None  # identity branch (MSCA bank) — not a plain conv
        ks = {b.kernel_size for _, b in branches}
        if len(ks) != 1:
            return None
        pairs = [(params["branches"][n], b.kernel_size, b.conv2.padding[0])
                 for n, b in branches]
        return _merge_cascades(module.dim, pairs)

    return None


def never_lose_deploy(model, variables: dict, input_shape, dtype=jnp.float32,
                      num_iters: int = 10, margin: float = 0.03,
                      greedy: bool = True, time_fn=None,
                      verbose: bool = True) -> dict:
    """Per-layer deploy arbiter: decomposed execution only where it WINS.

    The reference shipped its decomposed models 2x slower on GPU
    (``/root/reference/doc/low-rank-exp/low-rank-exp.md:51-53``); scheme-1 on
    TPU still loses wall-clock at AlexNet/VGG shapes even though MSCA-rep
    wins.  This arbiter guarantees a deployed model is never slower than the
    dense original: every low-rank layer whose decomposed form does not pay
    for itself at the MODEL level (isolated per-layer probes mislead —
    doc/perf-notes.md, measured three times) is re-materialized to its exact
    dense kernel via :func:`rematerialize_dense`.  The compressed checkpoint
    is unchanged — only the serving execution form switches.

    Protocol: time the fully-decomposed model, re-materialize everything and
    time the all-dense form; if decomposed already wins, restore it whole.
    Otherwise (``greedy=True``) re-enable decomposition one layer at a time,
    keeping only model-level wins beyond ``margin`` (relative; relay noise is
    ±0.1 ms).  O(L) compiles — a one-shot deploy cost.

    ``time_fn(model, variables, input_shape, dtype) -> seconds`` is injectable
    for tests; the default is the slope-timing ``time_forward``.

    Returns a decision dict: per-layer table + the timings, and edits
    ``model``/``variables`` in place to the chosen configuration.
    """
    if time_fn is None:
        from convnet_approximater_tpu.hooks.inference_time_hook import (
            time_forward,
        )

        def time_fn(m, v, shape, dt):
            _, _, times = time_forward(m, v, shape, num_iters=num_iters,
                                       warmup=2, dtype=dt)
            return float(times.mean())

    params = variables["params"]
    # discover re-materializable switchable layers
    sites = []  # (idx, name, lowrank_module, lowrank_params, dense_mod, dense_p)
    for idx in range(model.length_switchable):
        name = model.switchable_names[idx]
        mod = model.get_switchable_module(idx)
        sub_p = _get(params, name.split("."))
        out = rematerialize_dense(mod, sub_p) if isinstance(sub_p, dict) else None
        if out is not None:
            sites.append((idx, name, mod, sub_p, out[0], out[1]))
    result = dict(t_decomposed=None, t_dense=None, layers=[], kept_decomposed=0)
    if not sites:
        return result

    def set_site(site, dense: bool):
        idx, name, lr_mod, lr_p, d_mod, d_p = site
        mod, p = (d_mod, d_p) if dense else (lr_mod, lr_p)
        model.set_switchable_module(idx, mod, variables, {"params": p})

    t_dec = time_fn(model, variables, input_shape, dtype)
    for site in sites:
        set_site(site, dense=True)
    t_dense = time_fn(model, variables, input_shape, dtype)
    result["t_decomposed"], result["t_dense"] = t_dec, t_dense
    if verbose:
        from convnet_approximater_tpu.utils.logger import get_logger

        get_logger().info(
            f"never_lose_deploy: decomposed {t_dec * 1e3:.3f} ms vs dense "
            f"{t_dense * 1e3:.3f} ms ({len(sites)} low-rank layers)")

    if t_dec < t_dense * (1.0 - margin):
        for site in sites:  # decomposed wins whole — restore it
            set_site(site, dense=False)
        result["layers"] = [dict(name=s[1], kept="decomposed") for s in sites]
        result["kept_decomposed"] = len(sites)
        result["t_final"] = t_dec
        return result

    # dense baseline guarantees >=1.0x; greedily re-admit individual winners
    t_best = t_dense
    for site in sites:
        kept = "dense"
        if greedy:
            set_site(site, dense=False)
            t_try = time_fn(model, variables, input_shape, dtype)
            if t_try < t_best * (1.0 - margin):
                t_best, kept = t_try, "decomposed"
                result["kept_decomposed"] += 1
            else:
                set_site(site, dense=True)
        result["layers"].append(dict(name=site[1], kept=kept))
        if verbose:
            from convnet_approximater_tpu.utils.logger import get_logger

            get_logger().info(f"never_lose_deploy: {site[1]} -> {kept} "
                              f"(best {t_best * 1e3:.3f} ms)")
    result["t_final"] = t_best
    return result


def arbitrated_apply(model, variables: dict, app, filters, input_shape,
                     dtype=jnp.float32, rng=None, num_iters: int = 10,
                     margin: float = 0.03, greedy: bool = True,
                     time_fn=None, group_fn=None, verbose: bool = True,
                     decisions: dict = None, decisions_path: str = None,
                     retime: bool = False,
                     boundary_band: float = 0.02) -> dict:
    """Measured per-site substitution: apply ``app`` only where it WINS.

    Generalizes :func:`never_lose_deploy` from "decomposed vs derived dense
    re-materialization" to ANY approximater: each site's baseline form is its
    ORIGINAL module + param/state subtrees, snapshotted before substitution,
    so no inverse (``rematerialize_dense``) is needed.  Built for the exact
    rewrites (``FfnRep``, ``MscaRep``, BN-type-agnostic merges) where both
    forms compute the same function and only wall-clock differs — the
    motivating measurement is MSCAN-S f32 FfnRep: the merge wins on stage 1
    (10.81 ms) and loses with stage 2 added (11.04 ms) while MSCAN-t keeps
    all six (doc/perf-notes.md round-4 "exact-rewrite transfer"), a
    per-family hand tuning this arbiter automates.  Mirrors the reference's
    per-layer ``IndicesFilter`` workflow
    (``/root/reference/src/approx/filters/indices_filter.py``) with the index
    choice made by measurement instead of by hand.

    Protocol (same shape as ``never_lose_deploy``): substitute every
    registered site, time the model; restore every site, time the baseline;
    whole-model win beyond ``margin`` keeps everything substituted, else
    (``greedy=True``) re-apply one site at a time keeping model-level wins.
    O(L) compiles, a one-shot deploy cost.  Edits ``model``/``variables`` in
    place; returns the per-site decision table and timings.

    ``group_fn(site_name) -> key`` coarsens the greedy unit: sites sharing a
    key toggle together (one timing per GROUP, not per site).  The measured
    decisions are stage-granular on every family probed (MSCAN-t keeps
    stages 1-2, MSCAN-S stage 1 only, SegNeXt@512² none), so grouping by
    stage prefix cuts 13 compiles to 4 on MSCAN-t with no decision lost.

    Note on accuracy: unlike ``never_lose_deploy`` this arbiter is also
    usable with LOSSY apps (V1/V3/V4) — but then "restore" means *undoing
    the compression*, so only use it with lossy apps when the goal is pure
    speed (the checkpoint keeps whichever form each site landed on).

    Determinism (VERDICT r4 #5): repeated arbiter runs can keep DIFFERENT
    structures when a site's timing sits at a decision boundary (relay
    drift is ±0.1 ms).  Two defenses, persistence being the default:

    * ``decisions`` / ``decisions_path``: a ``{site_name: 'applied' |
      'original'}`` table.  When given (or when ``decisions_path`` exists
      and ``retime`` is False) the table is REPLAYED — no timing at all,
      identical structure every run.  After a measured run the table is
      written to ``decisions_path``, so the first call measures and every
      later call replays (the ``never_lose_decisions.json`` pattern).
    * ``boundary_band``: a greedy group whose timing lands within this
      relative band of the keep/reject threshold is re-measured once and
      decided on the min — the variance guard for boundary sites.
    """
    import json as _json
    import os as _os
    from convnet_approximater_tpu.nn.module import _stable_fold
    from convnet_approximater_tpu.utils.serialize import tree_get

    if time_fn is None:
        from convnet_approximater_tpu.hooks.inference_time_hook import (
            time_forward,
        )

        def time_fn(m, v, shape, dt):
            _, _, times = time_forward(m, v, shape, num_iters=num_iters,
                                       warmup=2, dtype=dt)
            return float(times.mean())

    rng = rng if rng is not None else jax.random.key(0)
    model.register_switchable(app.src_type, list(filters))

    def _copy(tree):
        # fresh containers, same (immutable) array leaves
        return jax.tree_util.tree_map(lambda a: a, tree)

    def _site_state(name):
        try:
            return _copy(tree_get(variables.get("state", {}), name))
        except KeyError:
            return {}

    if decisions is None and decisions_path and not retime \
            and _os.path.exists(decisions_path):
        with open(decisions_path) as f:
            decisions = _json.load(f)

    result = dict(t_applied=None, t_original=None, t_final=None, layers=[],
                  kept_applied=0)

    if decisions is not None:
        # deterministic replay: no timing, and the (possibly expensive —
        # ALS/data-driven solves) app pipeline runs ONLY at sites the
        # table keeps; 'original' sites are never touched at all.
        # Timing fields stay None — check result['replayed'].
        for idx in range(model.length_switchable):
            name = model.switchable_names[idx]
            kept = decisions.get(name, "original")
            if kept == "applied":
                src = model.get_switchable_module(idx)
                sub, sp = app.initialize(
                    src, tree_get(variables["params"], name),
                    _stable_fold(rng, name))
                model.set_switchable_module(idx, sub, variables,
                                            {"params": sp})
                app.optimize(sub, sp)
                mod, np_ = app.postprocess(sub, sp)
                model.set_switchable_module(idx, mod, variables,
                                            {"params": np_})
            result["layers"].append(dict(name=name, kept=kept))
            result["kept_applied"] += int(kept == "applied")
        result["replayed"] = True
        result["decisions"] = {r["name"]: r["kept"]
                               for r in result["layers"]}
        # logged even with verbose=False: whether a surface was replayed
        # or re-measured changes what its published numbers MEAN, so the
        # provenance must be visible in every log (r5: the bench replay
        # run could not be confirmed from its own output)
        from convnet_approximater_tpu.utils.logger import get_logger

        get_logger().info(
            f"arbitrated_apply[{type(app).__name__}]: replayed "
            f"{result['kept_applied']}/{len(result['layers'])} applied "
            f"from persisted decisions (pass retime=True to re-measure)")
        return result

    # snapshot originals, then substitute every site (the canonical 4-phase
    # loop of deploy_planner.apply_app, recording both forms per site)
    sites = []  # (idx, name, orig_mod, orig_p, orig_s, new_mod, new_p)
    for idx in range(model.length_switchable):
        name = model.switchable_names[idx]
        src = model.get_switchable_module(idx)
        orig_p = _copy(tree_get(variables["params"], name))
        orig_s = _site_state(name)
        sub, sp = app.initialize(src, tree_get(variables["params"], name),
                                 _stable_fold(rng, name))
        model.set_switchable_module(idx, sub, variables, {"params": sp})
        app.optimize(sub, sp)
        mod, np_ = app.postprocess(sub, sp)
        model.set_switchable_module(idx, mod, variables, {"params": np_})
        sites.append((idx, name, src, orig_p, orig_s, mod, np_))

    if not sites:
        return result

    def set_site(site, applied: bool):
        idx, name, orig_mod, orig_p, orig_s, new_mod, new_p = site
        if applied:
            model.set_switchable_module(idx, new_mod, variables,
                                        {"params": new_p})
        else:
            model.set_switchable_module(idx, orig_mod, variables,
                                        {"params": orig_p, "state": orig_s})

    def _finish(result):
        result["decisions"] = {r["name"]: r["kept"]
                               for r in result["layers"]}
        if decisions_path:
            with open(decisions_path, "w") as f:
                _json.dump(result["decisions"], f, indent=2, sort_keys=True)
        return result

    t_app = time_fn(model, variables, input_shape, dtype)
    for site in sites:
        set_site(site, applied=False)
    t_orig = time_fn(model, variables, input_shape, dtype)
    result["t_applied"], result["t_original"] = t_app, t_orig
    if verbose:
        from convnet_approximater_tpu.utils.logger import get_logger

        get_logger().info(
            f"arbitrated_apply[{type(app).__name__}]: applied "
            f"{t_app * 1e3:.3f} ms vs original {t_orig * 1e3:.3f} ms "
            f"({len(sites)} sites)")

    if t_app < t_orig * (1.0 - margin):
        for site in sites:  # substitution wins whole — restore it
            set_site(site, applied=True)
        result["layers"] = [dict(name=s[1], kept="applied") for s in sites]
        result["kept_applied"] = len(sites)
        result["t_final"] = t_app
        return _finish(result)

    if group_fn is None:
        groups = [[s] for s in sites]
    else:
        keyed = {}
        for s in sites:
            keyed.setdefault(group_fn(s[1]), []).append(s)
        groups = list(keyed.values())

    t_best = t_orig
    for group in groups:
        kept = "original"
        if greedy:
            for site in group:
                set_site(site, applied=True)
            t_try = time_fn(model, variables, input_shape, dtype)
            # variance guard: a decision within boundary_band of the
            # threshold is re-measured once and taken at the min (relay
            # drift flips boundary sites run-to-run otherwise)
            threshold = t_best * (1.0 - margin)
            if abs(t_try - threshold) <= boundary_band * t_best:
                t_try = min(t_try, time_fn(model, variables, input_shape,
                                           dtype))
            if t_try < t_best * (1.0 - margin):
                t_best, kept = t_try, "applied"
                result["kept_applied"] += len(group)
            else:
                for site in group:
                    set_site(site, applied=False)
        result["layers"].extend(dict(name=s[1], kept=kept) for s in group)
        if verbose:
            from convnet_approximater_tpu.utils.logger import get_logger

            names = ",".join(s[1] for s in group)
            get_logger().info(f"arbitrated_apply: {names} -> {kept} "
                              f"(best {t_best * 1e3:.3f} ms)")
    result["t_final"] = t_best
    return _finish(result)


def compile_serving(fn, *example_args):
    """Compile ``fn`` with XLA-chosen (AUTO) input layouts for serving.

    The round-2b trace showed the jitted forward paying an on-device layout
    copy of the input batch (copy.152: the NHWC batch arrives in the default
    row-major layout but the stem conv wants a tiled batch-in-lanes form).
    A serving session can instead let XLA pick every input's preferred
    layout at compile time and place host batches straight into it —
    the transfer then lands pre-formatted and the copy disappears.

    Returns ``(compiled, put)``: ``compiled(*args)`` is the executable and
    ``put(*args)`` device-puts positional args into the chosen formats
    (weights/state once at session setup; each input batch on arrival).

    Caveat (measured on the axon v5e relay): ``jax.device_put`` cannot
    honor every AUTO-chosen layout on the host->device transfer path —
    e.g. a batch-minor ``(1,2,3,0)`` input layout with ``(4,128)`` tiling
    lands in a different format than requested.  ``put`` verifies what
    actually landed and falls back to an on-device relayout (a jitted
    identity with ``out_shardings=<format>``) for any leaf the transfer
    could not format — still correct, and weights only pay it once.
    """
    from jax.experimental.layout import Format, Layout

    auto = Format(Layout.AUTO)
    jitted = jax.jit(fn, in_shardings=auto)
    compiled = jitted.lower(*example_args).compile()
    formats = compiled.input_formats[0]

    def _put_leaf(a, f):
        out = jax.device_put(a, f)
        if getattr(out, "format", None) != f:
            out = jax.jit(lambda t: t, out_shardings=f)(out)
        return out

    def put(*args):
        return jax.tree_util.tree_map(_put_leaf, list(args), list(formats))

    return compiled, put


def export_serving(fn, example_args, path=None, platforms=None,
                   symbolic_batch: bool = False):
    """Serialize a serving forward to a portable StableHLO artifact.

    ``jax.export`` traces ``fn`` once (static shapes — the serving contract
    anyway) and serializes the StableHLO module with its calling convention;
    the artifact runs on any machine with a jax runtime WITHOUT the model
    code, config tree, or checkpoint loader — the TPU-native analog of the
    reference exporting a TorchScript/ONNX bundle (it had none; deploy there
    meant re-running the Python stack, ``runner/class_inference.py``).

    Args:
      fn: jittable ``(params, state, x) -> logits`` (or any signature).
      example_args: positional example inputs fixing shapes/dtypes.
      path: optional file to write the serialized bytes to.
      platforms: lowering platforms, e.g. ``("tpu", "cpu")`` for an artifact
        that runs on both; default = current backend only.
      symbolic_batch: when True, the LAST example arg (the input batch) is
        exported with a symbolic leading dim — ONE artifact serves any
        batch size (shape-polymorphic StableHLO; XLA still specializes at
        first call per concrete size, cheap under the persistent cache).

    Returns the serialized ``bytes``.
    """
    from jax import export as jax_export

    if symbolic_batch:
        b = jax_export.symbolic_shape("b")[0]
        example_args = tuple(example_args)
        spec = jax.tree_util.tree_map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), example_args)
        x = spec[-1]  # the input batch must be a bare array, not a pytree
        spec = spec[:-1] + (jax.ShapeDtypeStruct((b,) + x.shape[1:], x.dtype),)
        example_args = spec
    exp = jax_export.export(jax.jit(fn), platforms=platforms)(*example_args)
    data = exp.serialize()
    if path is not None:
        with open(path, "wb") as f:
            f.write(data)
    return data


def load_serving(path_or_bytes):
    """Load an :func:`export_serving` artifact; returns a callable.

    The callable accepts the same positional pytrees the exported ``fn``
    did and re-jits around the deserialized StableHLO (``Exported.call``),
    so it composes with device placement and further jit like any jax
    function.

    Perf note (measured r3f, ResNet-50 int8 b=64): the bare ``.call``
    dispatches ~2x slower than a live-jitted forward (3.1 -> 6.1 ms) —
    per-call staging around the deserialized module.  Wrapping it in
    ``jax.jit`` (done here) recovers the gap after the first call; the
    artifact's value is portability/versioning, the persistent compile
    cache already makes live re-jit cheap."""
    import jax as _jax
    from jax import export as jax_export

    data = path_or_bytes
    if not isinstance(data, (bytes, bytearray)):
        with open(data, "rb") as f:
            data = f.read()
    exp = jax_export.deserialize(bytearray(data))
    fn = _jax.jit(exp.call)
    # expose the exported calling convention: servers need the input
    # dtype/shape contract (e.g. an int8-quantized tree keeps no >=2-D
    # float leaves to infer the activation dtype from)
    fn.in_avals = exp.in_avals
    fn.out_avals = exp.out_avals
    return fn


def pad_batch(fn, min_batch: int = 2):
    """Serving wrapper: run sub-``min_batch`` inputs at ``min_batch``.

    b=1 can hit degenerate batch tiling on the v5e (the batch dim can't
    fill sublanes): measured (r3f, b=1 direct vs padded-to-2) MSCAN-t best
    serving 2.51 -> 1.79 ms (-29%) and ResNet-50 int8 1.21 -> ~0.60 ms
    (b=2 runs 2x faster than b=1).  It is MODEL-DEPENDENT — ResNet-18
    int8 shows NO penalty (0.451 ms at b=1) — so probe the surface before
    enabling.  The wrapper tiles the input batch up to ``min_batch`` rows
    and slices the outputs back; the last positional argument is the input
    batch.  Shape dispatch happens host-side, so each distinct batch size
    still compiles once (persistent cache).

    Contract: every output leaf must carry the batch as its leading dim
    (the standard serving forward). Batch-free aux leaves (scalars, state)
    would otherwise be silently truncated — asserted per leaf.
    """

    def wrapped(*args):
        x = args[-1]
        b = x.shape[0]
        if b >= min_batch:
            return fn(*args)
        reps = -(-min_batch // b)
        xp = jnp.concatenate([x] * reps, axis=0)[:min_batch]
        y = fn(*args[:-1], xp)

        def _slice(a):
            if getattr(a, "ndim", 0) < 1 or a.shape[0] != min_batch:
                raise ValueError(
                    f"pad_batch: output leaf of shape "
                    f"{getattr(a, 'shape', ())} has no leading batch dim "
                    f"== {min_batch}; pad_batch only wraps forwards whose "
                    f"outputs are all batch-major")
            return a[:b]

        return jax.tree_util.tree_map(_slice, y)

    return wrapped


def pad_batch_to_multiple(fn, multiple: int):
    """Serving wrapper: pad any batch up to the next multiple of ``multiple``.

    Data-parallel serving shards the batch over the mesh's data axis, which
    requires ``b % n_devices == 0`` at ``device_put`` time; a request (or a
    ``chunk_batch`` remainder chunk) of any other size would crash there.
    Tiles the input rows up to the next multiple and slices every output
    leaf back (same batch-major output contract as ``pad_batch``).  Shape
    dispatch is host-side; each distinct padded size compiles once.
    """
    if multiple < 1:
        raise ValueError(f"pad_batch_to_multiple: multiple={multiple}")

    def wrapped(*args):
        x = args[-1]
        b = x.shape[0]
        bp = -(-b // multiple) * multiple
        if bp == b:
            return fn(*args)
        reps = -(-bp // b)
        xp = jnp.concatenate([x] * reps, axis=0)[:bp]
        y = fn(*args[:-1], xp)

        def _slice(a):
            if getattr(a, "ndim", 0) < 1 or a.shape[0] != bp:
                raise ValueError(
                    f"pad_batch_to_multiple: output leaf of shape "
                    f"{getattr(a, 'shape', ())} has no leading batch dim "
                    f"== {bp}; only batch-major forwards can be wrapped")
            return a[:b]

        return jax.tree_util.tree_map(_slice, y)

    return wrapped


def chunk_batch(fn, max_batch: int = 128):
    """Serving wrapper: run over-``max_batch`` inputs as sequential chunks.

    The dual of :func:`pad_batch`, for the other end of the batch sweep:
    past the throughput knee, per-image cost RISES supra-linearly — the
    r4 ConvNeXt-T trace attributes the b=256 regression (12.7k vs 14.0k
    img/s at b=128) to the elementwise loop fusions scaling 3.08x for a
    2x batch (HBM-side; conv fusions scale ~2.06x).  Two b=128 chunks run
    2 x 9.14 = 18.3 ms vs 20.2 ms monolithic (-9.4%) — chunking at the
    measured knee converts the sweep's knee into the large-batch rate.

    Splits the LAST positional argument (the input batch) into
    ``ceil(b / max_batch)`` chunks — all of size ``max_batch`` except a
    smaller final remainder (each distinct remainder size compiles once,
    persistent cache) — and concatenates outputs along the leading axis.
    Same batch-major output contract as ``pad_batch``, asserted per leaf.
    Compose as ``chunk_batch(pad_batch(fn, 2), knee)`` to clamp both ends
    (pad inside chunk, so a size-1 remainder chunk still gets padded).
    """

    def wrapped(*args):
        x = args[-1]
        b = x.shape[0]
        if b <= max_batch:
            return fn(*args)
        ys = [fn(*args[:-1], x[i:i + max_batch])
              for i in range(0, b, max_batch)]

        def _cat(*leaves):
            for a, xin in zip(leaves, range(0, b, max_batch)):
                n = min(max_batch, b - xin)
                if getattr(a, "ndim", 0) < 1 or a.shape[0] != n:
                    raise ValueError(
                        f"chunk_batch: output leaf of shape "
                        f"{getattr(a, 'shape', ())} has no leading batch "
                        f"dim == {n}; chunk_batch only wraps forwards "
                        f"whose outputs are all batch-major")
            return jnp.concatenate(leaves, axis=0)

        return jax.tree_util.tree_map(_cat, *ys)

    return wrapped


# class-name -> (producer_attr, (bn_attrs...), consumer_attr) junctions whose
# hidden width is free to prune (the block's I/O channels are pinned by the
# residual, its INTERNAL width is not) — the attribute-pattern analog of
# PRUNE-by-Sequential-adjacency below, mirroring FOLD_PATTERNS' design.
PRUNE_PATTERNS: Dict[str, List[Tuple[str, Tuple[str, ...], str]]] = {
    "BasicBlock": [("conv1", ("bn1",), "conv2")],
    "Bottleneck": [("conv1", ("bn1",), "conv2"),
                   ("conv2", ("bn2",), "conv3")],
}


def _prune_round(k: int, M: int, round_to) -> int:
    if not round_to or M <= round_to:
        return max(1, min(k, M))
    return min(M, max(round_to, int(round(k / round_to)) * round_to))


def _patch_moments(x, kh: int, kw: int):
    """Uncentered patch second moment AND mean: x (B, H, W, C) ->
    (G (D, D), mu (D,)) with the flat index (c, u, v) = c*kh*kw + u*kw + v
    — the order an OIHW kernel flattens to (same convention as
    ``hooks.calibration.patch_second_moment``)."""
    B, H, W, C = x.shape
    Ho, Wo = H - kh + 1, W - kw + 1
    wins = jnp.stack(
        [jnp.stack([x[:, i:i + Ho, j:j + Wo, :] for j in range(kw)], axis=3)
         for i in range(kh)], axis=3)  # (B, Ho, Wo, kh, kw, C)
    v = jnp.transpose(wins, (0, 1, 2, 5, 3, 4)).reshape(
        B * Ho * Wo, C * kh * kw)
    return (v.T @ v) / v.shape[0], jnp.mean(v, axis=0)


def prune_chains(model, variables: dict, keep_ratio: float,
                 round_to: int = 128, filter_fn=None,
                 calib_batches=None, ridge: float = 1e-6,
                 dry_run: bool = False, verbose: bool = False) -> int:
    """Cross-layer structured channel pruning of producer->consumer pairs.

    The deploy-pass form of He et al.'s ICCV'17 channel pruning for the
    families whose width lives BETWEEN layers rather than inside an MLP
    block (VGG/AlexNet conv stacks and classifier Linears, ResNet block
    internals) — the per-module ``FfnPrune``/``MlpPrune`` apps cannot
    express a junction that spans two switchable sites, so this walks the
    structure like ``fold_batchnorm`` does and edits both trees in place:

    * adjacent pairs inside a ``Sequential`` whose intermediates are
      channel-preserving (ReLU/GELU/Dropout/MaxPool/AdaptiveAvgPool, plus
      BatchNorm2d which is sliced along with the junction; LayerNorm /
      GroupNorm COUPLE channels through their normalizer, so they break
      the chain);
    * per-class attribute patterns in ``PRUNE_PATTERNS`` (ResNet blocks:
      the residual pins block I/O, the internal width is free).

    Selection is by weight-norm product ``||W_a[m]|| * g_m * ||W_b[m]||``
    with ``g`` the absorbed BN gain ``|scale|/sqrt(var+eps)``; with
    ``calib_batches`` the full He et al. data-driven recipe runs instead:
    each consumer's INPUT is tapped on the calibration batches
    (``_capture_in``, one jitted pass), channels rank by their measured
    contribution ``Var[x_m] * ||W_b[m]||^2``, and the consumer kernel is
    REFIT in closed form over the kept channels — least squares on the
    patch second moment (conv: the (C*kh*kw)^2 Gram in OIHW flat order;
    Linear: the plain input Gram) with an intercept row that absorbs the
    dropped channels' means into the consumer bias.  Either way the
    recovery fine-tune (CE/KD from the pruned init) is the accuracy
    story, exactly like the factorization apps.  ``round_to`` snaps kept
    widths to MXU tile multiples (measured rule, doc/perf-notes.md r4d);
    junctions whose snapped k equals M are skipped.  Producer out dims,
    intermediate BN features, and consumer in dims shrink together, so
    the model stays exact-shaped for every later pass (fold, cast, int8,
    export).  Returns the number of junctions pruned.
    """
    import numpy as np

    from convnet_approximater_tpu.nn.layers import (AdaptiveAvgPool2d,
                                                    Dropout, GELU, Linear,
                                                    MaxPool2d, ReLU)
    from convnet_approximater_tpu.utils.logger import get_logger

    params = variables["params"]
    state = variables.get("state", {})
    logger = get_logger()
    passthru = (ReLU, GELU, Dropout, MaxPool2d, AdaptiveAvgPool2d)

    def is_producer(m):
        return (isinstance(m, Conv2d) and m.groups == 1) \
            or isinstance(m, Linear)

    def is_consumer(m):
        return (isinstance(m, Conv2d) and m.groups == 1) \
            or isinstance(m, Linear)

    junctions: List[Tuple[str, Tuple[str, ...], str]] = []
    for path, mod in list(model.named_modules()):
        def sub(name):
            return f"{path}.{name}" if path else name

        if isinstance(mod, Sequential):
            names = list(mod._children)
            i = 0
            while i < len(names):
                a = mod._children[names[i]]
                if not is_producer(a):
                    i += 1
                    continue
                bns, j = [], i + 1
                while j < len(names):
                    m = mod._children[names[j]]
                    if isinstance(m, BatchNorm2d):
                        bns.append(names[j])
                        j += 1
                    elif isinstance(m, passthru):
                        j += 1
                    else:
                        break
                nxt = mod._children[names[j]] if j < len(names) else None
                # producer and consumer must be the same kind: a Flatten
                # (or anything else) between a conv and a Linear breaks
                # the channel identity, and the scan stops there anyway
                if nxt is not None and is_consumer(nxt) \
                        and isinstance(a, Conv2d) == isinstance(nxt, Conv2d):
                    junctions.append((sub(names[i]),
                                      tuple(sub(b) for b in bns),
                                      sub(names[j])))
                i = j  # the consumer is the next candidate producer
        for klass in type(mod).__mro__:
            for pa, bns, ca in PRUNE_PATTERNS.get(klass.__name__, ()):
                kids = mod._children
                if pa in kids and ca in kids \
                        and is_producer(kids[pa]) and is_consumer(kids[ca]) \
                        and all(isinstance(kids.get(b), BatchNorm2d)
                                for b in bns):
                    junctions.append((sub(pa), tuple(sub(b) for b in bns),
                                      sub(ca)))

    # -- optional measured statistics (the data-driven recipe) ------------
    stats: Dict[str, dict] = {}
    if calib_batches is not None and not dry_run and junctions:
        from convnet_approximater_tpu.nn.module import Ctx

        consumers = sorted({c for _, _, c in junctions})
        mods = {c: model.get_submodule(c) for c in consumers}
        for c in consumers:
            mods[c]._capture_in = True

        def fwd(p, s, x):
            ctx = Ctx(training=False, state=s)
            model(p, x, ctx)
            return {c: ctx.taps[c + ".in"] for c in consumers
                    if c + ".in" in ctx.taps}

        fwd_j = jax.jit(fwd)
        counts: Dict[str, int] = {}
        for xb in calib_batches:
            taps = fwd_j(params, state, xb)
            for c, xin in taps.items():
                mod = mods[c]
                xin = xin.astype(jnp.float32)
                if isinstance(mod, Conv2d):
                    kh, kw = mod.kernel_size
                    if (xin.shape[-1] * kh * kw > 8192
                            or mod.dilation != (1, 1)):
                        continue  # Gram too large / unsupported — fall
                        # back to the weight heuristic for this junction
                    G, mu = _patch_moments(xin, kh, kw)
                else:
                    v = xin.reshape(-1, xin.shape[-1])
                    G, mu = (v.T @ v) / v.shape[0], jnp.mean(v, axis=0)
                if isinstance(mod, Conv2d):
                    n_samp = (xin.shape[0] * (xin.shape[1] - kh + 1)
                              * (xin.shape[2] - kw + 1))
                else:
                    n_samp = int(np.prod(xin.shape[:-1]))
                flat = xin.reshape(-1, xin.shape[-1])
                ch_mu = jnp.mean(flat, axis=0)
                ch_sq = jnp.mean(flat ** 2, axis=0)
                st = stats.setdefault(c, {"G": 0, "mu": 0, "ch_mu": 0,
                                          "ch_sq": 0, "n": 0})
                st["G"] = st["G"] + G
                st["mu"] = st["mu"] + mu
                st["ch_mu"] = st["ch_mu"] + ch_mu
                st["ch_sq"] = st["ch_sq"] + ch_sq
                st["n"] += n_samp
                counts[c] = counts.get(c, 0) + 1
        for c, st in stats.items():
            for key in ("G", "mu", "ch_mu", "ch_sq"):
                st[key] = st[key] / counts[c]
        for c in consumers:
            mods[c]._capture_in = False

    n_pruned = 0
    for prod_path, bn_paths, cons_path in junctions:
        prod = model.get_submodule(prod_path)
        cons = model.get_submodule(cons_path)
        if filter_fn is not None and not filter_fn(prod_path, prod):
            continue
        conv = isinstance(prod, Conv2d)
        # module attrs are authoritative (and available param-free, which
        # lets dry_run gate planner candidates off the bare probe model)
        M = prod.out_channels if conv else prod.out_features
        k = _prune_round(int(round(M * keep_ratio)), M, round_to)
        if k >= M:
            if verbose:
                logger.info(f"prune_chains: {prod_path} keep {k}/{M} "
                            f"(snapped) — skipped")
            continue
        if dry_run:
            n_pruned += 1  # count prunable junctions without editing
            continue
        pp = _get(params, prod_path.split("."))
        cp = _get(params, cons_path.split("."))
        if pp is None or cp is None:
            continue
        wb = cp["weight"].astype(jnp.float32)
        nb = jnp.sqrt(jnp.sum(wb ** 2, axis=(0, 1, 3) if conv else (1,)))
        st = stats.get(cons_path)
        if st is not None:
            # measured contribution: the captured input already carries
            # the producer/BN/activation chain, so no weight heuristics
            var_c = jnp.maximum(st["ch_sq"] - st["ch_mu"] ** 2, 0.0)
            imp = np.asarray(var_c * nb ** 2)
        else:
            wa = pp["weight"].astype(jnp.float32)
            na = jnp.sqrt(jnp.sum(wa ** 2,
                                  axis=(0, 1, 2) if conv else (0,)))
            g = jnp.ones((M,), jnp.float32)
            for bp_path in bn_paths:
                bp = _get(params, bp_path.split("."))
                bs = _get(state, bp_path.split("."))
                bn = model.get_submodule(bp_path)
                g = g * jnp.abs(bp["scale"]) * jax.lax.rsqrt(
                    bs["var"].astype(jnp.float32) + bn.eps)
            imp = np.asarray(na * g * nb)
        S = np.sort(np.argsort(-imp, kind="stable")[:k])

        ax_out = 3 if conv else 1
        pp["weight"] = jnp.take(pp["weight"], S, axis=ax_out)
        if "bias" in pp:
            pp["bias"] = jnp.take(pp["bias"], S, axis=0)
        if conv:
            prod.out_channels = k
        else:
            prod.out_features = k
        for bp_path in bn_paths:
            bp = _get(params, bp_path.split("."))
            bs = _get(state, bp_path.split("."))
            bp["scale"] = jnp.take(bp["scale"], S, axis=0)
            bp["bias"] = jnp.take(bp["bias"], S, axis=0)
            bs["mean"] = jnp.take(bs["mean"], S, axis=0)
            bs["var"] = jnp.take(bs["var"], S, axis=0)
            model.get_submodule(bp_path).num_features = k
        if st is not None and st["n"] < 2 * (k * (np.prod(cons.kernel_size)
                                                 if conv else 1)):
            # rank guard: fewer calibration patches than unknowns makes
            # the LS refit interpolate noise (measured: a 50-sample Gram
            # on a 1728-dim junction was 5 orders worse than slicing) —
            # fall back to slice and tell the user how much data to add
            logger.warning(
                f"prune_chains: {cons_path} refit skipped — only "
                f"{st['n']} calibration patches for a "
                f"{k * (int(np.prod(cons.kernel_size)) if conv else 1)}"
                f"-dim solve; add calibration batches (>=2x that many "
                f"patches); sliced instead")
            st = None
        if st is not None:
            # closed-form consumer refit over the kept channels: least
            # squares on the (patch) Gram with an intercept row that
            # absorbs the dropped channels' means into the bias
            dt = cp["weight"].dtype
            if conv:
                kh, kw = cons.kernel_size
                O = wb.shape[3]
                Wf = jnp.transpose(wb, (2, 0, 1, 3)).reshape(-1, O)
                Sp = (np.asarray(S)[:, None] * (kh * kw)
                      + np.arange(kh * kw)[None, :]).reshape(-1)
            else:
                O = wb.shape[1]
                Wf = wb
                Sp = np.asarray(S)
            G, mu = st["G"], st["mu"]
            b0 = cp.get("bias")
            b0 = (b0.astype(jnp.float32) if b0 is not None
                  else jnp.zeros((O,), jnp.float32))
            GS = G[np.ix_(Sp, Sp)]
            muS = mu[Sp]
            lam = ridge * jnp.trace(GS) / Sp.shape[0]
            A = jnp.block([[GS + lam * jnp.eye(Sp.shape[0]), muS[:, None]],
                           [muS[None, :], jnp.ones((1, 1))]])
            Bm = jnp.concatenate([G[Sp] @ Wf + muS[:, None] * b0[None, :],
                                  (mu @ Wf + b0)[None, :]], axis=0)
            X = jnp.linalg.solve(A, Bm)
            Wp, bp_new = X[:-1], X[-1]
            if conv:
                Wp = jnp.transpose(Wp.reshape(k, kh, kw, O), (1, 2, 0, 3))
            cp["weight"] = Wp.astype(dt)
            cp["bias"] = bp_new.astype(dt)
            cons.use_bias = True
        else:
            cp["weight"] = jnp.take(cp["weight"], S, axis=2 if conv else 0)
        if conv:
            cons.in_channels = k
        else:
            cons.in_features = k
        n_pruned += 1
        if verbose:
            e = imp.astype(np.float64) ** 2
            logger.info(f"prune_chains: {prod_path} -> {cons_path}: "
                        f"keep {k}/{M} (importance energy "
                        f"{e[S].sum() / max(e.sum(), 1e-30):.4f})")
    if n_pruned and not dry_run:
        logger.info(f"prune_chains: {n_pruned} junctions pruned "
                    f"(keep_ratio {keep_ratio}, round_to {round_to})")
    return n_pruned


def _trunk_groups(model) -> List[dict]:
    """Discover residual-trunk channel groups: sets of producer convs whose
    outputs all land on the SAME tensor width through identity adds, plus
    every consumer reading that width.  A model can define its own
    ``trunk_groups()`` (MSCAN does — its trunk also threads LayerNorms and
    layer-scale vectors, which the group lists under ``norms`` /
    ``vectors``); otherwise the walk is shape-generic over
    torchvision-style residual models (root ``conv1``/``bn1`` stem, stage
    ``Sequential``s of blocks exposing ``conv1`` + ``downsample`` + a last
    ``conv2``/``conv3``, optional ``fc`` behind a global avgpool)."""
    from convnet_approximater_tpu.nn.layers import Linear

    hook = getattr(model, "trunk_groups", None)
    if callable(hook):
        groups = hook()
        for g in groups:
            g.setdefault("norms", [])
            g.setdefault("vectors", [])
            g.setdefault("depthwise", [])
            g.setdefault("attrs", [])
        return [g for g in groups if g["producers"] and g["consumers"]]

    def is_block(m):
        return (isinstance(getattr(m, "conv1", None), Conv2d)
                and hasattr(m, "downsample")
                and (isinstance(getattr(m, "conv3", None), Conv2d)
                     or isinstance(getattr(m, "conv2", None), Conv2d)))

    groups: List[dict] = []
    cur = None
    if isinstance(getattr(model, "conv1", None), Conv2d) \
            and isinstance(getattr(model, "bn1", None), BatchNorm2d):
        cur = {"producers": [("conv1", "bn1")], "consumers": []}
    for lname, layer in model.named_children():
        if not isinstance(layer, Sequential):
            continue
        blocks = list(layer.named_children())
        if not blocks or not all(is_block(b) for _, b in blocks):
            # a non-residual Sequential (e.g. a plain conv stack) can
            # change the tensor width — carrying the open group across it
            # would fuse producers/consumers of DIFFERENT widths
            cur = None
            continue
        for bname, block in blocks:
            bp = f"{lname}.{bname}"
            last = "conv3" if isinstance(getattr(block, "conv3", None),
                                         Conv2d) else "conv2"
            lastbn = "bn3" if last == "conv3" else "bn2"
            if not isinstance(getattr(block, lastbn, None), BatchNorm2d):
                lastbn = None
            if block.downsample is not None:
                # projection shortcut: the incoming trunk ends here
                if cur is not None:
                    cur["consumers"] += [f"{bp}.conv1", f"{bp}.downsample.0"]
                    groups.append(cur)
                ds_bn = isinstance(
                    block.downsample._children.get("1"), BatchNorm2d)
                cur = {"producers": [(f"{bp}.downsample.0",
                                      f"{bp}.downsample.1" if ds_bn else None),
                                     (f"{bp}.{last}",
                                      f"{bp}.{lastbn}" if lastbn else None)],
                       "consumers": []}
            else:
                # identity shortcut: input trunk == output trunk
                if cur is None:
                    cur = {"producers": [], "consumers": []}
                cur["consumers"].append(f"{bp}.conv1")
                cur["producers"].append(
                    (f"{bp}.{last}", f"{bp}.{lastbn}" if lastbn else None))
    if cur is not None:
        fc = getattr(model, "fc", None)
        if isinstance(fc, Linear) and cur["producers"] and fc.in_features \
                == model.get_submodule(
                    cur["producers"][0][0]).out_channels:
            cur["consumers"].append("fc")
        if cur["consumers"]:
            groups.append(cur)
    return [g for g in groups if g["producers"] and g["consumers"]]


def prune_trunks(model, variables: dict, keep_ratio: float,
                 round_to: int = 64, filter_fn=None,
                 dry_run: bool = False, verbose: bool = False) -> int:
    """Residual-TRUNK structured channel pruning (shared masks).

    ``prune_chains`` deliberately stops at residual block boundaries: the
    identity add pins every block's I/O width to the stage trunk, so no
    single producer->consumer junction can cut it.  This pass prunes that
    width anyway by slicing ONE shared channel mask through everything
    that touches the trunk — the stage's projection shortcut, every
    block's last conv (+ its BN), every next-block ``conv1`` input, the
    next stage's shortcut + ``conv1``, and the classifier behind the
    global avgpool.  The elementwise adds then stay shape-consistent by
    construction (the channel-pruning extension He et al. ICCV'17 §4.1
    leave to "future work" for multi-branch nets; reference parity
    anchor: the reference has no pruning at all — this extends its
    approximate-and-recover pipeline, /root/reference/src/approx/core/
    low_rank_exp.py, to the width axis of residual families).

    Selection is weight-heuristic only: channel importance is
    ``sqrt(sum_p ||W_p[m]||^2 g_m^2) * sqrt(sum_c ||W_c[:,m]||^2)`` over
    all producers p (with absorbed BN gain g) and consumers c — a
    data-driven refit cannot be per-junction here because the mask is
    shared; the CE/KD recovery fine-tune from the pruned init is the
    accuracy story (``--emit-recovery`` covers it via structure_passes
    configs).  ``round_to`` snaps kept widths to MXU-tile multiples.
    Composes with ``prune_chains`` (disjoint axes: block-internal vs
    trunk), ``fold_batchnorm``, casting, and ``quantize_int8``.
    Returns the number of trunk groups pruned.
    """
    import numpy as np

    from convnet_approximater_tpu.utils.logger import get_logger

    logger = get_logger()
    params = variables["params"]
    state = variables.get("state", {})
    n_pruned = 0
    for gi, g in enumerate(_trunk_groups(model)):
        prods = [(model.get_submodule(p), p, bn) for p, bn in g["producers"]]
        # a consumer entry is a path string, or a dict for consumers that
        # read the trunk as ONE SEGMENT of a channel-concatenated input
        # (SegNeXt's squeeze conv): {"path": ..., "offset_modules": [...]}
        # — the segment offset is the summed current widths of the listed
        # modules (earlier groups slice in stage order, so widths of prior
        # segments are final by the time this group is processed)
        cons = []
        for c in g["consumers"]:
            if isinstance(c, dict):
                off = sum(model.get_submodule(p).num_features
                          for p in c.get("offset_modules", ()))
                cons.append((model.get_submodule(c["path"]), c["path"], off))
            else:
                cons.append((model.get_submodule(c), c, None))
        def _out_w(mod):
            # a producer is a Conv2d or a Linear (ConvNeXt's pwconv2)
            return (mod.out_channels if isinstance(mod, Conv2d)
                    else mod.out_features)

        M = _out_w(prods[0][0])
        if any(_out_w(p) != M for p, _, _ in prods):
            continue  # malformed/custom group — leave it alone
        if filter_fn is not None and not filter_fn(g["producers"][0][0],
                                                   prods[0][0]):
            continue
        k = _prune_round(int(round(M * keep_ratio)), M, round_to)
        if k >= M:
            if verbose:
                logger.info(f"prune_trunks: group {gi} keep {k}/{M} "
                            f"(snapped) — skipped")
            continue
        if dry_run:
            n_pruned += 1
            continue

        prod_e = jnp.zeros((M,), jnp.float32)
        for mod, path, bn_path in prods:
            pp = _get(params, path.split("."))
            if pp is None:
                prod_e = None
                break
            na = jnp.sum(pp["weight"].astype(jnp.float32) ** 2,
                         axis=(0, 1, 2) if isinstance(mod, Conv2d) else 0)
            if bn_path is not None:
                bp = _get(params, bn_path.split("."))
                bs = _get(state, bn_path.split("."))
                bn = model.get_submodule(bn_path)
                # a fold_batchnorm-ed (or otherwise param-less) norm just
                # contributes no gain — don't crash on hook-declared paths
                if bp is not None and bs is not None \
                        and isinstance(bn, BatchNorm2d):
                    gain = jnp.abs(bp["scale"]) * jax.lax.rsqrt(
                        bs["var"].astype(jnp.float32) + bn.eps)
                    na = na * gain ** 2
            prod_e = prod_e + na
        if prod_e is None:
            continue
        cons_e = jnp.zeros((M,), jnp.float32)
        for mod, path, off in cons:
            cp = _get(params, path.split("."))
            if cp is None:
                cons_e = None
                break
            w = cp["weight"].astype(jnp.float32)
            if off is not None:
                w = w[:, :, off:off + M, :] if isinstance(mod, Conv2d) \
                    else w[off:off + M]
            cons_e = cons_e + (jnp.sum(w ** 2, axis=(0, 1, 3))
                               if isinstance(mod, Conv2d)
                               else jnp.sum(w ** 2, axis=1))
        if cons_e is None:
            continue
        # layer-scale style per-channel multipliers gate the producer
        # outputs — fold their magnitude into importance as the RMS over
        # the group's vectors (a PRODUCT underflows f32 with many blocks'
        # 1e-2-scale gammas, and channels also ride the residual bypass,
        # so per-path products overstate the coupling anyway)
        vec_sq, n_vec = jnp.zeros((M,), jnp.float32), 0
        for vp in g.get("vectors", ()):
            parts = vp.split(".")
            parent = _get(params, parts[:-1])
            if parent is not None and parts[-1] in parent:
                vec_sq = vec_sq + parent[parts[-1]].astype(jnp.float32) ** 2
                n_vec += 1
        vec_gain = jnp.sqrt(vec_sq / n_vec) if n_vec else 1.0
        imp = np.asarray(jnp.sqrt(prod_e) * jnp.sqrt(cons_e) * vec_gain)
        S = np.sort(np.argsort(-imp, kind="stable")[:k])

        for mod, path, bn_path in prods:
            pp = _get(params, path.split("."))
            if isinstance(mod, Conv2d):
                pp["weight"] = jnp.take(pp["weight"], S, axis=3)
                mod.out_channels = k
            else:
                pp["weight"] = jnp.take(pp["weight"], S, axis=1)
                mod.out_features = k
            if "bias" in pp:
                pp["bias"] = jnp.take(pp["bias"], S, axis=0)
            if bn_path is not None:
                bp = _get(params, bn_path.split("."))
                bs = _get(state, bn_path.split("."))
                if bp is not None:
                    bp["scale"] = jnp.take(bp["scale"], S, axis=0)
                    bp["bias"] = jnp.take(bp["bias"], S, axis=0)
                if bs is not None and "mean" in bs:
                    bs["mean"] = jnp.take(bs["mean"], S, axis=0)
                    bs["var"] = jnp.take(bs["var"], S, axis=0)
                if hasattr(model.get_submodule(bn_path), "num_features"):
                    model.get_submodule(bn_path).num_features = k
        for mod, path, off in cons:
            cp = _get(params, path.split("."))
            conv_c = isinstance(mod, Conv2d)
            total = cp["weight"].shape[2 if conv_c else 0]
            if off is None:
                idx = np.asarray(S)
                new_in = k
            else:
                idx = np.concatenate([np.arange(off), np.asarray(S) + off,
                                      np.arange(off + M, total)])
                new_in = total - (M - k)
            if conv_c:
                cp["weight"] = jnp.take(cp["weight"], idx, axis=2)
                mod.in_channels = new_in
            else:
                cp["weight"] = jnp.take(cp["weight"], idx, axis=0)
                mod.in_features = new_in
        for dpth in g.get("depthwise", ()):
            # channel-tied pass-through (ConvNeXt's dw 7x7 ON the trunk):
            # one weight slice changes in, out, AND groups together
            dm = model.get_submodule(dpth)
            dp = _get(params, dpth.split("."))
            dp["weight"] = jnp.take(dp["weight"], S, axis=3)
            if "bias" in dp:
                dp["bias"] = jnp.take(dp["bias"], S, axis=0)
            dm.in_channels = dm.out_channels = dm.groups = k
        for npth in g.get("norms", ()):
            nm = model.get_submodule(npth)
            npar = _get(params, npth.split("."))
            if npar is None:  # folded away — nothing left to slice
                continue
            npar["scale"] = jnp.take(npar["scale"], S, axis=0)
            npar["bias"] = jnp.take(npar["bias"], S, axis=0)
            nst = _get(state, npth.split("."))
            if nst:  # BatchNorm carries running stats; LayerNorm doesn't
                nst["mean"] = jnp.take(nst["mean"], S, axis=0)
                nst["var"] = jnp.take(nst["var"], S, axis=0)
            nm.num_features = k
        for vp in g.get("vectors", ()):
            parts = vp.split(".")
            parent = _get(params, parts[:-1])
            if parent is not None and parts[-1] in parent:
                parent[parts[-1]] = jnp.take(parent[parts[-1]], S, axis=0)
        for apath, aname in g.get("attrs", ()):
            # width attributes later passes CONSTRUCT from (MlpPrune's
            # target block, analysis) — stale values crash depthwise ops
            setattr(model.get_submodule(apath) if apath else model,
                    aname, k)
        n_pruned += 1
        if verbose:
            e = imp.astype(np.float64) ** 2
            logger.info(
                f"prune_trunks: group {gi} ({len(prods)} producers, "
                f"{len(cons)} consumers): keep {k}/{M} (importance "
                f"energy {e[S].sum() / max(e.sum(), 1e-30):.4f})")
    if n_pruned and not dry_run:
        logger.info(f"prune_trunks: {n_pruned} trunk groups pruned "
                    f"(keep_ratio {keep_ratio}, round_to {round_to})")
    return n_pruned


def prune_width(model, variables: dict, keep_ratio: float,
                round_to: int = 64, ffn_round_to: int = 128,
                dry_run: bool = False, verbose: bool = False) -> int:
    """Every width axis the model has, one config-expressible pass.

    Applies, in dependency order: ``prune_trunks`` (shared-mask stage
    trunks), ``prune_chains`` (producer->consumer junctions), then the
    per-module width apps on a ``SwitchableModel`` — ``AttnPrune`` (gated
    MSCA branches), ``FfnPrune`` (conv-FFN hiddens), ``MlpPrune``
    (ConvNeXt MLPs) — each a no-op where the model has no such axis.
    This is the r4e record quad (MSCAN-t 1.912 ms, doc/perf-notes.md) as
    ONE ``structure_passes`` entry, so quad-pruned checkpoints replay
    through the Runner, ClassInference, AND export_model:

        structure_passes = [dict(fn="prune_width", keep_ratio=0.5)]

    App selections here are weight-heuristic (a structure pass has no
    calibration stream); for the data-driven greedy+refit selections run
    the apps through the normal pipeline instead.  Returns the total
    number of sites/groups pruned.
    """
    n = prune_trunks(model, variables, keep_ratio, round_to=round_to,
                     dry_run=dry_run, verbose=verbose)
    n += prune_chains(model, variables, keep_ratio, round_to=round_to,
                      dry_run=dry_run, verbose=verbose)
    if not hasattr(model, "register_switchable"):
        return n
    from convnet_approximater_tpu.core import AttnPrune, FfnPrune, MlpPrune
    from convnet_approximater_tpu.deploy_planner import apply_app

    # the internal app loop re-runs register_switchable; a caller (Runner /
    # ClassInference / export_model) may have registered ITS app's sites
    # already — save and restore that registration so a structure pass is
    # transparent to the surrounding pipeline (ADVICE r4 + r5 review)
    saved_registration = list(getattr(model, "_switchable_names", []))
    try:
        for app in (AttnPrune(keep_ratio=keep_ratio),
                    FfnPrune(keep_ratio=keep_ratio, round_to=ffn_round_to),
                    MlpPrune(keep_ratio=keep_ratio, round_to=ffn_round_to)):
            if dry_run:
                model.register_switchable(app.src_type, [])
                n += model.length_switchable
            else:
                n += apply_app(model, variables, app, [], jax.random.key(0))
    finally:
        model._switchable_names = saved_registration
    return n
