"""Jaderberg low-rank expansion target layers (arXiv 1405.3866).

Rebuilds of ``/root/reference/src/approx/layers/low_rank_conv.py`` on NHWC /
HWIO layouts, with the channel ordering conventions of the reference preserved
so checkpoints map 1:1 (grouped-conv output channel ``c*M + m`` applies basis
``m`` to input channel ``c``).
"""

from __future__ import annotations

import os
from typing import Union

import jax
import jax.numpy as jnp

from convnet_approximater_tpu.nn import Conv2d, Ctx, Module
from convnet_approximater_tpu.utils.general import to_2tuple

from .substitution import LAYER

# VMEM word budget for the fused scheme-1 kernel's per-image buffers
_FUSE_MAX_WORDS = 2 * 1024 * 1024


def _fuse_enabled() -> bool:
    # Opt-in (see doc/perf-notes.md): XLA's lowering currently beats the
    # Pallas kernel at the benchmarked shapes.
    if os.environ.get("CAT_DISABLE_FUSED"):
        return False
    if not os.environ.get("CAT_ENABLE_FUSED"):
        return False
    return jax.default_backend() in ("tpu", "axon")


def _toeplitz_bank(taps, out_len: int, in_len: int, stride: int):
    """Banded Toeplitz matrices from strip taps.

    ``taps``: (M, k).  Returns T (M, out_len, in_len) with
    ``T[m, o, o*stride + j] = taps[m, j]`` — so ``T[m] @ xpad`` performs the
    m-th strided strip conv.  Built with one vectorized scatter (tiny array;
    constant-folded around the weights by XLA).
    """
    M, k = taps.shape
    T = jnp.zeros((M, out_len, in_len), taps.dtype)
    o = jnp.arange(out_len)
    for j in range(k):
        T = T.at[:, o, o * stride + j].set(taps[:, j][:, None])
    return T


def lowrank_matmul_forward(x, v_taps, h_taps, A_cm, bias, *, stride, padding):
    """Scheme-1 separable forward as MXU einsums.

    The grouped strip convs of the decomposed layer are depthwise ops XLA
    executes on the VPU (measured: the decomposed layer runs ~3.7x slower
    than the dense conv it replaces).  Because scheme-1's bases are SHARED
    across channels, each strip conv is also ``T_m @ x`` with a per-basis
    banded Toeplitz matrix — a batched dense contraction the MXU executes at
    ~50x VPU throughput, worth far more than the ~6x zero-band FLOP overhead.

    x: (B, H, W, C); v_taps/h_taps: (M, kh)/(M, kw); A_cm: (C*M, N) mixing
    rows ordered c*M + m; bias: (N,) or None.
    """
    B, H, W, C = x.shape
    M, kh = v_taps.shape
    kw = h_taps.shape[1]
    sh, sw = stride
    ph, pw = padding
    Wp = W + 2 * pw
    Wo = (Wp - kw) // sw + 1
    Hp = H + 2 * ph
    Ho = (Hp - kh) // sh + 1
    xp = jnp.pad(x, ((0, 0), (0, 0), (pw, pw), (0, 0)))
    Th = _toeplitz_bank(h_taps, Wo, Wp, sw)  # (M, Wo, Wp)
    tmp = jnp.einsum("mow,bhwc->bmhoc", Th, xp)  # horizontal pass (MXU)
    tmp = jnp.pad(tmp, ((0, 0), (0, 0), (ph, ph), (0, 0), (0, 0)))
    Tv = _toeplitz_bank(v_taps, Ho, Hp, sh)  # (M, Ho, Hp)
    z = jnp.einsum("moh,bmhwc->bmowc", Tv, tmp)  # vertical pass (MXU)
    # mix: contraction over (m, c) on the MXU; A rows are c*M + m
    A = A_cm.reshape(C, M, -1)
    y = jnp.einsum("bmhwc,cmn->bhwn", z, A)
    if bias is not None:
        y = y + bias
    return y


class SeparableConv(Module):
    """Separable version of the grouped basis conv (C -> M*C, groups=C).

    ``v_conv``: (kh, 1) grouped conv C -> C*M (vertical strips), then
    ``h_conv``: (1, kw) depthwise over C*M (horizontal strips).  Strides are
    split across the pair; no biases (reference ``low_rank_conv.py:9-25``).
    """

    def __init__(self, in_channels: int, num_bases: int, kernel_size, stride, padding):
        super().__init__()
        kernel_size = to_2tuple(kernel_size)
        stride = to_2tuple(stride)
        padding = to_2tuple(padding)
        self.v_conv = Conv2d(
            in_channels,
            in_channels * num_bases,
            (kernel_size[0], 1),
            stride=(stride[0], 1),
            padding=(padding[0], 0),
            groups=in_channels,
            bias=False,
        )
        self.h_conv = Conv2d(
            in_channels * num_bases,
            in_channels * num_bases,
            (1, kernel_size[1]),
            stride=(1, stride[1]),
            padding=(0, padding[1]),
            groups=in_channels * num_bases,
            bias=False,
        )

    def __call__(self, params, x, ctx: Ctx):
        if self._use_shift(ctx):
            return self._shift_forward(params, x)
        x = self.child("v_conv", params, x, ctx)
        return self.child("h_conv", params, x, ctx)

    # -- shift-multiply lowering ----------------------------------------
    def _use_shift(self, ctx: Ctx) -> bool:
        """Opt into the shift-multiply lowering (``CAT_SEP_SHIFT=1``).

        XLA's grouped-conv emitter is catastrophic for the decomposed pair
        (v: C groups with channel multiplier M, h: depthwise over C*M): the
        round-2c VGG-16 trace shows 35% of device time in pure layout
        copies around the (B,H,W,C*M) intermediates plus slow grouped conv
        fusions.  The same contraction is k shifted broadcast
        multiply-accumulates over a (B,H,W,C,M) map — fusable elementwise
        work with no grouped-conv emitter involved."""
        v = os.environ.get("CAT_SEP_SHIFT", "").strip().lower()
        if v in ("0", "off", "false"):
            return False
        if not v:
            return False
        return (not ctx.training
                and self.v_conv.stride == (1, 1) == self.h_conv.stride)

    def _shift_forward(self, params, x):
        wv = params["v_conv"]["weight"]  # (kh, 1, 1, C*M)
        wh = params["h_conv"]["weight"]  # (1, kw, 1, C*M)
        B, H, W, C = x.shape
        kh, kw = wv.shape[0], wh.shape[1]
        M = wv.shape[3] // C
        tv = wv[:, 0, 0, :].reshape(kh, C, M).astype(x.dtype)
        th = wh[0, :, 0, :].reshape(kw, C, M).astype(x.dtype)
        ph = self.v_conv.padding[0]
        pw = self.h_conv.padding[1]
        Ho = H + 2 * ph - kh + 1
        Wo = W + 2 * pw - kw + 1
        xp = jnp.pad(x, ((0, 0), (ph, ph), (0, 0), (0, 0)))
        y = None
        for j in range(kh):
            t = xp[:, j:j + Ho, :, :, None] * tv[j][None, None, None, :, :]
            y = t if y is None else y + t
        yp = jnp.pad(y, ((0, 0), (0, 0), (pw, pw), (0, 0), (0, 0)))
        z = None
        for j in range(kw):
            t = yp[:, :, j:j + Wo, :, :] * th[j][None, None, None, :, :]
            z = t if z is None else z + t
        return z.reshape(B, Ho, Wo, C * M)


@LAYER.register_module()
class LowRankExpConvV1(Module):
    """Scheme-1 target: grouped basis conv (``s_conv``) + 1x1 mixing conv
    (``d_conv``); bias lives on ``d_conv`` (reference
    ``low_rank_conv.py:29-66``).  ``decomp`` picks the separable variant of
    ``s_conv`` at build time; :meth:`decomp` factorizes post-hoc via SVD.
    """

    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        kernel_size: Union[int, tuple],
        stride: Union[int, tuple],
        padding: Union[int, tuple],
        num_base: int,
        decomp: bool = False,
    ):
        super().__init__()
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = to_2tuple(kernel_size)
        self.stride = to_2tuple(stride)
        self.padding = to_2tuple(padding)
        self.num_base = num_base
        if decomp:
            self.s_conv = SeparableConv(
                in_channels, num_base, self.kernel_size, self.stride, self.padding
            )
        else:
            self.s_conv = Conv2d(
                in_channels,
                in_channels * num_base,
                self.kernel_size,
                stride=self.stride,
                padding=self.padding,
                groups=in_channels,
                bias=False,
            )
        self.d_conv = Conv2d(in_channels * num_base, out_channels, 1)

    def __call__(self, params, x, ctx: Ctx):
        if self._use_matmul_mode(ctx) and self._taps_channel_shared(params):
            return self._matmul_forward(params, x)
        if self._can_fuse(ctx, x):
            return self._fused_forward(params, x)
        x = self.child("s_conv", params, x, ctx)
        return self.child("d_conv", params, x, ctx)

    # -- MXU matmul mode (decomposed form only) --------------------------
    def _use_matmul_mode(self, ctx: Ctx) -> bool:
        # Opt-in: measured (doc/perf-notes.md) the Toeplitz-einsum form loses
        # to XLA's conv lowering at AlexNet shapes (the (B, M, H, W, C)
        # intermediates round-trip HBM).  Kept as a tested alternative for
        # shapes where the VPU is the binding constraint.
        if ctx.training or not os.environ.get("CAT_ENABLE_MATMUL_MODE"):
            return False
        if not isinstance(self.s_conv, SeparableConv):
            return False
        return jax.default_backend() in ("tpu", "axon")

    def _taps_channel_shared(self, params) -> bool:
        """The Toeplitz einsum assumes the strip taps are IDENTICAL across
        the C input-channel groups (true right after LowRankExpV1's solve,
        which broadcasts the M shared bases — but fine-tuning trains s_conv
        per-channel).  When the weights are concrete (outside jit) verify it;
        tracers can't be inspected, so the assumption is documented here and
        surfaced via this check on every eager call."""
        import numpy as np

        sp = params["s_conv"]
        vw, hw = sp["v_conv"]["weight"], sp["h_conv"]["weight"]
        if isinstance(vw, jax.core.Tracer) or isinstance(hw, jax.core.Tracer):
            return True  # traced: cannot check; caller opted in via env var
        M = self.num_base
        for w, k_axis in ((vw, 0), (hw, 1)):
            taps = np.asarray(w).reshape(w.shape[k_axis], -1)[:, : self.in_channels * M]
            per_c = taps.reshape(w.shape[k_axis], self.in_channels, M)
            if not np.allclose(per_c, per_c[:, :1], rtol=1e-5, atol=1e-6):
                if not getattr(self, "_warned_per_channel", False):
                    from convnet_approximater_tpu.utils.logger import get_logger

                    get_logger().warning(
                        "CAT_ENABLE_MATMUL_MODE: strip taps are per-channel "
                        "(fine-tuned?); falling back to the conv path."
                    )
                    self._warned_per_channel = True
                return False
        return True

    def _matmul_forward(self, params, x):
        sp = params["s_conv"]
        M = self.num_base
        v_taps = jnp.transpose(sp["v_conv"]["weight"][:, 0, 0, :M])  # (M, kh)
        h_taps = jnp.transpose(sp["h_conv"]["weight"][0, :, 0, :M])  # (M, kw)
        return lowrank_matmul_forward(
            x, v_taps, h_taps, params["d_conv"]["weight"][0, 0],
            params["d_conv"].get("bias"), stride=self.stride, padding=self.padding,
        )

    # -- fused dispatch --------------------------------------------------
    def _can_fuse(self, ctx: Ctx, x) -> bool:
        if ctx.training or not _fuse_enabled():
            return False
        H, W = x.shape[1], x.shape[2]
        kh, kw = self.kernel_size
        sh, sw = self.stride
        Ho = (H + 2 * self.padding[0] - kh) // sh + 1
        Wo = (W + 2 * self.padding[1] - kw) // sw + 1
        C, M, N = self.in_channels, self.num_base, self.out_channels
        words = H * W * C + 2 * Ho * Wo * M * C + M * C * N + Ho * Wo * N
        return words < _FUSE_MAX_WORDS

    def _fused_forward(self, params, x, interpret: bool = False):
        from convnet_approximater_tpu.ops.pallas import (
            lowrank_conv,
            lowrank_params_from_module,
        )

        kw = lowrank_params_from_module(params, self)
        return lowrank_conv(
            x, kw.pop("A_mc"), kw.pop("b"),
            kernel_size=self.kernel_size, stride=self.stride,
            padding=self.padding, interpret=interpret, **kw,
        )

    def decomp(self, params: dict) -> dict:
        """Spatially factorize ``s_conv`` into rank-1 vertical/horizontal pairs.

        Mutates module structure (``s_conv`` becomes a :class:`SeparableConv`)
        and returns the updated param subtree for this module.  Matches the
        reference's SVD split (``low_rank_conv.py:58-66``): each (kh, kw)
        basis kernel -> u0*sqrt(s0) vertical, vh0*sqrt(s0) horizontal.
        """
        if isinstance(self.s_conv, SeparableConv):
            return params
        import numpy as np

        w = params["s_conv"]["weight"]  # (kh, kw, 1, C*M) HWIO grouped
        kh, kw, _, cm = w.shape
        # -> (C*M, kh, kw) for per-output-channel SVD.  Host numpy: a one-time
        # solve over up-to-10^5 tiny (k,k) matrices — XLA's TPU QR custom-call
        # runs out of scoped VMEM above ~2^14 batched 3x3 SVDs (hit on VGG-16
        # 512-ch layers), and device latency is irrelevant here.
        k = np.transpose(np.asarray(w[:, :, 0, :], dtype=np.float32), (2, 0, 1))
        u, s, vh = np.linalg.svd(k, full_matrices=False)
        u, s, vh = jnp.asarray(u), jnp.asarray(s), jnp.asarray(vh)
        s0 = jnp.sqrt(s[:, 0])
        v_w = (u[:, :, 0] * s0[:, None])  # (C*M, kh)
        h_w = (vh[:, 0, :] * s0[:, None])  # (C*M, kw)
        self.s_conv = SeparableConv(
            self.in_channels, self.num_base, self.kernel_size, self.stride, self.padding
        )
        new_params = dict(params)
        new_params["s_conv"] = {
            # v_conv HWIO: (kh, 1, 1, C*M); h_conv: (1, kw, 1, C*M)
            "v_conv": {"weight": jnp.transpose(v_w, (1, 0))[:, None, None, :]},
            "h_conv": {"weight": jnp.transpose(h_w, (1, 0))[None, :, None, :]},
        }
        return new_params


@LAYER.register_module()
class LowRankExpConvV2(Module):
    """Scheme-2 target: dense vertical conv C -> M, then horizontal conv
    M -> N with bias.

    The reference's layer (``low_rank_conv.py:70-88``) made ``h_conv`` a
    grouped M -> M conv, which cannot substitute an N-output conv and was
    never driven by any approximater.  This build completes the scheme as
    published (Jaderberg et al. scheme-2: W[n,c,u,v] ~= sum_m V[m,c,u] *
    H[n,m,v]) with a dense (1, kw) conv M -> N, plus a ``grouped=True`` flag
    reproducing the reference's original (M -> M) shape for checkpoint parity.
    """

    def __init__(self, in_channels: int, out_channels: int, num_base: int,
                 kernel_size, stride, padding, grouped: bool = False):
        super().__init__()
        kernel_size = to_2tuple(kernel_size)
        stride = to_2tuple(stride)
        padding = to_2tuple(padding)
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.num_base = num_base
        self.grouped = grouped
        self.v_conv = Conv2d(
            in_channels, num_base, (kernel_size[0], 1), stride=(stride[0], 1),
            padding=(padding[0], 0), bias=False,
        )
        if grouped:
            self.h_conv = Conv2d(
                num_base, num_base, (1, kernel_size[1]), stride=(1, stride[1]),
                padding=(0, padding[1]), groups=num_base,
            )
        else:
            self.h_conv = Conv2d(
                num_base, out_channels, (1, kernel_size[1]), stride=(1, stride[1]),
                padding=(0, padding[1]),
            )

    def __call__(self, params, x, ctx: Ctx):
        x = self.child("v_conv", params, x, ctx)
        return self.child("h_conv", params, x, ctx)


@LAYER.register_module()
class LowRankExpConvV3(Module):
    """Channel-rank factorization target (TPU extension, no reference
    counterpart): dense k x k conv C -> r (``basis_conv``, bias-free) then
    1x1 conv r -> N (``mix_conv``, bias carrier).

    W[n,c,u,v] ~= sum_m A[n,m] B[m,c,u,v] — rank over the *output-channel*
    dimension of the unfolded (N, C k^2) kernel matrix.  Unlike scheme-1's
    grouped bases (V1) or the spatial split (V2), BOTH factors are dense
    convs, i.e. pure MXU work: this sidesteps the grouped-conv wall that
    makes V1 lose wall-clock on TPU (doc/perf-notes.md).  MACs per output
    pixel: C k^2 r + r N  vs  C k^2 N — an ~r/N cut whenever C k^2 >> N.
    """

    def __init__(self, in_channels: int, out_channels: int, num_base: int,
                 kernel_size, stride, padding):
        super().__init__()
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.num_base = num_base
        self.kernel_size = to_2tuple(kernel_size)
        self.stride = to_2tuple(stride)
        self.padding = to_2tuple(padding)
        self.basis_conv = Conv2d(in_channels, num_base, self.kernel_size,
                                 stride=self.stride, padding=self.padding,
                                 bias=False)
        self.mix_conv = Conv2d(num_base, out_channels, 1)

    def __call__(self, params, x, ctx: Ctx):
        x = self.child("basis_conv", params, x, ctx)
        return self.child("mix_conv", params, x, ctx)


@LAYER.register_module()
class LowRankExpConvV4(Module):
    """Tucker-2 factorization target (TPU extension; the Tucker analog of
    the CP line in PAPERS.md — Lebedev et al. 1412.6553 / Kim et al. 2015):
    1x1 conv C -> r1 (``in_conv``), dense k x k core r1 -> r2
    (``core_conv``, carries the stride/padding), 1x1 conv r2 -> N
    (``out_conv``, bias carrier).

    W[n,c,u,v] ~= sum_{a,b} U_N[n,b] G[b,a,u,v] U_C[c,a] — rank over BOTH
    channel modes of the kernel tensor.  Like V3 (= Tucker-1 on the output
    mode) every factor is a dense conv, i.e. pure MXU work — no grouped
    convs (the scheme-1 wall, doc/perf-notes.md).  MACs per output pixel:
    s^2 C r1 + r1 r2 k^2 + r2 N  vs  C k^2 N (s = stride: the input 1x1
    runs pre-stride) — at equal ranks the k^2 term shrinks from C k^2 r
    (V3) to r1 r2 k^2, so the cut is much deeper whenever C >> r1.
    """

    def __init__(self, in_channels: int, out_channels: int, num_base,
                 kernel_size, stride, padding):
        super().__init__()
        r1, r2 = (num_base if isinstance(num_base, (tuple, list))
                  else (num_base, num_base))
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.num_base = (int(r1), int(r2))
        self.kernel_size = to_2tuple(kernel_size)
        self.stride = to_2tuple(stride)
        self.padding = to_2tuple(padding)
        self.in_conv = Conv2d(in_channels, self.num_base[0], 1, bias=False)
        self.core_conv = Conv2d(self.num_base[0], self.num_base[1],
                                self.kernel_size, stride=self.stride,
                                padding=self.padding, bias=False)
        self.out_conv = Conv2d(self.num_base[1], out_channels, 1)

    def __call__(self, params, x, ctx: Ctx):
        x = self.child("in_conv", params, x, ctx)
        x = self.child("core_conv", params, x, ctx)
        return self.child("out_conv", params, x, ctx)
