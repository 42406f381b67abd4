"""Depthwise separable strip-conv building blocks for MSCA.

Rebuilds of ``/root/reference/src/approx/layers/depth_seperable_conv.py`` on
NHWC.  ``CascadeConv`` applies a horizontal (1, k) depthwise conv then a
vertical (k, 1) depthwise conv — the order matters for the re-parameterization
algebra in :mod:`convnet_approximater_tpu.core.msca_rep`.
"""

from __future__ import annotations

import jax.numpy as jnp

from convnet_approximater_tpu.nn import Conv2d, Ctx, Identity, Module, ModuleList


class CascadeConv(Module):
    """Depthwise (1, k) then (k, 1) cascade (reference ``:5-16``).

    ``bias`` is the second conv's bias flag, ``first_bias`` the first's.
    ``strip_matmul=True`` (the deploy-form cascades built by MscaRep) lowers
    the k>=7 strips as banded-Toeplitz MXU contractions — a measured
    whole-model win for the STANDALONE cascade; the multi-branch original
    bank loses with it (XLA fuses the bank's strips with mix/gate), so
    ParallelConv branches keep the default lax path (doc/perf-notes.md).
    """

    def __init__(self, dim: int, kernel_size: int, padding: int, bias: bool,
                 first_bias: bool, strip_matmul: bool = False):
        super().__init__()
        self.dim = dim
        self.kernel_size = kernel_size
        sm = strip_matmul and kernel_size >= 7
        self.conv1 = Conv2d(dim, dim, (1, kernel_size), padding=(0, padding),
                            groups=dim, bias=first_bias, strip_matmul=sm)
        self.conv2 = Conv2d(dim, dim, (kernel_size, 1), padding=(padding, 0),
                            groups=dim, bias=bias, strip_matmul=sm)

    def __call__(self, params, x, ctx: Ctx):
        x = self.child("conv1", params, x, ctx)
        return self.child("conv2", params, x, ctx)


class ParallelConv(Module):
    """Multi-branch sum of :class:`CascadeConv` (+ optional identity branch).

    Bias policy matches the reference (``:33-41``): ``all_bias=True`` gives
    every conv a bias; otherwise only the last branch's second conv has one.
    This is both the original MSCA multi-scale strip bank (k = 7, 11, 21 +
    identity) and the decomposed target (``decomp`` >= 2 branches of max-k).
    """

    def __init__(self, dim: int, kernel_sizes, paddings, nbranch: int,
                 all_bias: bool, identity: bool):
        super().__init__()
        self.dim = dim
        if isinstance(kernel_sizes, int):
            kernel_sizes = [kernel_sizes] * nbranch
        if isinstance(paddings, int):
            paddings = [paddings] * nbranch
        assert len(kernel_sizes) == nbranch and len(paddings) == nbranch
        if all_bias:
            branches = [
                CascadeConv(dim, kernel_sizes[i], paddings[i], bias=True, first_bias=True)
                for i in range(nbranch)
            ]
        else:
            branches = [
                CascadeConv(dim, kernel_sizes[i], paddings[i],
                            bias=(i == nbranch - 1), first_bias=False)
                for i in range(nbranch)
            ]
        self.branches = ModuleList(branches)
        if identity:
            self.branches.append(Identity())

    def __call__(self, params, x, ctx: Ctx):
        branch_params = params.get("branches", {})
        out = None
        with ctx.scope("branches"):
            for name, _ in self.branches.named_children():
                y = self.branches.child(name, branch_params, x, ctx)
                out = y if out is None else out + y
        return out


class FixPaddingBias(Module):
    """Learnable border-correction strips (reference ``:50-61``).

    Adds trainable residuals to the top/bottom ``padding`` rows of the feature
    map, compensating that merging cascaded biased convs into one kernel is
    exact only away from borders.  ``res`` has shape (2, C, p): res[0] = top
    rows, res[1] = bottom rows.
    """

    def __init__(self, num_channels: int, padding: int):
        super().__init__()
        self.num_channels = num_channels
        self.p = padding

    def init_params(self, rng):
        import jax

        return {"res": jax.random.normal(rng, (2, self.num_channels, self.p))}

    def __call__(self, params, x, ctx: Ctx):
        res = params["res"]
        H = x.shape[1]
        p2 = min(H, self.p)
        # Build a full-height (H, C) strip once (tiny; scatter on it is
        # compile-time cheap) and apply ONE broadcast add: unlike updating x
        # row-slices in place (a scatter XLA cannot fuse — measured 0.7 ms of
        # pure HBM copies per call at MSCAN stage-1 shapes), the elementwise
        # add fuses into the neighbouring convs for free.
        strip = jnp.zeros((H, self.num_channels), x.dtype)
        strip = strip.at[:p2, :].add(jnp.transpose(res[0, :, :p2]))
        strip = strip.at[H - p2:, :].add(jnp.transpose(res[1, :, self.p - p2:]))
        return x + strip[None, :, None, :]


class FixPaddingBias2d(Module):
    """Learnable border-frame correction for a *2-D* merged kernel.

    2-D generalization of :class:`FixPaddingBias` (which only corrects
    top/bottom rows — enough for the MSCA cascade whose horizontal conv is
    bias-free).  Merging a biased 1x1 conv into a following zero-padded
    ``k x k`` depthwise conv (see :class:`~convnet_approximater_tpu.core.ffn_rep.FfnRep`)
    is exact except where kernel taps fall outside the map, i.e. a frame of
    width ``p = k // 2``.  By inclusion-exclusion over out-of-bounds
    rows/columns the correction decomposes into

    * ``res_v`` (2, C, p): top / bottom row strips (broadcast across W),
    * ``res_h`` (2, C, p): left / right column strips (broadcast across H),
    * ``res_c`` (2, 2, C, p, p): the four p x p corner patches that undo the
      double-counted row∩column taps.

    The (H, W, C) correction map is built batch-free (scatter on it is
    compile-time cheap) and applied as ONE broadcast add, which XLA fuses
    into the neighbouring convs — same lesson as :class:`FixPaddingBias`.
    """

    def __init__(self, num_channels: int, padding: int):
        super().__init__()
        self.num_channels = num_channels
        self.p = padding

    def init_params(self, rng):
        import jax

        k1, k2, k3 = jax.random.split(rng, 3)
        C, p = self.num_channels, self.p
        return {
            "res_v": jax.random.normal(k1, (2, C, p)),
            "res_h": jax.random.normal(k2, (2, C, p)),
            "res_c": jax.random.normal(k3, (2, 2, C, p, p)),
        }

    def __call__(self, params, x, ctx: Ctx):
        H, W = x.shape[1], x.shape[2]
        C, p = self.num_channels, self.p
        pv, ph = min(H, p), min(W, p)
        rv, rh, rc = params["res_v"], params["res_h"], params["res_c"]
        sv = jnp.zeros((H, C), x.dtype)
        sv = sv.at[:pv].add(jnp.transpose(rv[0, :, :pv]))
        sv = sv.at[H - pv:].add(jnp.transpose(rv[1, :, p - pv:]))
        sh = jnp.zeros((W, C), x.dtype)
        sh = sh.at[:ph].add(jnp.transpose(rh[0, :, :ph]))
        sh = sh.at[W - ph:].add(jnp.transpose(rh[1, :, p - ph:]))
        m = sv[:, None, :] + sh[None, :, :]  # (H, W, C)
        tl = jnp.transpose(rc[0, 0, :, :pv, :ph], (1, 2, 0))
        tr = jnp.transpose(rc[0, 1, :, :pv, p - ph:], (1, 2, 0))
        bl = jnp.transpose(rc[1, 0, :, p - pv:, :ph], (1, 2, 0))
        br = jnp.transpose(rc[1, 1, :, p - pv:, p - ph:], (1, 2, 0))
        m = m.at[:pv, :ph].add(tl)
        m = m.at[:pv, W - ph:].add(tr)
        m = m.at[H - pv:, :ph].add(bl)
        m = m.at[H - pv:, W - ph:].add(br)
        return x + m[None]
