"""Fused Pallas TPU kernel for the scheme-1 low-rank conv
(``LowRankExpConvV1``: grouped basis conv -> 1x1 mixing conv).

The performance problem this solves (measured; BASELINE.md): XLA lowers the
C -> C*M grouped basis conv to the VPU (grouped/depthwise convs can't use the
systolic array), and the C*M-channel intermediate round-trips HBM before the
1x1 mix — so the "cheaper" factorized layer ran ~2x *slower* than the dense
conv it replaced, the same wall-clock loss the reference measured on cuDNN
(``doc/low-rank-exp/low-rank-exp.md:51-53``).

This kernel fuses the whole layer into one VMEM pass per image:

* **stage 1 (basis conv, VPU)**: for each basis m, the separable pair of
  shifted multiply-adds (2*d taps; or d*d for non-separable bases) over the
  padded tile — the intermediate ``z_m`` tiles never leave VMEM.  Basis
  slices are laid out m-major (``z[..., m*C:(m+1)*C]``) so each is a
  contiguous lane block.
* **stage 2 (1x1 mix, MXU)**: ``Y[(h, w), n] = Z[(h, w), (m, c)] @ A + b``
  with the mixing matrix row-permuted to match the m-major layout —
  contraction over M*C (hundreds) at full MXU utilisation.

HBM traffic: read x once, write y once.

Weight layouts (host-side prep by :func:`lowrank_params_from_module`):
``v`` (M, kh) vertical taps, ``h`` (M, kw) horizontal taps (or ``bases``
(M, kh, kw) full spatial filters), ``A_mc`` (M*C, N) mixing matrix with rows
ordered ``m * C + c``, ``b`` (N,).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lowrank_sep_kernel(x_ref, v_ref, h_ref, a_ref, b_ref, o_ref,
                        *, kh: int, kw: int, ph: int, pw: int,
                        sh: int, sw: int, C: int, M: int, N: int,
                        Ho: int, Wo: int):
    x = x_ref[0].astype(jnp.float32)  # (H, W, C)
    xp = jnp.pad(x, ((ph, ph), (pw, pw), (0, 0)))
    Hp = xp.shape[0]
    z_slices = []
    for m in range(M):
        # horizontal pass: (Hp, Wo, C)
        tmp = jnp.zeros((Hp, Wo, C), jnp.float32)
        for j in range(kw):
            tmp = tmp + h_ref[m, j] * xp[:, j:j + (Wo - 1) * sw + 1:sw, :]
        # vertical pass: (Ho, Wo, C)
        zm = jnp.zeros((Ho, Wo, C), jnp.float32)
        for i in range(kh):
            zm = zm + v_ref[m, i] * tmp[i:i + (Ho - 1) * sh + 1:sh, :, :]
        z_slices.append(zm)
    Z = jnp.concatenate(z_slices, axis=-1)  # (Ho, Wo, M*C), m-major
    Y = jnp.dot(
        Z.reshape(Ho * Wo, M * C), a_ref[:], preferred_element_type=jnp.float32
    ) + b_ref[:]
    o_ref[0] = Y.reshape(Ho, Wo, N).astype(o_ref.dtype)


def _lowrank_full_kernel(x_ref, bases_ref, a_ref, b_ref, o_ref,
                         *, kh: int, kw: int, ph: int, pw: int,
                         sh: int, sw: int, C: int, M: int, N: int,
                         Ho: int, Wo: int):
    x = x_ref[0].astype(jnp.float32)
    xp = jnp.pad(x, ((ph, ph), (pw, pw), (0, 0)))
    z_slices = []
    for m in range(M):
        zm = jnp.zeros((Ho, Wo, C), jnp.float32)
        for i in range(kh):
            for j in range(kw):
                zm = zm + bases_ref[m, i, j] * xp[
                    i:i + (Ho - 1) * sh + 1:sh, j:j + (Wo - 1) * sw + 1:sw, :
                ]
        z_slices.append(zm)
    Z = jnp.concatenate(z_slices, axis=-1)
    Y = jnp.dot(
        Z.reshape(Ho * Wo, M * C), a_ref[:], preferred_element_type=jnp.float32
    ) + b_ref[:]
    o_ref[0] = Y.reshape(Ho, Wo, N).astype(o_ref.dtype)


def lowrank_conv(x, A_mc, b, *, v=None, h=None, bases=None,
                 kernel_size: Tuple[int, int], stride=(1, 1), padding=(0, 0),
                 interpret: bool = False):
    """Fused scheme-1 conv.

    x: (B, H, W, C).  Either ``v`` (M, kh) + ``h`` (M, kw) separable taps or
    ``bases`` (M, kh, kw) full filters.  ``A_mc``: (M*C, N) mixing matrix
    with rows ordered ``m * C + c``; b: (N,).
    """
    B, H, W, C = x.shape
    kh, kw = kernel_size
    sh, sw = stride
    ph, pw = padding
    N = A_mc.shape[1]
    Ho = (H + 2 * ph - kh) // sh + 1
    Wo = (W + 2 * pw - kw) // sw + 1
    common = dict(kh=kh, kw=kw, ph=ph, pw=pw, sh=sh, sw=sw, C=C, N=N, Ho=Ho, Wo=Wo)
    if v is not None:
        M = v.shape[0]
        kernel = functools.partial(_lowrank_sep_kernel, M=M, **common)
        weight_specs = [
            pl.BlockSpec((M, kh), lambda b_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((M, kw), lambda b_: (0, 0), memory_space=pltpu.VMEM),
        ]
        weights = (v, h)
        stage1 = 2 * B * Ho * Wo * C * M * (kh + kw)
    else:
        M = bases.shape[0]
        kernel = functools.partial(_lowrank_full_kernel, M=M, **common)
        weight_specs = [
            pl.BlockSpec((M, kh, kw), lambda b_: (0, 0, 0), memory_space=pltpu.VMEM),
        ]
        weights = (bases,)
        stage1 = 2 * B * Ho * Wo * C * M * kh * kw
    flops = stage1 + 2 * B * Ho * Wo * C * M * N
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, Ho, Wo, N), x.dtype),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, W, C), lambda b_: (b_, 0, 0, 0), memory_space=pltpu.VMEM),
            *weight_specs,
            pl.BlockSpec((M * C, N), lambda b_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N,), lambda b_: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Ho, Wo, N), lambda b_: (b_, 0, 0, 0), memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(x.size + B * Ho * Wo * N) * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, *weights, A_mc, b)


def lowrank_params_from_module(params: dict, module) -> Optional[dict]:
    """Extract fused-kernel weights from a LowRankExpConvV1 param subtree.

    The layer stores the shared bases replicated over C groups (channel
    ``c * M + m``); the kernel wants the m-major (M*C, N) mixing matrix, so
    the d_conv rows are permuted from (c, m) to (m, c) order.  Handles both
    the grouped (full bases) and SeparableConv (v/h rank-1) forms.
    """
    from convnet_approximater_tpu.layers.low_rank_conv import SeparableConv

    M = module.num_base
    C = module.in_channels
    kh, kw = module.kernel_size
    out: dict = {}
    if isinstance(module.s_conv, SeparableConv):
        sp = params["s_conv"]
        out["v"] = jnp.transpose(sp["v_conv"]["weight"][:, 0, 0, :M])  # (M, kh)
        out["h"] = jnp.transpose(sp["h_conv"]["weight"][0, :, 0, :M])  # (M, kw)
    else:
        w = params["s_conv"]["weight"]  # (kh, kw, 1, C*M); group 0 = bases
        out["bases"] = jnp.transpose(w[:, :, 0, :M], (2, 0, 1))  # (M, kh, kw)
    dw = params["d_conv"]["weight"][0, 0]  # (C*M, N), rows c*M + m
    A_cm = dw.reshape(C, M, -1)
    out["A_mc"] = jnp.transpose(A_cm, (1, 0, 2)).reshape(M * C, -1)
    b = params["d_conv"].get("bias")
    out["b"] = b if b is not None else jnp.zeros((dw.shape[1],), jnp.float32)
    return out
