"""Fused Pallas TPU kernels for the MSCA strip-conv attention path.

Why these exist (BASELINE.md): the reference's decomposed models *lost*
wall-clock despite ~36% fewer MACs because each tiny depthwise strip conv is
a separate bandwidth-bound kernel — the intermediate feature map round-trips
HBM between every (1,k) / (k,1) conv, and on GPU cuDNN's dense paths won.
These kernels keep the whole per-image tile resident in VMEM and execute the
entire chain in one pass:

``parallel_cascade``  x -> sum_br vconv_br(hconv_br(x) + b1) + b2 [+ x]
``msca_fused``        x -> x * channel_mix(fix(bank(conv0(x))))

Performance design (v5e):

* Grid is (B // G,): MSCAN feature maps are small (<=56x56x256 after the
  stem), so full (H, W, C) image tiles fit VMEM — no halo exchange.
* Strip convs are unrolled shifted multiply-adds on the VPU.  Each branch
  loops over only its OWN k taps (taps are stored in (nb, k_max, C) arrays
  but the unrolled loop skips the zero-embedded ends), so a 7/11/21 bank
  costs 39 passes, not 63.
* **Lane packing**: the VPU lane dim is the trailing (channel) axis, padded
  to 128.  For C < 128 the dispatch wrapper stacks G = 128 // C batch images
  into the channel axis ((B, H, W, C) -> (B/G, H, W, G*C), taps tiled G
  times) so every lane does real work — a 4x utilisation win at the C = 32
  stage.  The reshape/transpose is done inside jit, where XLA fuses it into
  neighbouring ops.
* The conv1 bias is added *before* the vertical conv (matching torch's
  cascade semantics at borders bit-for-bit, including the partial-sum border
  effects the MscaRep algebra models).
* ``channel_mix`` (1x1 conv == per-pixel C x C matmul) runs on the MXU from
  the same VMEM tile: one HBM read of x, one HBM write of the gated output —
  versus 6+ kernel round-trips in the unfused graph.  With lane packing the
  mix matrix is block-diagonal over the G image groups, implemented as a
  reshape to (G * HW, C) so the MXU still sees one dense (C, C) matmul.

Weights are pre-packed host-side by :func:`pack_cascade_weights` into dense
(nb, k_max, C) tap arrays; per-branch true kernel sizes travel as the static
``ks`` tuple.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def pack_cascade_weights(w1_list, b1_list, w2_list, b2_list,
                         k_max: Optional[int] = None):
    """Stack per-branch strip kernels into (nb, k_max, C) tap arrays.

    ``w1_list[i]``: horizontal taps (k_i, C); ``w2_list[i]``: vertical taps
    (k_i, C); biases (C,) or None.  Shorter branches are zero-embedded at the
    center of k_max taps (exact under zero padding).  Returns
    ``(w1, b1, w2, b2, ks)`` where ``ks`` is the tuple of true kernel sizes.
    """
    ks = tuple(int(w.shape[0]) for w in w1_list)
    k_max = k_max or max(ks)
    nb = len(w1_list)
    C = w1_list[0].shape[-1]
    w1 = jnp.zeros((nb, k_max, C), jnp.float32)
    w2 = jnp.zeros((nb, k_max, C), jnp.float32)
    b1 = jnp.zeros((nb, C), jnp.float32)
    b2 = jnp.zeros((nb, C), jnp.float32)
    for i, (wa, wb) in enumerate(zip(w1_list, w2_list)):
        off = (k_max - wa.shape[0]) // 2
        w1 = w1.at[i, off:off + wa.shape[0]].set(wa.astype(jnp.float32))
        off = (k_max - wb.shape[0]) // 2
        w2 = w2.at[i, off:off + wb.shape[0]].set(wb.astype(jnp.float32))
        if b1_list[i] is not None:
            b1 = b1.at[i].set(b1_list[i].astype(jnp.float32))
        if b2_list[i] is not None:
            b2 = b2.at[i].set(b2_list[i].astype(jnp.float32))
    return w1, b1, w2, b2, ks


def _bank(x, w1, b1, w2, b2, identity: bool, ks: Tuple[int, ...], k_max: int):
    """Strip-conv bank on one (H, W, C) tile; per-branch taps unrolled."""
    H, W, C = x.shape
    p = k_max // 2
    acc = x if identity else jnp.zeros_like(x)
    xw = jnp.pad(x, ((0, 0), (p, p), (0, 0)))
    for br, k in enumerate(ks):
        off = (k_max - k) // 2
        tmp = jnp.zeros_like(x)
        for j in range(off, off + k):
            tmp = tmp + w1[br, j] * xw[:, j:j + W, :]
        tmp = tmp + b1[br]
        tmph = jnp.pad(tmp, ((p, p), (0, 0), (0, 0)))
        out = jnp.zeros_like(x)
        for i in range(off, off + k):
            out = out + w2[br, i] * tmph[i:i + H, :, :]
        acc = acc + out + b2[br]
    return acc


# ---------------------------------------------------------------------------
# lane packing helpers
# ---------------------------------------------------------------------------

def _group_factor(B: int, C: int) -> int:
    g = max(1, LANES // C)
    while g > 1 and B % g:
        g -= 1
    return g


def _pack_batch(x, G: int):
    """(B, H, W, C) -> (B/G, H, W, G*C): stack G images into the lane axis."""
    if G == 1:
        return x
    B, H, W, C = x.shape
    return jnp.transpose(x.reshape(B // G, G, H, W, C), (0, 2, 3, 1, 4)).reshape(
        B // G, H, W, G * C
    )


def _unpack_batch(y, G: int):
    if G == 1:
        return y
    Bg, H, W, GC = y.shape
    C = GC // G
    return jnp.transpose(y.reshape(Bg, H, W, G, C), (0, 3, 1, 2, 4)).reshape(
        Bg * G, H, W, C
    )


def _tile_lanes(w, G: int):
    """Tile the trailing channel axis G times."""
    if G == 1:
        return w
    reps = (1,) * (w.ndim - 1) + (G,)
    return jnp.tile(w, reps)


# ---------------------------------------------------------------------------
# parallel cascade (bank only)
# ---------------------------------------------------------------------------

def _parallel_cascade_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
                             *, identity: bool, ks: Tuple[int, ...], k_max: int):
    x = x_ref[0].astype(jnp.float32)
    acc = _bank(x, w1_ref[:], b1_ref[:][:, None, :], w2_ref[:], b2_ref[:][:, None, :],
                identity, ks, k_max)
    o_ref[0] = acc.astype(o_ref.dtype)


def parallel_cascade(x, w1, b1, w2, b2, *, ks: Optional[Sequence[int]] = None,
                     identity: bool = False, interpret: bool = False):
    """Fused multi-branch cascade bank.

    x: (B, H, W, C); w1/w2: (nb, k_max, C) horizontal/vertical taps;
    b1/b2: (nb, C); ks: per-branch true kernel sizes (defaults to k_max).
    Returns sum over branches of ``vconv(hconv(x) + b1) + b2`` plus ``x``
    when ``identity``.
    """
    B, H, W, C = x.shape
    nb, k_max, _ = w1.shape
    ks = tuple(ks) if ks is not None else (k_max,) * nb
    G = _group_factor(B, C)
    xg = _pack_batch(x, G)
    w1g, b1g, w2g, b2g = (_tile_lanes(a, G) for a in (w1, b1, w2, b2))
    Bg, _, _, GC = xg.shape
    kernel = functools.partial(
        _parallel_cascade_kernel, identity=identity, ks=ks, k_max=k_max
    )
    yg = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(xg.shape, x.dtype),
        grid=(Bg,),
        in_specs=[
            pl.BlockSpec((1, H, W, GC), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, k_max, GC), lambda b: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, GC), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, k_max, GC), lambda b: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, GC), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, W, GC), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xg, w1g, b1g, w2g, b2g)
    return _unpack_batch(yg, G)


# ---------------------------------------------------------------------------
# fully-fused MSCA
# ---------------------------------------------------------------------------

def _msca_fused_kernel(x_ref, w0_ref, b0_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                       res_ref, wm_ref, bm_ref, o_ref,
                       *, identity: bool, ks: Tuple[int, ...], k_max: int,
                       k0: int, fix_p: int, G: int):
    x = x_ref[0].astype(jnp.float32)
    H, W, GC = x.shape
    C = GC // G
    p0 = k0 // 2
    # conv0: k0 x k0 depthwise, unrolled over the (small) k0^2 taps
    xp = jnp.pad(x, ((p0, p0), (p0, p0), (0, 0)))
    attn = jnp.zeros_like(x)
    for i in range(k0):
        for j in range(k0):
            attn = attn + w0_ref[i, j] * xp[i:i + H, j:j + W, :]
    attn = attn + b0_ref[:]
    # strip bank
    attn = _bank(attn, w1_ref[:], b1_ref[:][:, None, :], w2_ref[:], b2_ref[:][:, None, :],
                 identity, ks, k_max)
    if fix_p > 0:
        # FixPaddingBias: learnable border residual strips.  Build a
        # full-height (H, 1, C) strip with concatenate (Mosaic-friendly; no
        # gathers/scatters) and add once.
        p2 = min(H, fix_p)
        res = res_ref[:]
        top = res[0, :p2, :].reshape(p2, 1, res.shape[-1])
        bot = res[1, fix_p - p2:, :].reshape(p2, 1, res.shape[-1])
        if H > 2 * p2:
            mid = jnp.zeros((H - 2 * p2, 1, res.shape[-1]), attn.dtype)
            strip = jnp.concatenate([top, mid, bot], axis=0)
        else:
            strip = jnp.concatenate([top, bot], axis=0)[:H]
        attn = attn + strip
    # channel mix: per-pixel matmul on the MXU.  Under lane packing the mix
    # matrix arrives block-diagonal over the G image groups (Mosaic cannot
    # split the lane dim in a reshape, and the extra zero-block FLOPs are
    # negligible at the packed — small-C — stages).
    mixed = jnp.dot(
        attn.reshape(H * W, GC), wm_ref[:], preferred_element_type=jnp.float32
    ) + bm_ref[:]
    o_ref[0] = (x * mixed.reshape(H, W, GC)).astype(o_ref.dtype)


def msca_fused(x, w0, b0, w1, b1, w2, b2, wm, bm, res=None, *,
               ks: Optional[Sequence[int]] = None, identity: bool = True,
               fix_p: int = 0, interpret: bool = False):
    """Fully-fused MSCA: ``x * channel_mix(fix(bank(conv0(x))))``.

    x: (B, H, W, C); w0: (k0, k0, C) depthwise taps; wm: (C, C) 1x1 mixing
    matrix (input-dim first); biases (C,); res: optional (2, fix_p, C)
    border-correction strips (FixPaddingBias); ks: per-branch kernel sizes.
    """
    B, H, W, C = x.shape
    nb, k_max, _ = w1.shape
    k0 = w0.shape[0]
    ks = tuple(ks) if ks is not None else (k_max,) * nb
    if res is None:
        res = jnp.zeros((2, max(fix_p, 1), C), jnp.float32)
    rp = res.shape[1]
    G = _group_factor(B, C)
    xg = _pack_batch(x, G)
    Bg, _, _, GC = xg.shape
    w0g = _tile_lanes(w0, G)
    b0g, b1g, b2g, bmg = (_tile_lanes(a, G) for a in (b0, b1, b2, bm))
    w1g, w2g = _tile_lanes(w1, G), _tile_lanes(w2, G)
    resg = _tile_lanes(res, G)
    if G > 1:
        wm = jax.scipy.linalg.block_diag(*([wm] * G))  # (GC, GC)
    kernel = functools.partial(
        _msca_fused_kernel, identity=identity, ks=ks, k_max=k_max, k0=k0,
        fix_p=fix_p, G=G,
    )
    taps = k0 * k0 + 2 * sum(ks)
    flops = 2 * B * H * W * C * (taps + C)
    yg = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(xg.shape, x.dtype),
        grid=(Bg,),
        in_specs=[
            pl.BlockSpec((1, H, W, GC), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k0, k0, GC), lambda b: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((GC,), lambda b: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, k_max, GC), lambda b: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, GC), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, k_max, GC), lambda b: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, GC), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, rp, GC), lambda b: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((GC, GC), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((GC,), lambda b: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, W, GC), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=2 * x.size * x.dtype.itemsize, transcendentals=0
        ),
        interpret=interpret,
    )(xg, w0g, b0g, w1g, b1g, w2g, b2g, resg, wm, bmg)
    return _unpack_batch(yg, G)
