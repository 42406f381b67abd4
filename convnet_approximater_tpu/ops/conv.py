"""Conv primitives on ``lax.conv_general_dilated`` — NHWC / HWIO layouts.

These are the XLA-path compute kernels for every conv layer in the framework
(the Pallas fused variants in ``ops/pallas`` are drop-in alternatives checked
against these).  Layout is TPU-native channels-last:

* activations ``(B, H, W, C)``
* kernels ``(kh, kw, C_in // groups, C_out)``

Torch-style integer padding maps to explicit ``((ph, ph), (pw, pw))`` pairs so
numerics match the reference's ``nn.Conv2d`` exactly (both are
cross-correlations).

Strip-conv MXU lowering (``CAT_STRIP_MATMUL``): depthwise ``(k, 1)`` /
``(1, k)`` convs are the MSCA workload's VPU hotspot (XLA lowers them to
shift/multiply chains — measured 0.19 ms for one (21, 1) conv on a
(64, 56, 56, 32) map, >100x off the FLOP roofline).  The same contraction is
a per-channel banded-Toeplitz matmul over the strip axis,
``y[b,o,w,c] = sum_h T[o,h,c] x[b,h,w,c]``, which the MXU executes as a
C-batched small GEMM.  Zero padding folds into the band (no pad copy).
"""

from __future__ import annotations

import os
from functools import lru_cache
from typing import Optional, Sequence, Tuple, Union

import jax.numpy as jnp
from jax import lax

PadT = Union[int, Tuple[int, int], Sequence[Tuple[int, int]], str]

DIMS = ("NHWC", "HWIO", "NHWC")


@lru_cache(maxsize=1)
def _strip_matmul_env():
    """CAT_STRIP_MATMUL: ('force-off'|'force-on', min_k) or (None, 0) unset.

    Unset: per-layer dispatch decides (CascadeConv opts its k>=7 strips in —
    measured whole-model win on the deploy cascades; the original multi-branch
    bank LOSES, doc/perf-notes.md, so it stays on the lax path).
    '0'/'off' force-disables everywhere; '1'/'on' (or an integer threshold)
    force-enables for every strip with k >= min_k."""
    v = os.environ.get("CAT_STRIP_MATMUL", "").strip().lower()
    if not v:
        return None, 0
    if v in ("0", "off", "false"):
        return "force-off", 0
    if v in ("1", "on", "true", "yes"):
        return "force-on", 7
    try:
        return "force-on", max(int(v), 2)
    except ValueError:
        return "force-on", 7


def _strip_band(w_kc: jnp.ndarray, out_len: int, in_len: int, pad: int):
    """Banded Toeplitz (out_len, in_len, C) from per-channel taps (k, C)."""
    k = w_kc.shape[0]
    o = jnp.arange(out_len)[:, None]
    h = jnp.arange(in_len)[None, :]
    d = h - o + pad  # tap index hit by (out, in)
    valid = (d >= 0) & (d < k)
    T = jnp.where(valid[..., None], w_kc[jnp.clip(d, 0, k - 1)], 0)
    return T.astype(w_kc.dtype)


def strip_conv_matmul(x: jnp.ndarray, w: jnp.ndarray,
                      b: Optional[jnp.ndarray], pad: int) -> jnp.ndarray:
    """Depthwise strip conv as a per-channel Toeplitz contraction on the MXU.

    ``w``: HWIO ``(k, 1, 1, C)`` (vertical) or ``(1, k, 1, C)`` (horizontal);
    stride 1, symmetric zero padding ``pad`` on the strip axis.  Exact (up to
    f32-accumulation rounding) vs the ``lax`` depthwise lowering.
    """
    vertical = w.shape[1] == 1
    k = w.shape[0] if vertical else w.shape[1]
    axis = 1 if vertical else 2
    L = x.shape[axis]
    Lo = L + 2 * pad - k + 1
    taps = (w[:, 0, 0, :] if vertical else w[0, :, 0, :])  # (k, C)
    T = _strip_band(taps, Lo, L, pad)
    eq = "bhwc,ohc->bowc" if vertical else "bhwc,owc->bhoc"
    y = jnp.einsum(eq, x, T, preferred_element_type=jnp.float32)
    # bias in the f32 accumulator, one cast to the conv output dtype — the
    # same convention as pointwise_matmul and the lax path (ADVICE r2)
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(x.dtype)


def _try_strip_matmul(x, w, b, stride, padding, groups, dilation,
                      prefer: bool = False):
    mode, min_k = _strip_matmul_env()
    if mode == "force-off" or (mode is None and not prefer):
        return None
    kh, kw = w.shape[0], w.shape[1]
    if (kh == 1) == (kw == 1):  # not a strip (1x1 or 2-D kernel)
        return None
    k = max(kh, kw)
    if mode == "force-on" and k < min_k:
        return None
    C = x.shape[-1]
    if groups != C or w.shape[2] != 1 or w.shape[3] != C:
        return None
    if _pair(stride) != (1, 1) or _pair(dilation) != (1, 1):
        return None
    pads = _pad_pairs(padding)
    if isinstance(pads, str):
        return None
    (pt, pb), (pl, pr) = pads
    if kh > 1 and (pt != pb or (pl, pr) != (0, 0)):
        return None
    if kw > 1 and (pl != pr or (pt, pb) != (0, 0)):
        return None
    return strip_conv_matmul(x, w, b, pt if kh > 1 else pl)


@lru_cache(maxsize=1)
def _pw_matmul_env():
    """CAT_PW_MATMUL: '' unset (per-call ``pw_matmul`` decides), '0' force-off,
    '1' force-on, or an integer L: force-on only where H*W <= L (the
    small-spatial maps whose conv-emitter layout wastes MXU lanes)."""
    v = os.environ.get("CAT_PW_MATMUL", "").strip().lower()
    if not v:
        return None, 0
    if v in ("0", "off", "false"):
        return "force-off", 0
    if v in ("1", "on", "true", "yes"):
        return "force-on", 1 << 30
    try:
        return "force-on", max(int(v), 1)
    except ValueError:
        return "force-on", 1 << 30


def pointwise_matmul(x: jnp.ndarray, w: jnp.ndarray,
                     b: Optional[jnp.ndarray]) -> jnp.ndarray:
    """1x1 conv as an explicit (B*H*W, Cin) x (Cin, Cout) MXU matmul.

    The round-2c trace showed XLA's conv emitter running the small-spatial
    1x1 convs (stage-3/4 FFN fc1/fc2: 14x14 and 7x7 maps) at ~6% of the
    bf16 MXU roofline — the chosen layout puts H(=14) in the lanes.  A dot
    over the flattened spatial axis tiles M = B*H*W onto the MXU properly.
    Exact up to f32-accumulation rounding vs the conv lowering.
    """
    y = jnp.einsum("bhwc,cd->bhwd", x, w[0, 0],
                   preferred_element_type=jnp.float32)
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(x.dtype)


# measured sweep (scripts/exp_pw_matmul.py, best bf16 serving config):
# <=196 (14^2 and down) wins -0.13 ms; 28^2 and up under the matmul form
# loses the conv emitter's better large-map layouts.
PW_MATMUL_DEFAULT_MAX_HW = 196


def _try_pointwise_matmul(x, w, b, stride, padding, groups, dilation,
                          prefer: bool = False):
    mode, max_hw = _pw_matmul_env()
    if mode == "force-off" or (mode is None and not prefer):
        return None
    if mode is None:
        max_hw = PW_MATMUL_DEFAULT_MAX_HW
    if w.shape[0] != 1 or w.shape[1] != 1 or groups != 1:
        return None
    if _pair(stride) != (1, 1) or _pair(dilation) != (1, 1):
        return None
    pads = _pad_pairs(padding)
    if isinstance(pads, str) or pads != ((0, 0), (0, 0)):
        return None
    if x.shape[1] * x.shape[2] > max_hw:
        return None
    return pointwise_matmul(x, w, b)


def _pad_pairs(padding: PadT):
    if isinstance(padding, str):
        return padding
    if isinstance(padding, int):
        return ((padding, padding), (padding, padding))
    padding = tuple(padding)
    if len(padding) == 2 and all(isinstance(p, int) for p in padding):
        return ((padding[0], padding[0]), (padding[1], padding[1]))
    return padding


def _pair(v):
    if isinstance(v, (tuple, list)):
        return tuple(v)
    return (v, v)


def conv2d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray] = None,
    stride=1,
    padding: PadT = 0,
    groups: int = 1,
    dilation=1,
    strip_matmul: bool = False,
    pw_matmul: bool = False,
) -> jnp.ndarray:
    """2-D cross-correlation, NHWC x HWIO -> NHWC.

    ``strip_matmul=True`` asks for the banded-Toeplitz MXU lowering when the
    conv is a qualifying depthwise strip (see module docstring); the
    ``CAT_STRIP_MATMUL`` env var force-enables/disables globally.
    ``pw_matmul=True`` lowers a qualifying 1x1 conv as an explicit flattened
    matmul (``pointwise_matmul``); ``CAT_PW_MATMUL`` force-overrides."""
    if groups > 1:
        y = _try_strip_matmul(x, w, b, stride, padding, groups, dilation,
                              prefer=strip_matmul)
        if y is not None:
            return y
    else:
        y = _try_pointwise_matmul(x, w, b, stride, padding, groups, dilation,
                                  prefer=pw_matmul)
        if y is not None:
            return y
    y = lax.conv_general_dilated(
        x,
        w,
        window_strides=_pair(stride),
        padding=_pad_pairs(padding),
        rhs_dilation=_pair(dilation),
        dimension_numbers=DIMS,
        feature_group_count=groups,
    )
    if b is not None:
        # promote for the add, cast once back to the conv output dtype so a
        # f32 bias on bf16 activations cannot change the downstream dtype
        # (keeps all three lowerings' output dtypes identical — ADVICE r2)
        y = (y + b).astype(y.dtype)
    return y


def conv2d_int8(x_q: jnp.ndarray, w_q: jnp.ndarray, stride=1, padding: PadT = 0,
                groups: int = 1, dilation=1) -> jnp.ndarray:
    """int8 x int8 -> int32 conv on the MXU (the v5e runs int8 at ~1.4x the
    bf16 conv rate even counting the quant/dequant chain — measured in-jit,
    doc/perf-notes.md).  Operands must already be quantized int8; the caller
    owns scales/dequantization (see ``layers/quant.py::QuantConv2d``)."""
    return lax.conv_general_dilated(
        x_q,
        w_q,
        window_strides=_pair(stride),
        padding=_pad_pairs(padding),
        rhs_dilation=_pair(dilation),
        dimension_numbers=DIMS,
        feature_group_count=groups,
        preferred_element_type=jnp.int32,
    )


def depthwise_conv2d(x, w, b=None, stride=1, padding=0, dilation=1):
    """Depthwise conv: ``w`` is ``(kh, kw, 1, C)``; groups = C."""
    return conv2d(x, w, b, stride, padding, groups=x.shape[-1], dilation=dilation)


def max_pool2d(x, kernel_size, stride=None, padding=0):
    k = _pair(kernel_size)
    s = _pair(stride if stride is not None else kernel_size)
    pads = _pad_pairs(padding)
    if isinstance(pads, str):
        raise ValueError("string padding not supported for pooling")
    # -inf init is required for JAX to use the reduce-window-max VJP
    neg = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    return lax.reduce_window(
        x,
        neg,
        lax.max,
        window_dimensions=(1, k[0], k[1], 1),
        window_strides=(1, s[0], s[1], 1),
        padding=((0, 0), pads[0], pads[1], (0, 0)),
    )


def avg_pool2d(x, kernel_size, stride=None, padding=0):
    """Average pooling (count_include_pad=True, torch's default).

    NOT lowered via ``lax.reduce_window``+add: the axon relay rejects that
    op's linearization ("Linearization failed to produce known values for
    all output primals" under grad — measured r3f; ``lax.max`` windows are
    fine).  Non-overlapping unpadded windows (every use in this framework's
    models) are a reshape+mean; the general overlapping/padded case lowers
    to a constant-kernel depthwise conv, differentiable everywhere."""
    k = _pair(kernel_size)
    s = _pair(stride if stride is not None else kernel_size)
    pads = _pad_pairs(padding)
    B, H, W, C = x.shape
    if (s == k and pads == ((0, 0), (0, 0))
            and H % k[0] == 0 and W % k[1] == 0):
        return x.reshape(B, H // k[0], k[0], W // k[1], k[1], C).mean(axis=(2, 4))
    # integer inputs: the mean-kernel would round to zeros — compute in f32
    # (matches both the reshape-mean path and the old sum/true-divide,
    # which also returned float)
    dtype = x.dtype if jnp.issubdtype(x.dtype, jnp.floating) else jnp.float32
    w = jnp.full((k[0], k[1], 1, C), 1.0 / (k[0] * k[1]), dtype)
    return lax.conv_general_dilated(
        x.astype(dtype), w,
        window_strides=s,
        padding=(pads[0], pads[1]),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C,
    )


def adaptive_avg_pool2d(x, output_size):
    """Torch-equivalent adaptive average pooling (NHWC).

    Uses the same bin edges as torch: start = floor(i*H/out), end =
    ceil((i+1)*H/out).  Static shapes, so the gather pattern is unrolled at
    trace time (output sizes are tiny: (6,6) or (1,1) in this framework).
    When output > input, torch's bin edges duplicate input rows/cols; the
    general path below reproduces that exactly (tests/test_torch_parity.py).
    """
    oh, ow = _pair(output_size)
    B, H, W, C = x.shape
    if H == oh and W == ow:
        return x
    if H % oh == 0 and W % ow == 0:
        return avg_pool2d(x, (H // oh, W // ow), stride=(H // oh, W // ow))
    rows = []
    for i in range(oh):
        h0, h1 = (i * H) // oh, -(-((i + 1) * H) // oh)
        cols = []
        for j in range(ow):
            w0, w1 = (j * W) // ow, -(-((j + 1) * W) // ow)
            cols.append(jnp.mean(x[:, h0:h1, w0:w1, :], axis=(1, 2)))
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)


def global_avg_pool2d(x):
    return jnp.mean(x, axis=(1, 2))
