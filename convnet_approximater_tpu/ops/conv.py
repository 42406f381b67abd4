"""Conv primitives on ``lax.conv_general_dilated`` — NHWC / HWIO layouts.

These are the XLA-path compute kernels for every conv layer in the framework
(the Pallas fused variants in ``ops/pallas`` are drop-in alternatives checked
against these).  Layout is TPU-native channels-last:

* activations ``(B, H, W, C)``
* kernels ``(kh, kw, C_in // groups, C_out)``

Torch-style integer padding maps to explicit ``((ph, ph), (pw, pw))`` pairs so
numerics match the reference's ``nn.Conv2d`` exactly (both are
cross-correlations).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import jax.numpy as jnp
from jax import lax

PadT = Union[int, Tuple[int, int], Sequence[Tuple[int, int]], str]

DIMS = ("NHWC", "HWIO", "NHWC")


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
) -> jnp.ndarray:
    """2-D cross-correlation, NHWC x HWIO -> NHWC."""
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
        y = y + b
    return y


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
    k = _pair(kernel_size)
    s = _pair(stride if stride is not None else kernel_size)
    pads = _pad_pairs(padding)
    summed = lax.reduce_window(
        x,
        jnp.zeros((), x.dtype),
        lax.add,
        window_dimensions=(1, k[0], k[1], 1),
        window_strides=(1, s[0], s[1], 1),
        padding=((0, 0), pads[0], pads[1], (0, 0)),
    )
    return summed / (k[0] * k[1])


def adaptive_avg_pool2d(x, output_size):
    """Torch-equivalent adaptive average pooling (NHWC).

    Uses the same bin edges as torch: start = floor(i*H/out), end =
    ceil((i+1)*H/out).  Static shapes, so the gather pattern is unrolled at
    trace time (output sizes are tiny: (6,6) or (1,1) in this framework).
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
