#!/usr/bin/env python
"""Probe: Pallas fused quantize+int8 matmul vs XLA's two-pass lowering.

The QuantLinear path costs one full activation round-trip: read bf16 ->
write int8 (clamp_convert fusion, ~1.15 ms/iter on the ConvNeXt stack
trace) -> read int8 into the matmul.  A Pallas kernel can quantize
in-registers on the way into the MXU, reading the activation ONCE.

Shapes = ConvNeXt-T pwconv1 at b=64: stage 1 (200704, 96)x(96, 384) and
stage 3 (12544, 384)x(384, 1536).  If the fused kernel wins here it
becomes an opt-in QuantLinear dispatch (CAT_ENABLE_FUSED convention).
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cat_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
from jax.experimental import pallas as pl

from bench import KEY, log


def _qmm_kernel(x_ref, w_ref, ascale_ref, wscale_ref, bias_ref, o_ref):
    # scales/bias ride as (1, bn) 2-D blocks: Mosaic rejects 1-D operands
    # whose block tiling disagrees with the XLA layout (measured r3f)
    a_scale = ascale_ref[0, 0]
    x = x_ref[:].astype(jnp.float32) / a_scale
    x_q = jnp.clip(jnp.round(x), -127.0, 127.0).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x_q, w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * (a_scale * wscale_ref[:])
    y = y + bias_ref[:]
    o_ref[:] = y.astype(o_ref.dtype)


def _divisor(n, candidates):
    for c in candidates:
        if n % c == 0:
            return c
    return n


def pallas_qmatmul(x, w_q, act_scale, w_scale, bias, bm=512, bn=512):
    M, K = x.shape
    N = w_q.shape[1]
    bm = _divisor(M, (bm, 448, 256, 128, 64, 32))
    bn = _divisor(N, (bn, 384, 256, 128))
    assert M % bm == 0 and N % bn == 0, (M, bm, N, bn)
    return pl.pallas_call(
        _qmm_kernel,
        grid=(M // bm, N // bn),
        in_specs=[
            pl.BlockSpec((bm, K), lambda i, j: (i, 0)),
            pl.BlockSpec((K, bn), lambda i, j: (0, j)),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0)),
            pl.BlockSpec((1, bn), lambda i, j: (0, j)),
            pl.BlockSpec((1, bn), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
    )(x, w_q, act_scale.reshape(1, 1), w_scale.reshape(1, -1),
      bias.reshape(1, -1))


def xla_qmatmul(x, w_q, act_scale, w_scale, bias):
    a = act_scale[0]
    x_q = jnp.clip(jnp.round(x.astype(jnp.float32) / a), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(x_q, w_q, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * (a * w_scale[None, :]) + bias[None, :]
    return y.astype(x.dtype)


def slope(f, args):
    float(jnp.sum(f(*args).astype(jnp.float32)))

    def run(n):
        t0 = time.time()
        for _ in range(n):
            r = f(*args)
        float(jnp.sum(r.astype(jnp.float32)))
        return time.time() - t0

    run(4)
    ts = []
    for _ in range(3):
        t1 = min(run(16) for _ in range(2))
        t2 = min(run(64) for _ in range(2))
        ts.append((t2 - t1) / 48)
    return sum(ts) / len(ts)


def main():
    log(f"devices: {jax.devices()}")
    for (M, K, N) in ((200704, 96, 384), (12544, 384, 1536)):
        x = (jax.random.normal(KEY, (M, K)) * 0.5).astype(jnp.bfloat16)
        w_q = jnp.clip(jnp.round(jax.random.normal(
            jax.random.fold_in(KEY, 1), (K, N)) * 40), -127, 127).astype(jnp.int8)
        act_scale = jnp.asarray([0.02], jnp.float32)
        w_scale = jnp.full((N,), 0.01, jnp.float32)
        bias = jax.random.normal(jax.random.fold_in(KEY, 2), (N,)).astype(jnp.float32)
        args = (x, w_q, act_scale, w_scale, bias)

        fx = jax.jit(xla_qmatmul)
        fp = jax.jit(functools.partial(pallas_qmatmul))
        y_x = fx(*args)
        t0 = time.time()
        y_p = fp(*args)
        log(f"({M},{K},{N}): pallas compile+first {time.time()-t0:.1f}s")
        err = float(jnp.max(jnp.abs(y_p.astype(jnp.float32)
                                    - y_x.astype(jnp.float32))))
        tx, tp = slope(fx, args), slope(fp, args)
        log(f"({M},{K},{N}): XLA two-pass {tx*1e3:.3f} ms | pallas fused "
            f"{tp*1e3:.3f} ms = {tx/tp:.3f}x | maxdiff {err:.2e}")


if __name__ == "__main__":
    main()
