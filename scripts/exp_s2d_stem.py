#!/usr/bin/env python
"""Interleaved A/B for the space-to-depth stem rewrite
(``deploy.space_to_depth_stem``): targets the input-side layout copy +
3-channel lane waste the round-2b trace showed (copy.82/copy.152).

Both variants are the best bf16 serving config (d1+fix+dconv0+ffnrep+
bnfold+pw_matmul); B adds the S2D stem.  Relay drift is ±0.1 ms, so the
measurements alternate A,B,A,B and report pairwise deltas
(doc/perf-notes.md interleaved method).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cat_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp

from bench import B, KEY, log
from convnet_approximater_tpu.deploy import (
    enable_pw_matmul,
    fold_batchnorm,
    space_to_depth_stem,
)
from exp_pw_interleaved import slope_time
from exp_strip_matmul import build


def main():
    x = jax.random.normal(KEY, (B, 224, 224, 3)).astype(jnp.bfloat16)

    model_a, vars_a, _ = build("best")
    fold_batchnorm(model_a, vars_a)
    enable_pw_matmul(model_a)
    args_a = (vars_a["params"], vars_a["state"], x)

    def fwd_a(params, state, xx):
        y, _, _ = model_a.apply(params, xx, state=state, training=False)
        return y

    f_a = jax.jit(fwd_a)
    float(jnp.sum(f_a(*args_a)))
    log("variant A (baseline best) compiled")

    model_b, vars_b, _ = build("best")
    fold_batchnorm(model_b, vars_b)
    enable_pw_matmul(model_b)
    n = space_to_depth_stem(model_b, vars_b, verbose=True)
    log(f"space_to_depth_stem rewrote {n} conv(s)")
    args_b = (vars_b["params"], vars_b["state"], x)

    def fwd_b(params, state, xx):
        y, _, _ = model_b.apply(params, xx, state=state, training=False)
        return y

    f_b = jax.jit(fwd_b)
    float(jnp.sum(f_b(*args_b)))
    log("variant B (+s2d stem) compiled")

    # exactness spot check on-device (bf16 rounding tolerance)
    ya = f_a(*args_a)
    yb = f_b(*args_b)
    rel = float(jnp.linalg.norm((ya - yb).astype(jnp.float32))
                / jnp.linalg.norm(ya.astype(jnp.float32)))
    log(f"A/B output rel err: {rel:.2e}")

    deltas = []
    for i in range(6):
        ta = slope_time(f_a, args_a)
        tb = slope_time(f_b, args_b)
        deltas.append(ta - tb)
        log(f"  pair {i}: base {ta*1e3:.3f} ms | s2d {tb*1e3:.3f} ms | "
            f"delta {1e3*(ta-tb):+.3f} ms")
    mean = sum(deltas) / len(deltas)
    std = (sum((d - mean) ** 2 for d in deltas) / len(deltas)) ** 0.5
    log(f"s2d stem effect: {mean*1e3:+.3f} ± {std*1e3:.3f} ms "
        f"({'WIN' if mean > 2 * std else 'not significant'})")


if __name__ == "__main__":
    main()
