#!/usr/bin/env python
"""Interleaved A/B for the 1x1-as-matmul lowering: the axon relay drifts
~±0.1 ms across minutes (thermal/clock), swamping a ~0.1 ms effect when the
variants run back-to-back.  This compiles BOTH variants, then alternates
slope measurements A,B,A,B,... — pairwise deltas cancel the drift.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cat_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp

from bench import B, KEY, log
from convnet_approximater_tpu.deploy import enable_pw_matmul, fold_batchnorm
from exp_strip_matmul import build


def slope_time(f, args, n1=16, n2=64):
    def run(n):
        t0 = time.time()
        for _ in range(n):
            r = f(*args)
        float(jnp.sum(r))
        return time.time() - t0

    t1 = min(run(n1) for _ in range(2))
    t2 = min(run(n2) for _ in range(2))
    return max((t2 - t1) / (n2 - n1), 1e-9)


def main():
    model, variables, dtype = build("best")
    fold_batchnorm(model, variables)
    x = jax.random.normal(KEY, (B, 224, 224, 3)).astype(dtype)
    args = (variables["params"], variables["state"], x)

    def fwd_off(params, state, xx):
        y, _, _ = model.apply(params, xx, state=state, training=False)
        return y

    f_off = jax.jit(fwd_off)
    float(jnp.sum(f_off(*args)))  # compile A

    enable_pw_matmul(model)

    def fwd_on(params, state, xx):
        y, _, _ = model.apply(params, xx, state=state, training=False)
        return y

    f_on = jax.jit(fwd_on)
    float(jnp.sum(f_on(*args)))  # compile B

    deltas = []
    for i in range(6):
        ta = slope_time(f_off, args)
        tb = slope_time(f_on, args)
        deltas.append(ta - tb)
        log(f"  pair {i}: off {ta*1e3:.3f} ms | on {tb*1e3:.3f} ms | "
            f"delta {1e3*(ta-tb):+.3f} ms")
    mean = sum(deltas) / len(deltas)
    std = (sum((d - mean) ** 2 for d in deltas) / len(deltas)) ** 0.5
    log(f"pw_matmul(<=196) effect: {mean*1e3:+.3f} ± {std*1e3:.3f} ms "
        f"({'WIN' if mean > 2 * std else 'not significant'})")


if __name__ == "__main__":
    main()
