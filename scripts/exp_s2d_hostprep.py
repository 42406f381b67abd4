#!/usr/bin/env python
"""Variant C of the S2D stem experiment: the host delivers pre-blocked
(B, 112, 112, 12) batches (``expects_s2d_input=True``), so the device
program has the 4x-lane stem conv WITHOUT the on-device reshape that made
variant B lose (-0.112 ms, scripts/exp_s2d_stem.py).  Isolates reshape
cost vs lane-width win; if C beats base, the C++ batch-prep should S2D."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cat_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp

from bench import B, KEY, log
from convnet_approximater_tpu.deploy import (
    SpaceToDepthConv,
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

    model_c, vars_c, _ = build("best")
    fold_batchnorm(model_c, vars_c)
    enable_pw_matmul(model_c)
    space_to_depth_stem(model_c, vars_c)
    for _, mod in model_c.named_modules():
        if isinstance(mod, SpaceToDepthConv):
            mod.expects_s2d_input = True
    x_blocked = jax.device_put(SpaceToDepthConv.s2d(x))
    args_c = (vars_c["params"], vars_c["state"], x_blocked)

    def fwd_c(params, state, xx):
        y, _, _ = model_c.apply(params, xx, state=state, training=False)
        return y

    f_c = jax.jit(fwd_c)
    float(jnp.sum(f_c(*args_c)))
    log("variant C (host-prepped s2d input) compiled")

    ya, yc = f_a(*args_a), f_c(*args_c)
    rel = float(jnp.linalg.norm((ya - yc).astype(jnp.float32))
                / jnp.linalg.norm(ya.astype(jnp.float32)))
    log(f"A/C output rel err: {rel:.2e}")

    deltas = []
    for i in range(6):
        ta = slope_time(f_a, args_a)
        tc = slope_time(f_c, args_c)
        deltas.append(ta - tc)
        log(f"  pair {i}: base {ta*1e3:.3f} ms | hostS2D {tc*1e3:.3f} ms | "
            f"delta {1e3*(ta-tc):+.3f} ms")
    mean = sum(deltas) / len(deltas)
    std = (sum((d - mean) ** 2 for d in deltas) / len(deltas)) ** 0.5
    verdict = "WIN" if mean > 2 * std else ("LOSS" if -mean > 2 * std
                                            else "not significant")
    log(f"host-prepped s2d effect: {mean*1e3:+.3f} ± {std*1e3:.3f} ms ({verdict})")


if __name__ == "__main__":
    main()
