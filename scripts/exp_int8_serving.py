#!/usr/bin/env python
"""Interleaved A/B: best bf16 serving config vs the same + int8 PTQ
(``deploy.quantize_int8``).  The v5e runs int8 convs at ~1.4x the bf16 rate
in-jit (probe in doc/perf-notes.md), so the dense convs (stem, downsamples,
proj/mix 1x1s, FFN fc1/fc2 + merged convs) should convert to wall clock.
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
from convnet_approximater_tpu.deploy import fold_batchnorm, quantize_int8
from exp_strip_matmul import build


def slope_time(f, args, n1=16, n2=64):
    def run(n):
        t0 = time.time()
        for _ in range(n):
            r = f(*args)
        float(jnp.sum(r.astype(jnp.float32)))
        return time.time() - t0

    t1 = min(run(n1) for _ in range(2))
    t2 = min(run(n2) for _ in range(2))
    return max((t2 - t1) / (n2 - n1), 1e-9)


def main():
    model, variables, dtype = build("best")
    fold_batchnorm(model, variables)
    x = jax.random.normal(KEY, (B, 224, 224, 3)).astype(dtype)

    # keep a structural snapshot of the tree for the bf16 side (quantize
    # edits dicts in place; leaves are shared, immutable)
    import jax.tree_util as jtu
    v_bf = jtu.tree_map(lambda a: a, variables)

    def fwd_bf(params, state, xx):
        y, _, _ = model.apply(params, xx, state=state, training=False)
        return y

    f_bf = jax.jit(fwd_bf)
    y_bf = f_bf(v_bf["params"], v_bf["state"], x)
    float(jnp.sum(y_bf.astype(jnp.float32)))  # compile A (pre-quant model)

    calib = [jax.random.normal(jax.random.fold_in(KEY, i),
                               (8, 224, 224, 3)).astype(dtype) * 0.7
             for i in range(2)]
    t0 = time.time()
    n = quantize_int8(model, variables, calib)
    log(f"quantized {n} dense convs in {time.time()-t0:.1f}s")

    def fwd_q(params, state, xx):
        y, _, _ = model.apply(params, xx, state=state, training=False)
        return y

    f_q = jax.jit(fwd_q)
    y_q = f_q(variables["params"], variables["state"], x)
    float(jnp.sum(y_q.astype(jnp.float32)))  # compile B
    rel = float(jnp.linalg.norm((y_q - y_bf).astype(jnp.float32))
                / (jnp.linalg.norm(y_bf.astype(jnp.float32)) + 1e-9))
    log(f"logits rel err int8 vs bf16: {rel:.4f}")

    args_bf = (v_bf["params"], v_bf["state"], x)
    args_q = (variables["params"], variables["state"], x)
    deltas, tbs, tqs = [], [], []
    for i in range(6):
        tb = slope_time(f_bf, args_bf)
        tq = slope_time(f_q, args_q)
        tbs.append(tb); tqs.append(tq); deltas.append(tb - tq)
        log(f"  pair {i}: bf16 {tb*1e3:.3f} ms | int8 {tq*1e3:.3f} ms | "
            f"delta {1e3*(tb-tq):+.3f} ms")
    mb = sum(tbs) / len(tbs); mq = sum(tqs) / len(tqs)
    mean = sum(deltas) / len(deltas)
    std = (sum((d - mean) ** 2 for d in deltas) / len(deltas)) ** 0.5
    log(f"int8 PTQ effect: {mean*1e3:+.3f} ± {std*1e3:.3f} ms "
        f"(bf16 {mb*1e3:.3f} -> int8 {mq*1e3:.3f} ms, {mb/mq:.3f}x, "
        f"{B/mq:.0f} img/s)")


if __name__ == "__main__":
    main()
