#!/usr/bin/env python
"""Serving throughput/latency vs batch size on the best bf16 config (v5e-1).

The headline runs b=64 (the reference's protocol); a serving deployment
picks the throughput-optimal batch (b=128 here) or the latency-optimal one
(interactive serving: b=1..8).  Sweeps 1..256 and reports ms/fwd, img/s,
and per-image latency.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cat_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp

from bench import KEY, log
from convnet_approximater_tpu.deploy import enable_pw_matmul, fold_batchnorm
from exp_strip_matmul import build


def slope_time(f, args, n1=16, n2=64):
    def run(n):
        t0 = time.time()
        for _ in range(n):
            r = f(*args)
        float(jnp.sum(r.astype(jnp.float32)))
        return time.time() - t0

    run(4)
    t1 = min(run(n1) for _ in range(2))
    t2 = min(run(n2) for _ in range(2))
    return max((t2 - t1) / (n2 - n1), 1e-9)


def main():
    model, variables, dtype = build("best")
    fold_batchnorm(model, variables)
    enable_pw_matmul(model)  # the round-3 serving default

    def fwd(params, state, xx):
        y, _, _ = model.apply(params, xx, state=state, training=False)
        return y

    jf = jax.jit(fwd)
    for B in (1, 2, 4, 8, 16, 32, 64, 128, 256):
        x = jax.random.normal(KEY, (B, 224, 224, 3)).astype(dtype)
        args = (variables["params"], variables["state"], x)
        float(jnp.sum(jf(*args).astype(jnp.float32)))  # compile this shape
        t = slope_time(jf, args)
        log(f"b={B:>3}: {t*1e3:7.3f} ms/fwd | {B/t:7.0f} img/s | "
            f"{t/B*1e6:6.1f} us/img")


if __name__ == "__main__":
    main()
