#!/usr/bin/env python
"""A/B: default jit vs ``deploy.compile_serving`` (AUTO input layouts).

Measures whether letting XLA choose every input's layout (weights placed
once, batches placed pre-formatted) removes the input-side layout copies
(copy.152 in the round-2b trace, ~0.09 ms/fwd) on the best serving config.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cat_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from bench import B, KEY, log
from convnet_approximater_tpu.deploy import compile_serving, fold_batchnorm
from exp_strip_matmul import build


def time_callable(f, args, n1=16, n2=64, repeats=3):
    float(jnp.sum(f(*args)))

    def run(n):
        t0 = time.time()
        for _ in range(n):
            r = f(*args)
        float(jnp.sum(r))
        return time.time() - t0

    run(4)
    slopes = []
    for _ in range(repeats):
        t1 = min(run(n1) for _ in range(2))
        t2 = min(run(n2) for _ in range(2))
        slopes.append(max((t2 - t1) / (n2 - n1), 1e-9))
    mean = sum(slopes) / len(slopes)
    std = (sum((s - mean) ** 2 for s in slopes) / len(slopes)) ** 0.5
    log(f"  {mean*1e3:.3f} ± {std*1e3:.3f} ms/fwd ({B/mean:.0f} img/s)")
    return mean


def main():
    model, variables, dtype = build("best")
    fold_batchnorm(model, variables)
    x = jax.random.normal(KEY, (B, 224, 224, 3)).astype(dtype)

    def fwd(params, state, xx):
        y, _, _ = model.apply(params, xx, state=state, training=False)
        return y

    log("default jit:")
    t0 = time_callable(jax.jit(fwd), (variables["params"], variables["state"], x))

    log("compile_serving (AUTO input layouts):")
    compiled, put = compile_serving(fwd, variables["params"], variables["state"], x)
    p, s, xf = put(variables["params"], variables["state"], x)
    t1 = time_callable(compiled, (p, s, xf))
    log(f"default {t0*1e3:.3f} ms -> pinned {t1*1e3:.3f} ms ({(t0-t1)*1e3:+.3f} ms)")


if __name__ == "__main__":
    main()
