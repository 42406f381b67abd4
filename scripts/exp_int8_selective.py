#!/usr/bin/env python
"""Selective int8: quantize ONLY the merged-FFN 3x3 convs (path ends
'mlp.conv' — stage-1/2 after ffnrep), the single biggest MXU ops
(~1.5 ms/iter combined at 52-72% bf16 roofline).  Whole-model int8 LOSES
(exp_int8_serving.py: 4.15 -> 5.06 ms); this tests whether a narrow cut
wins where the probe said it should."""

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
from exp_int8_serving import slope_time
from exp_strip_matmul import build


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "mlp.conv"
    model, variables, dtype = build("best")
    fold_batchnorm(model, variables)
    x = jax.random.normal(KEY, (B, 224, 224, 3)).astype(dtype)

    import jax.tree_util as jtu
    v_bf = jtu.tree_map(lambda a: a, variables)

    def fwd_bf(params, state, xx):
        y, _, _ = model.apply(params, xx, state=state, training=False)
        return y

    f_bf = jax.jit(fwd_bf)
    float(jnp.sum(f_bf(v_bf["params"], v_bf["state"], x).astype(jnp.float32)))

    calib = [jax.random.normal(jax.random.fold_in(KEY, i),
                               (8, 224, 224, 3)).astype(dtype) * 0.7
             for i in range(2)]
    n = quantize_int8(model, variables, calib,
                      filter_fn=lambda path, conv: path.endswith(which))
    log(f"quantized {n} convs matching *{which}")

    def fwd_q(params, state, xx):
        y, _, _ = model.apply(params, xx, state=state, training=False)
        return y

    f_q = jax.jit(fwd_q)
    float(jnp.sum(f_q(variables["params"], variables["state"], x).astype(jnp.float32)))

    args_bf = (v_bf["params"], v_bf["state"], x)
    args_q = (variables["params"], variables["state"], x)
    deltas, tbs, tqs = [], [], []
    for i in range(5):
        tb = slope_time(f_bf, args_bf)
        tq = slope_time(f_q, args_q)
        tbs.append(tb); tqs.append(tq); deltas.append(tb - tq)
        log(f"  pair {i}: bf16 {tb*1e3:.3f} | int8[{which}] {tq*1e3:.3f} | "
            f"delta {1e3*(tb-tq):+.3f} ms")
    mb = sum(tbs) / len(tbs); mq = sum(tqs) / len(tqs)
    mean = sum(deltas) / len(deltas)
    std = (sum((d - mean) ** 2 for d in deltas) / len(deltas)) ** 0.5
    log(f"selective int8 [{which}]: {mean*1e3:+.3f} ± {std*1e3:.3f} ms "
        f"({mb*1e3:.3f} -> {mq*1e3:.3f}, {mb/mq:.3f}x)")


if __name__ == "__main__":
    main()
