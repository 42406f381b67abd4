#!/usr/bin/env python
"""Does the 1x1-as-matmul lowering (a measured bf16-serving win) also pay on
the f32 HEADLINE config (MSCAN-t msca-rep d1+fix, b=64)?  Interleaved A/B
(pairwise deltas cancel the relay's ±0.1 ms drift)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cat_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp

from bench import B, KEY, log, run_pipeline
from convnet_approximater_tpu.core import MscaRep
from convnet_approximater_tpu.deploy import enable_pw_matmul
from convnet_approximater_tpu.models import MSCAN_Classifier


def build_rep():
    m = MSCAN_Classifier(num_classes=1000)
    v = {"params": m.init(KEY), "state": m.init_state()}
    return run_pipeline(m, v, MscaRep(decomp=1, fix=True), [])


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
    x = jax.random.normal(KEY, (B, 224, 224, 3))

    m_off, v_off = build_rep()
    m_on, v_on = build_rep()
    n = enable_pw_matmul(m_on)
    log(f"enable_pw_matmul: {n} convs switched")

    def mk(model):
        def fwd(params, state, xx):
            y, _, _ = model.apply(params, xx, state=state, training=False)
            return y

        return jax.jit(fwd)

    f_off, f_on = mk(m_off), mk(m_on)
    a_off = (v_off["params"], v_off["state"], x)
    a_on = (v_on["params"], v_on["state"], x)
    float(jnp.sum(f_off(*a_off)))
    float(jnp.sum(f_on(*a_on)))

    deltas = []
    for i in range(6):
        ta = slope_time(f_off, a_off)
        tb = slope_time(f_on, a_on)
        deltas.append(ta - tb)
        log(f"  pair {i}: off {ta*1e3:.3f} ms | on {tb*1e3:.3f} ms | "
            f"delta {1e3*(ta-tb):+.3f} ms")
    mean = sum(deltas) / len(deltas)
    std = (sum((d - mean) ** 2 for d in deltas) / len(deltas)) ** 0.5
    log(f"pw_matmul on f32 headline rep: {mean*1e3:+.3f} ± {std*1e3:.3f} ms "
        f"({'WIN' if mean > 2 * std else 'not significant'})")


if __name__ == "__main__":
    main()
