#!/usr/bin/env python
"""A/B: monolithic b=256 vs chunk_batch(128) on the ConvNeXt-T stack.

The r4 b=256 trace attributed the past-knee regression to HBM-side
elementwise fusions (perf-notes); the measured chunk arithmetic says
2 x 9.14 < 20.19 ms.  This validates ``deploy.chunk_batch`` end to end on
the TPU including its dispatch overhead (two dispatches + host concat).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cat_jax_cache"))

from bench import KEY, log, run_pipeline, wait_for_relay
from convnet_approximater_tpu.core import DwSepRep
from convnet_approximater_tpu.deploy import chunk_batch, quantize_int8
from convnet_approximater_tpu.filters import DepthwiseConvFilter
from convnet_approximater_tpu.models import ConvNeXt
from convnet_approximater_tpu.utils import cast_floating, device_resident


def main():
    wait_for_relay()
    m = ConvNeXt(arch="tiny", num_classes=1000)
    v = {"params": m.init(KEY)}
    m, v = run_pipeline(m, v, DwSepRep(ranks=1, strip_matmul=False),
                        [DepthwiseConvFilter()])
    v["params"] = cast_floating(v["params"])
    v["state"] = {}
    calib = [jax.random.normal(jax.random.fold_in(KEY, i),
                               (8, 224, 224, 3)).astype(jnp.bfloat16)
             for i in range(2)]
    nq = quantize_int8(m, v, calib)
    log(f"stack: DwSepRep rank-1 + int8 ({nq} modules)")
    params, state = device_resident(v)

    @jax.jit
    def fwd(x):
        y, _, _ = m.apply(params, x, state=state, training=False)
        return y

    x = jax.random.normal(KEY, (256, 224, 224, 3)).astype(jnp.bfloat16)
    x = jax.device_put(x)
    chunked = chunk_batch(fwd, 128)

    def slope(f, n1=8, n2=24, reps=3):
        float(jnp.sum(f(x)))  # compile + warm
        vals = []
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(n1):
                r = f(x)
            float(jnp.sum(r))
            t1 = time.perf_counter()
            for _ in range(n2):
                r = f(x)
            float(jnp.sum(r))
            t2 = time.perf_counter()
            vals.append(((t2 - t1) - (t1 - t0)) / (n2 - n1))
        mean = sum(vals) / len(vals)
        sd = (sum((v_ - mean) ** 2 for v_ in vals) / len(vals)) ** 0.5
        return mean, sd

    # interleaved A/B (CLAUDE.md: relay drifts +-0.1 ms across minutes)
    for rep in range(3):
        tm, sm = slope(fwd)
        tc, sc = slope(chunked)
        log(f"rep {rep}: monolithic b=256 {tm * 1e3:.3f}±{sm * 1e3:.3f} ms | "
            f"chunked 2x128 {tc * 1e3:.3f}±{sc * 1e3:.3f} ms | "
            f"delta {(tm - tc) * 1e3:+.3f} ms ({256 / tc:.0f} img/s chunked)")


if __name__ == "__main__":
    main()
