#!/usr/bin/env python
"""Scan-vs-unrolled A/B on the QUAD record surface (r5 profile follow-up).

The post-quad profile (`profile_mscan_floor.py --config quad`) puts 46%
of device time in the scan while-loop: per-iteration overheads (stacked-
param dynamic slices, loop bookkeeping, no cross-block fusion) do NOT
shrink with channel width, so their share doubles when the quad halves
the compute.  The r3b full-width A/B was NOT significant
(-0.045±0.080 ms on a 4.2 ms model); this re-runs it at the 1.9 ms quad
point with the interleaved method.  Same quad build as
bench.bench_records (FfnRep decisions replayed from the committed
table), bf16, b=64 @224.

Usage: python scripts/exp_quad_unroll.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cat_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp

from bench import B, KEY, log, run_pipeline
from exp_pw_interleaved import slope_time
from convnet_approximater_tpu.core import AttnPrune, FfnPrune, FfnRep, MscaRep
from convnet_approximater_tpu.deploy import (arbitrated_apply,
                                             enable_pw_matmul,
                                             fold_batchnorm, prune_trunks)
from convnet_approximater_tpu.hooks.inference_time_hook import time_forward
from convnet_approximater_tpu.models import MSCAN_Classifier
from convnet_approximater_tpu.utils import cast_floating


def build_quad():
    shape = (B, 224, 224, 3)
    m = MSCAN_Classifier(num_classes=1000)
    var = {"params": m.init(KEY), "state": m.init_state()}
    prune_trunks(m, var, keep_ratio=0.5, round_to=64)
    run_pipeline(m, var, AttnPrune(keep_ratio=0.5), [])
    run_pipeline(m, var, FfnPrune(keep_ratio=0.5, round_to=128), [])
    run_pipeline(m, var, MscaRep(decomp=1, fix=True, decomp_conv0=True), [])

    def timed(mm, vv, s, dt):
        vb = {"params": cast_floating(vv["params"], jnp.bfloat16),
              "state": vv.get("state", {})}
        _, _, ts = time_forward(mm, vb, s, num_iters=6, warmup=2,
                                dtype=jnp.bfloat16)
        return float(ts.mean())

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    arbitrated_apply(
        m, var, FfnRep(fix=True), [], shape, dtype=jnp.bfloat16,
        time_fn=timed, group_fn=lambda n: n.rsplit(".", 3)[0], verbose=False,
        decisions_path=os.path.join(root, "doc", "record_decisions",
                                    "mscan-t_ffnrep.json"))
    fold_batchnorm(m, var)
    enable_pw_matmul(m)
    var = {"params": cast_floating(var["params"], jnp.bfloat16),
           "state": var["state"]}
    return m, var


def main():
    log(f"devices: {jax.devices()}")
    x = jax.random.normal(KEY, (B, 224, 224, 3)).astype(jnp.bfloat16)

    m, var = build_quad()
    args = (var["params"], var["state"], x)

    def fwd(params, state, xx):
        y, _, _ = m.apply(params, xx, state=state, training=False)
        return y

    f_scan = jax.jit(fwd)
    float(jnp.sum(f_scan(*args)))
    log("scan variant compiled")

    for mod in [m] + [mm for _, mm in m.named_modules()]:
        if hasattr(mod, "scan_blocks"):
            mod.scan_blocks = "off"

    def fwd_un(params, state, xx):
        y, _, _ = m.apply(params, xx, state=state, training=False)
        return y

    f_un = jax.jit(fwd_un)
    y_s, y_u = f_scan(*args), f_un(*args)
    err = float(jnp.max(jnp.abs(y_s.astype(jnp.float32)
                                - y_u.astype(jnp.float32))))
    log(f"unrolled variant compiled (max|dy| vs scan = {err:.2e})")

    deltas = []
    for i in range(6):
        ta = slope_time(f_scan, args)
        tb = slope_time(f_un, args)
        deltas.append(ta - tb)
        log(f"  pair {i}: scan {ta*1e3:.3f} ms | unrolled {tb*1e3:.3f} ms | "
            f"delta {1e3*(ta-tb):+.3f} ms")
    mean = sum(deltas) / len(deltas)
    std = (sum((d - mean) ** 2 for d in deltas) / len(deltas)) ** 0.5
    log(f"quad unroll effect: {mean*1e3:+.3f} ± {std*1e3:.3f} ms "
        f"({'UNROLL WINS' if mean > 2 * std else 'not significant'})")


if __name__ == "__main__":
    main()
