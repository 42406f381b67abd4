#!/usr/bin/env python
"""FfnPrune serving wall-clock on TPU: MSCAN-t b=64 @224, bf16.

The question kernel factorization could not answer for MSCAN (planner
r4d: V3 7.12 ms / Tucker 7.08 vs dense bf16 6.98 — MSCAN's kernels do
not compress) is whether the CHANNEL axis does: pruned FFN hidden dims
keep every op dense-MXU, just smaller.  Rows:

  dense bf16 (fold)               — the 6.98 ms reference surface
  prune keep=0.75 / 0.5 (+fold)   — straight channel cut on dense
  best-rep (d1+fix+dconv0+arb-ffnrep+fold+pw)   — the 4.10-4.12 record
  prune 0.75 + best-rep stack     — compressed-checkpoint record attempt

Timing selection does not need calibration (wall-clock is selection-
independent); accuracy recovery runs through configs/prune/*.py.
Usage: python scripts/exp_ffn_prune.py [--model mscan-t] [--keeps 0.75 0.5]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cat_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp

from bench import B, KEY, log, run_pipeline
from convnet_approximater_tpu.core import FfnPrune, FfnRep, MscaRep
from convnet_approximater_tpu.deploy import (arbitrated_apply, enable_pw_matmul,
                                             fold_batchnorm)
from convnet_approximater_tpu.hooks.inference_time_hook import time_forward
from convnet_approximater_tpu.models import MSCAN_Classifier
from convnet_approximater_tpu.utils import cast_floating


def build_t():
    m = MSCAN_Classifier(num_classes=1000)
    return m, {"params": m.init(KEY), "state": m.init_state()}


def serve_time(m, var, shape, tag):
    vb = {"params": cast_floating(var["params"], jnp.bfloat16),
          "state": var.get("state", {})}
    _, _, times = time_forward(m, vb, shape, num_iters=8, warmup=2,
                               dtype=jnp.bfloat16)
    t = float(times.mean())
    log(f"{tag}: {t * 1e3:.3f} ms ({shape[0] / t:.0f} img/s)")
    return t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--keeps", type=float, nargs="+", default=[0.75, 0.5])
    args = ap.parse_args()
    shape = (B, 224, 224, 3)
    log(f"devices: {jax.devices()}")

    m, var = build_t()
    fold_batchnorm(m, var)
    t_dense = serve_time(m, var, shape, "dense bf16 (fold)")

    for keep in args.keeps:
        m, var = build_t()
        run_pipeline(m, var, FfnPrune(keep_ratio=keep), [])
        fold_batchnorm(m, var)
        t = serve_time(m, var, shape, f"prune keep={keep} (fold)")
        log(f"  -> {t_dense / t:.3f}x vs dense bf16")

    def best_rep(m, var):
        run_pipeline(m, var, MscaRep(decomp=1, fix=True, decomp_conv0=True), [])

        def timed(mm, vv, s, dt):
            vb = {"params": cast_floating(vv["params"], jnp.bfloat16),
                  "state": vv.get("state", {})}
            _, _, times = time_forward(mm, vb, s, num_iters=6, warmup=2,
                                       dtype=jnp.bfloat16)
            return float(times.mean())

        arbitrated_apply(m, var, FfnRep(fix=True), [], shape,
                         dtype=jnp.bfloat16, time_fn=timed,
                         group_fn=lambda n: n.rsplit(".", 3)[0], verbose=True)
        fold_batchnorm(m, var)
        enable_pw_matmul(m)
        return m, var

    m, var = build_t()
    m, var = best_rep(m, var)
    t_rep = serve_time(m, var, shape, "best-rep (d1+fix+dconv0+arb-ffnrep"
                                      "+fold+pw)")
    log(f"  -> {t_dense / t_rep:.3f}x vs dense bf16")

    for keep in args.keeps:
        m, var = build_t()
        run_pipeline(m, var, FfnPrune(keep_ratio=keep), [])
        m, var = best_rep(m, var)
        t = serve_time(m, var, shape, f"prune keep={keep} + best-rep stack")
        log(f"  -> {t_dense / t:.3f}x vs dense bf16, {t_rep / t:.3f}x vs "
            f"best-rep")


if __name__ == "__main__":
    main()
