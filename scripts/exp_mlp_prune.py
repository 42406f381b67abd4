#!/usr/bin/env python
"""MlpPrune serving wall-clock on TPU: ConvNeXt-T b=64 @224, bf16.

ConvNeXt-T's MACs live in the block MLPs (4x expansion Linears — pure
MXU matmuls), so hidden-width pruning should track k/M much closer to
linearly than MSCAN (whose non-FFN parts are VPU-bound).  Rows:

  dense bf16                       — reference surface (~10.5 ms)
  mlpprune keep=0.75 / 0.5         — straight width cut
  dense int8                       — known 1.16x vs bf16
  mlpprune 0.5 + int8              — disjointness test: pruned Linears
                                     are still dense Linears, so PTQ
                                     covers them (same-layer composition,
                                     unlike V3+int8 which stacks two
                                     rewrites on the SAME weight)
  dwsep r1 + mlpprune 0.5 + int8   — triple stack vs the 5.82 ms record
                                     (DwSepRep r1 + int8)

Usage: python scripts/exp_mlp_prune.py [--keeps 0.75 0.5]
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
from convnet_approximater_tpu.core import DwSepRep, MlpPrune
from convnet_approximater_tpu.deploy import quantize_int8
from convnet_approximater_tpu.filters import DepthwiseConvFilter
from convnet_approximater_tpu.hooks.inference_time_hook import time_forward
from convnet_approximater_tpu.models import build_model
from convnet_approximater_tpu.utils import cast_floating


def build_t():
    m = build_model(dict(type="ConvNeXt", arch="tiny", num_classes=1000))
    return m, {"params": m.init(KEY), "state": m.init_state()}


def serve_time(m, var, shape, tag, cast=True):
    vb = ({"params": cast_floating(var["params"], jnp.bfloat16),
           "state": var.get("state", {})} if cast else var)
    _, _, times = time_forward(m, vb, shape, num_iters=8, warmup=2,
                               dtype=jnp.bfloat16)
    t = float(times.mean())
    log(f"{tag}: {t * 1e3:.3f} ms ({shape[0] / t:.0f} img/s)")
    return t


def int8ify(m, var, shape):
    # PTQ calibration on synthetic batches at the serving dtype
    var = {"params": cast_floating(var["params"], jnp.bfloat16),
           "state": var.get("state", {})}
    calib = [jax.random.normal(jax.random.key(7 + i), shape, jnp.bfloat16)
             for i in range(2)]
    n = quantize_int8(m, var, calib)
    log(f"  int8 sites: {n}")
    return m, var


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--keeps", type=float, nargs="+", default=[0.75, 0.5])
    args = ap.parse_args()
    shape = (B, 224, 224, 3)
    log(f"devices: {jax.devices()}")

    m, var = build_t()
    t_dense = serve_time(m, var, shape, "dense bf16")

    for keep in args.keeps:
        m, var = build_t()
        run_pipeline(m, var, MlpPrune(keep_ratio=keep), [])
        t = serve_time(m, var, shape, f"mlpprune keep={keep}")
        log(f"  -> {t_dense / t:.3f}x vs dense bf16")

    m, var = build_t()
    m, var = int8ify(m, var, shape)
    t = serve_time(m, var, shape, "dense int8", cast=False)
    log(f"  -> {t_dense / t:.3f}x vs dense bf16")

    m, var = build_t()
    run_pipeline(m, var, MlpPrune(keep_ratio=0.5), [])
    m, var = int8ify(m, var, shape)
    t = serve_time(m, var, shape, "mlpprune 0.5 + int8", cast=False)
    log(f"  -> {t_dense / t:.3f}x vs dense bf16")

    # prune FIRST (it substitutes whole blocks and carries the dwconv
    # params verbatim — the dwconv must still be a plain Conv2d), then
    # the depthwise rewrite targets the pruned blocks' dwconvs
    m, var = build_t()
    run_pipeline(m, var, MlpPrune(keep_ratio=0.5), [])
    run_pipeline(m, var, DwSepRep(ranks=1), [DepthwiseConvFilter()])
    m, var = int8ify(m, var, shape)
    t = serve_time(m, var, shape, "dwsep r1 + mlpprune 0.5 + int8",
                   cast=False)
    log(f"  -> {t_dense / t:.3f}x vs dense bf16 (record to beat: 5.82 ms)")


if __name__ == "__main__":
    main()
