#!/usr/bin/env python
"""FfnPrune family transfer on TPU: MSCAN-S (b=64 @224) and SegNeXt-T
(b=16 @512²), bf16 serving.

MSCAN-t's measured result (exp_ffn_prune.py): prune keep=0.5 stacked on
the arbitrated msca-rep recipe broke the serving floor (3.404 ms =
1.19x over best-rep).  Per the family-transfer rule (exact-rewrite
transfer was family-dependent, doc/perf-notes.md r4c) each family gets
its own measurement:

  MSCAN-S: dense bf16 -> best arbitrated recipe (record 7.31 ms) ->
           prune 0.5 + same recipe
  SegNeXt-T: dense bf16 -> rep recipe (record 15.28 ms) ->
           prune 0.5 + rep (FfnPrune hits the BACKBONE FFNs; the Ham
           head has no FFN modules)

Usage: python scripts/exp_prune_families.py [--family mscan-s|segnext|all]
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


def serve_time(m, var, shape, tag):
    vb = {"params": cast_floating(var["params"], jnp.bfloat16),
          "state": var.get("state", {})}
    _, _, times = time_forward(m, vb, shape, num_iters=8, warmup=2,
                               dtype=jnp.bfloat16)
    t = float(times.mean())
    log(f"{tag}: {t * 1e3:.3f} ms ({shape[0] / t:.0f} img/s)")
    return t


def best_rep(m, var, shape):
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


def run_family(name, build, shape, keep=0.5):
    m, var = build()
    fold_batchnorm(m, var)
    t_dense = serve_time(m, var, shape, f"{name} dense bf16 (fold)")

    m, var = build()
    m, var = best_rep(m, var, shape)
    t_rep = serve_time(m, var, shape, f"{name} best-rep")
    log(f"  -> {t_dense / t_rep:.3f}x vs dense bf16")

    m, var = build()
    run_pipeline(m, var, FfnPrune(keep_ratio=keep, round_to=128), [])
    m, var = best_rep(m, var, shape)
    t = serve_time(m, var, shape, f"{name} prune {keep} + best-rep")
    log(f"  -> {t_dense / t:.3f}x vs dense bf16, {t_rep / t:.3f}x vs "
        f"best-rep")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", default="all",
                    choices=["mscan-s", "segnext", "all"])
    args = ap.parse_args()
    log(f"devices: {jax.devices()}")

    if args.family in ("mscan-s", "all"):
        def build_s():
            m = MSCAN_Classifier(num_classes=1000,
                                 num_channels=(64, 128, 320, 512),
                                 num_blocks=(2, 2, 4, 2),
                                 exp_ratios=(8, 8, 4, 4))
            return m, {"params": m.init(KEY), "state": m.init_state()}

        run_family("MSCAN-S", build_s, (B, 224, 224, 3))

    if args.family in ("segnext", "all"):
        from convnet_approximater_tpu.segmentation import SegNeXt

        def build_seg():
            m = SegNeXt(num_classes=19)
            return m, {"params": m.init(KEY), "state": m.init_state()}

        run_family("SegNeXt-T", build_seg, (16, 512, 512, 3))


if __name__ == "__main__":
    main()
