#!/usr/bin/env python
"""prune_trunks on MSCAN-t (b=64 @224, bf16): can the trunk cut push the
3.404 ms FfnPrune+rep record further?

The MSCAN trunk (stage width C) feeds EVERYTHING the floor profile
blames: the VPU-bound depthwise/MSCA work, the FFN roofline, and the
inter-stage layout copies all scale with C.  Rows:

  dense bf16 (fold)                     — context
  best-rep                              — exact-surface record (~4.04)
  ffnprune 0.5 + best-rep               — the 3.404 ms record
  trunk 0.5 (r=None) + ffnprune + rep   — unsnapped trunk cut
  trunk 0.5 (r=64)   + ffnprune + rep   — stage-2 snaps to 64
  trunk 0.5 stages 2-3 only + ffnprune + rep — thin early stages kept

All trunk rows are compressed-checkpoint class (CE/KD recovery).

Usage: python scripts/exp_trunk_mscan.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cat_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from bench import B, KEY, log, run_pipeline
from exp_prune_families import best_rep, serve_time
from convnet_approximater_tpu.core import FfnPrune
from convnet_approximater_tpu.deploy import fold_batchnorm, prune_trunks
from convnet_approximater_tpu.models import MSCAN_Classifier


def build():
    m = MSCAN_Classifier(num_classes=1000)
    return m, {"params": m.init(KEY), "state": m.init_state()}


def main():
    shape = (B, 224, 224, 3)
    log(f"devices: {jax.devices()}")

    m, var = build()
    fold_batchnorm(m, var)
    t_dense = serve_time(m, var, shape, "MSCAN-t dense bf16 (fold)")

    m, var = build()
    m, var = best_rep(m, var, shape)
    t_rep = serve_time(m, var, shape, "MSCAN-t best-rep")
    log(f"  -> {t_dense / t_rep:.3f}x vs dense")

    m, var = build()
    run_pipeline(m, var, FfnPrune(keep_ratio=0.5, round_to=128), [])
    m, var = best_rep(m, var, shape)
    t_p = serve_time(m, var, shape, "MSCAN-t ffnprune 0.5 + best-rep")
    log(f"  -> {t_dense / t_p:.3f}x vs dense (record row)")

    for tag, kw in (
        ("trunk 0.5 r=None", dict(keep_ratio=0.5, round_to=None)),
        ("trunk 0.5 r=64", dict(keep_ratio=0.5, round_to=64)),
        ("trunk 0.5 stages23", dict(
            keep_ratio=0.5, round_to=64,
            filter_fn=lambda path, mod: ".layers.2." in path
            or ".layers.3." in path)),
    ):
        m, var = build()
        nt = prune_trunks(m, var, verbose=True, **kw)
        run_pipeline(m, var, FfnPrune(keep_ratio=0.5, round_to=128), [])
        m, var = best_rep(m, var, shape)
        t = serve_time(m, var, shape,
                       f"MSCAN-t {tag} ({nt} trunks) + ffnprune + rep")
        log(f"  -> {t_dense / t:.3f}x vs dense, {t_p / t:.3f}x vs the "
            f"3.404-class row")

    # the OTHER width axis: the gated MSCA branch (VPU-bound depthwise)
    from convnet_approximater_tpu.core import AttnPrune

    m, var = build()
    run_pipeline(m, var, AttnPrune(keep_ratio=0.5), [])
    run_pipeline(m, var, FfnPrune(keep_ratio=0.5, round_to=128), [])
    m, var = best_rep(m, var, shape)
    t = serve_time(m, var, shape,
                   "MSCAN-t attnprune 0.5 + ffnprune + rep")
    log(f"  -> {t_dense / t:.3f}x vs dense, {t_p / t:.3f}x vs the "
        f"3.404-class row")

    m, var = build()
    prune_trunks(m, var, keep_ratio=0.5, round_to=64)
    run_pipeline(m, var, AttnPrune(keep_ratio=0.5), [])
    run_pipeline(m, var, FfnPrune(keep_ratio=0.5, round_to=128), [])
    m, var = best_rep(m, var, shape)
    t = serve_time(m, var, shape,
                   "MSCAN-t trunk+attn+ffn prune 0.5 + rep (quad)")
    log(f"  -> {t_dense / t:.3f}x vs dense, {t_p / t:.3f}x vs the "
        f"3.404-class row")


if __name__ == "__main__":
    main()
