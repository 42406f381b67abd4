#!/usr/bin/env python
"""MSCAN-t width-quad keep-ratio frontier (b=64 @224, bf16).

The quad at keep=0.5 measured 1.912 ms; this sweeps the accuracy knob
(keep 0.75 / 0.5 / 0.25 on all three axes, ffn tile-snapped) so users
picking a recovery budget see the latency frontier.

Usage: python scripts/exp_quad_frontier.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cat_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from bench import B, KEY, log, run_pipeline
from exp_prune_families import best_rep, serve_time
from convnet_approximater_tpu.core import AttnPrune, FfnPrune
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

    for keep in (0.75, 0.5, 0.25):
        m, var = build()
        prune_trunks(m, var, keep_ratio=keep, round_to=64)
        run_pipeline(m, var, AttnPrune(keep_ratio=keep), [])
        run_pipeline(m, var, FfnPrune(keep_ratio=keep, round_to=128), [])
        m, var = best_rep(m, var, shape)
        t = serve_time(m, var, shape, f"MSCAN-t quad keep={keep} + rep")
        log(f"  -> {t_dense / t:.3f}x vs dense")


if __name__ == "__main__":
    main()
