#!/usr/bin/env python
"""Width-quad family transfer: MSCAN-S (b=64 @224, bf16).

MSCAN-t's quad (trunk+attn+ffn prune 0.5 + rep) measured 1.912 ms =
1.61x over its ffnprune+rep record class; per the family-transfer rule
every family gets its own measurement.  Rows:

  dense bf16 (fold)
  ffnprune 0.5 + best-rep      (r4d record class: 6.248 ms)
  trunk+attn+ffn prune + rep   (the quad)

Usage: python scripts/exp_quad_families.py
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
    m = MSCAN_Classifier(num_classes=1000,
                         num_channels=(64, 128, 320, 512),
                         num_blocks=(2, 2, 4, 2),
                         exp_ratios=(8, 8, 4, 4))
    return m, {"params": m.init(KEY), "state": m.init_state()}


def main():
    shape = (B, 224, 224, 3)
    log(f"devices: {jax.devices()}")

    m, var = build()
    fold_batchnorm(m, var)
    t_dense = serve_time(m, var, shape, "MSCAN-S dense bf16 (fold)")

    m, var = build()
    run_pipeline(m, var, FfnPrune(keep_ratio=0.5, round_to=128), [])
    m, var = best_rep(m, var, shape)
    t_rec = serve_time(m, var, shape, "MSCAN-S ffnprune 0.5 + best-rep")
    log(f"  -> {t_dense / t_rec:.3f}x vs dense (record row)")

    m, var = build()
    nt = prune_trunks(m, var, keep_ratio=0.5, round_to=64)
    run_pipeline(m, var, AttnPrune(keep_ratio=0.5), [])
    run_pipeline(m, var, FfnPrune(keep_ratio=0.5, round_to=128), [])
    m, var = best_rep(m, var, shape)
    t = serve_time(m, var, shape,
                   f"MSCAN-S trunk({nt})+attn+ffn prune 0.5 + rep (quad)")
    log(f"  -> {t_dense / t:.3f}x vs dense, {t_rec / t:.3f}x vs the "
        f"record row")


if __name__ == "__main__":
    main()
