#!/usr/bin/env python
"""prune_trunks on SegNeXt-T (b=16 @512², bf16): trunk cut under the
segmentation record recipe (FfnPrune 0.5 + rep = 14.00 ms, r4d).

The backbone trunks also feed the Ham head's squeeze conv (each tapped
stage is one segment of its concatenated input — the offset-aware
consumer slicing).  Rows:

  dense bf16 (fold)                      — context
  ffnprune 0.5 + best-rep                — the 14.00 ms record
  trunk 0.5 + ffnprune 0.5 + best-rep    — both axes

Usage: python scripts/exp_trunk_segnext.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cat_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from bench import KEY, log, run_pipeline
from exp_prune_families import best_rep, serve_time
from convnet_approximater_tpu.core import FfnPrune
from convnet_approximater_tpu.deploy import fold_batchnorm, prune_trunks
from convnet_approximater_tpu.segmentation import SegNeXt


def build():
    m = SegNeXt(num_classes=19)
    return m, {"params": m.init(KEY), "state": m.init_state()}


def main():
    shape = (16, 512, 512, 3)
    log(f"devices: {jax.devices()}")

    m, var = build()
    fold_batchnorm(m, var)
    t_dense = serve_time(m, var, shape, "SegNeXt-T dense bf16 (fold)")

    m, var = build()
    run_pipeline(m, var, FfnPrune(keep_ratio=0.5, round_to=128), [])
    m, var = best_rep(m, var, shape)
    t_rec = serve_time(m, var, shape, "SegNeXt-T ffnprune 0.5 + best-rep")
    log(f"  -> {t_dense / t_rec:.3f}x vs dense (record row)")

    m, var = build()
    nt = prune_trunks(m, var, keep_ratio=0.5, round_to=64, verbose=True)
    run_pipeline(m, var, FfnPrune(keep_ratio=0.5, round_to=128), [])
    m, var = best_rep(m, var, shape)
    t = serve_time(m, var, shape,
                   f"SegNeXt-T trunk 0.5 ({nt}) + ffnprune + rep")
    log(f"  -> {t_dense / t:.3f}x vs dense, {t_rec / t:.3f}x vs the "
        f"14.00-class row")

    # the full width quad (AttnPrune transfers: the backbone's gated MSCA
    # branches are the same modules the classifier prunes)
    from convnet_approximater_tpu.core import AttnPrune

    m, var = build()
    prune_trunks(m, var, keep_ratio=0.5, round_to=64)
    run_pipeline(m, var, AttnPrune(keep_ratio=0.5), [])
    run_pipeline(m, var, FfnPrune(keep_ratio=0.5, round_to=128), [])
    m, var = best_rep(m, var, shape)
    t = serve_time(m, var, shape, "SegNeXt-T trunk+attn+ffn prune + rep")
    log(f"  -> {t_dense / t:.3f}x vs dense, {t_rec / t:.3f}x vs the "
        f"14.00-class row")


if __name__ == "__main__":
    main()
