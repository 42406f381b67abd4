#!/usr/bin/env python
"""ResNet trunk+chain keep-ratio frontier (VERDICT r4 #2 follow-up).

keep=0.5 is capacity-limited on the R18 recovery (73.4 vs 100 top-1,
doc/perf-notes.md r4e) — this times the GENTLER keeps so the accuracy-
gated row (<1% drop, measured by the demo protocol) has its serving
number: trunk+chain keep in {0.9, 0.75, 0.5}, bf16 and +int8, b=64 @224.

Usage: python scripts/exp_keep_frontier_resnet.py [--depth 18]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cat_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from bench import B, KEY, log
from exp_prune_chains import int8ify, serve_time
from convnet_approximater_tpu.deploy import (fold_batchnorm, prune_chains,
                                             prune_trunks)
from convnet_approximater_tpu.models import build_model


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--depth", type=int, default=18)
    args = ap.parse_args()
    shape = (B, 224, 224, 3)
    log(f"devices: {jax.devices()}")

    def build():
        m = build_model(dict(type="ResNet", depth=args.depth,
                             num_classes=1000))
        return m, {"params": m.init(KEY), "state": m.init_state()}

    name = f"ResNet-{args.depth}"
    m, var = build()
    fold_batchnorm(m, var)
    t_dense = serve_time(m, var, shape, f"{name} dense bf16 (fold)")

    for keep in (0.9, 0.75, 0.5):
        m, var = build()
        nt = prune_trunks(m, var, keep_ratio=keep, round_to=64)
        nc = prune_chains(m, var, keep_ratio=keep, round_to=64)
        fold_batchnorm(m, var)
        t = serve_time(m, var, shape,
                       f"{name} trunk+chain {keep} ({nt}t/{nc}j) bf16")
        log(f"  -> {t_dense / t:.3f}x vs dense bf16")

        m, var = build()
        prune_trunks(m, var, keep_ratio=keep, round_to=64)
        prune_chains(m, var, keep_ratio=keep, round_to=64)
        fold_batchnorm(m, var)
        m, var = int8ify(m, var, shape)
        t = serve_time(m, var, shape, f"{name} trunk+chain {keep} + int8",
                       cast=False)
        log(f"  -> {t_dense / t:.3f}x vs dense bf16")


if __name__ == "__main__":
    main()
