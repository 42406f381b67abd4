#!/usr/bin/env python
"""prune_trunks serving wall-clock on TPU: ResNet-18 / ResNet-50, b=64
@224, bf16 + int8 stacks.

``prune_chains`` alone leaves a residual family's trunk width untouched
(the identity adds pin it); ``deploy.prune_trunks`` cuts that width with
one shared mask per stage.  Rows per family:

  dense bf16 (fold)           — reference surface
  chainprune 0.5              — block internals only (the r4d record row)
  trunk+chain 0.5             — both axes (params ~4x down)
  dense int8                  — current R18 record (1.78 ms)
  trunk+chain 0.5 + int8      — the full stack

Also re-measures the AlexNet chainprune+int8 row that timed 0.000 ms in
r4d (relay acked without executing; the widened-span timer fix makes it
measurable).

Usage: python scripts/exp_prune_trunks.py [--family resnet18|resnet50|alexnet|all]
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


def run_resnet(name, depth, shape):
    def build():
        m = build_model(dict(type="ResNet", depth=depth, num_classes=1000))
        return m, {"params": m.init(KEY), "state": m.init_state()}

    m, var = build()
    fold_batchnorm(m, var)
    t_dense = serve_time(m, var, shape, f"{name} dense bf16 (fold)")

    m, var = build()
    nc = prune_chains(m, var, keep_ratio=0.5, round_to=64)
    fold_batchnorm(m, var)
    t = serve_time(m, var, shape, f"{name} chainprune 0.5 ({nc} junctions)")
    log(f"  -> {t_dense / t:.3f}x vs dense bf16")

    m, var = build()
    nt = prune_trunks(m, var, keep_ratio=0.5, round_to=64)
    nc = prune_chains(m, var, keep_ratio=0.5, round_to=64)
    fold_batchnorm(m, var)
    t = serve_time(m, var, shape,
                   f"{name} trunk+chain 0.5 ({nt} trunks, {nc} junctions)")
    log(f"  -> {t_dense / t:.3f}x vs dense bf16")

    m, var = build()
    fold_batchnorm(m, var)
    m, var = int8ify(m, var, shape)
    t8 = serve_time(m, var, shape, f"{name} dense int8", cast=False)
    log(f"  -> {t_dense / t8:.3f}x vs dense bf16")

    m, var = build()
    prune_trunks(m, var, keep_ratio=0.5, round_to=64)
    prune_chains(m, var, keep_ratio=0.5, round_to=64)
    fold_batchnorm(m, var)
    m, var = int8ify(m, var, shape)
    t = serve_time(m, var, shape, f"{name} trunk+chain 0.5 + int8",
                   cast=False)
    log(f"  -> {t_dense / t:.3f}x vs dense bf16, {t8 / t:.3f}x vs dense "
        f"int8")


def redo_alexnet(shape):
    def build():
        m = build_model(dict(type="AlexNet", num_classes=1000))
        return m, {"params": m.init(KEY), "state": m.init_state()}

    m, var = build()
    fold_batchnorm(m, var)
    t_dense = serve_time(m, var, shape, "AlexNet dense bf16 (fold)")

    m, var = build()
    n = prune_chains(m, var, keep_ratio=0.5, round_to=64)
    fold_batchnorm(m, var)
    m, var = int8ify(m, var, shape)
    t = serve_time(m, var, shape,
                   f"AlexNet chainprune 0.5 + int8 ({n} junctions, REDO)",
                   cast=False)
    log(f"  -> {t_dense / t:.3f}x vs dense bf16")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", default="all",
                    choices=["resnet18", "resnet50", "alexnet", "all"])
    args = ap.parse_args()
    shape = (B, 224, 224, 3)
    log(f"devices: {jax.devices()}")
    if args.family in ("resnet18", "all"):
        run_resnet("ResNet-18", 18, shape)
    if args.family in ("resnet50", "all"):
        run_resnet("ResNet-50", 50, shape)
    if args.family in ("alexnet", "all"):
        redo_alexnet(shape)


if __name__ == "__main__":
    main()
