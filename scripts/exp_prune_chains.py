#!/usr/bin/env python
"""prune_chains serving wall-clock on TPU: AlexNet / VGG-16 / ResNet-18,
b=64 @224, bf16 + int8 stacks.

The FFN/MLP prune apps cover the attention families; this measures the
cross-layer chain pruning (``deploy.prune_chains``) on the plain-CNN
families at keep 0.5 (producer/consumer junctions: conv stacks,
classifier Linears, ResNet block internals).  Rows per family:

  dense bf16 (fold)        — reference surface
  chainprune 0.5 (fold)    — width-pruned bf16
  dense int8               — the current family records (R18 1.78 ms,
                             VGG 9.82, AlexNet 0.69)
  chainprune 0.5 + int8    — stack: pruned convs/Linears are still dense,
                             PTQ covers them

Usage: python scripts/exp_prune_chains.py [--family alexnet|vgg16|resnet18|all]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cat_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp

from bench import B, KEY, log
from convnet_approximater_tpu.deploy import (fold_batchnorm, prune_chains,
                                             quantize_int8)
from convnet_approximater_tpu.hooks.inference_time_hook import time_forward
from convnet_approximater_tpu.models import build_model
from convnet_approximater_tpu.utils import cast_floating


def serve_time(m, var, shape, tag, cast=True):
    vb = ({"params": cast_floating(var["params"], jnp.bfloat16),
           "state": var.get("state", {})} if cast else var)
    _, _, times = time_forward(m, vb, shape, num_iters=8, warmup=2,
                               dtype=jnp.bfloat16)
    t = float(times.mean())
    log(f"{tag}: {t * 1e3:.3f} ms ({shape[0] / t:.0f} img/s)")
    return t


def int8ify(m, var, shape):
    var = {"params": cast_floating(var["params"], jnp.bfloat16),
           "state": var.get("state", {})}
    calib = [jax.random.normal(jax.random.key(7 + i), shape, jnp.bfloat16)
             for i in range(2)]
    n = quantize_int8(m, var, calib)
    log(f"  int8 sites: {n}")
    return m, var


def run_family(name, cfg, shape):
    def build():
        m = build_model(dict(num_classes=1000, **cfg))
        return m, {"params": m.init(KEY), "state": m.init_state()}

    m, var = build()
    fold_batchnorm(m, var)
    t_dense = serve_time(m, var, shape, f"{name} dense bf16 (fold)")

    m, var = build()
    n = prune_chains(m, var, keep_ratio=0.5, round_to=64)
    fold_batchnorm(m, var)
    t = serve_time(m, var, shape, f"{name} chainprune 0.5 ({n} junctions, "
                                  f"fold)")
    log(f"  -> {t_dense / t:.3f}x vs dense bf16")

    m, var = build()
    fold_batchnorm(m, var)
    m, var = int8ify(m, var, shape)
    t8 = serve_time(m, var, shape, f"{name} dense int8", cast=False)
    log(f"  -> {t_dense / t8:.3f}x vs dense bf16")

    m, var = build()
    prune_chains(m, var, keep_ratio=0.5, round_to=64)
    fold_batchnorm(m, var)
    m, var = int8ify(m, var, shape)
    t = serve_time(m, var, shape, f"{name} chainprune 0.5 + int8",
                   cast=False)
    log(f"  -> {t_dense / t:.3f}x vs dense bf16, {t8 / t:.3f}x vs dense "
        f"int8")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", default="all",
                    choices=["alexnet", "vgg16", "resnet18", "all"])
    args = ap.parse_args()
    shape = (B, 224, 224, 3)
    log(f"devices: {jax.devices()}")
    fams = {"alexnet": ("AlexNet", dict(type="AlexNet")),
            "vgg16": ("VGG-16", dict(type="VGG", depth=16)),
            "resnet18": ("ResNet-18", dict(type="ResNet", depth=18))}
    for key, (name, cfg) in fams.items():
        if args.family in (key, "all"):
            run_family(name, cfg, shape)


if __name__ == "__main__":
    main()
