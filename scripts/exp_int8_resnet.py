#!/usr/bin/env python
"""int8 PTQ on the ResNet serving surface (round-4 candidate #3).

Hypothesis (CLAUDE.md): MSCAN's int8 loss came from splitting XLA's conv
mega-fusions (doc/perf-notes.md "int8 PTQ serving"); a ResNet is a plain
chain of dense convs after ``fold_batchnorm``, so the quant/dequant ops
may fuse cleanly and the ~1.4x int8 MXU rate could convert to wall clock.

Protocol: dense -> fold BN -> bf16 (baseline surface) vs the same +
``deploy.quantize_int8`` over 2 calibration batches.  Logit agreement is
reported as max relative error vs the bf16 surface.

Usage: python scripts/exp_int8_resnet.py [--depth 50] [--batch 64]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cat_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp

from bench import KEY, log, time_apply
from convnet_approximater_tpu.deploy import fold_batchnorm, quantize_int8
from convnet_approximater_tpu.models import ResNet
from convnet_approximater_tpu.utils import cast_floating


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--depth", type=int, default=50)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--v3", type=int, default=0, metavar="DIV",
                    help="first decompose the block 3x3s with LowRankExpV3 "
                         "at r=N/DIV (BN folds through the factors), then "
                         "quantize — the compressed+quantized serving stack")
    args = ap.parse_args()
    B = args.batch
    name = f"ResNet-{args.depth}"
    log(f"devices: {jax.devices()}")

    x = jax.random.normal(KEY, (B, 224, 224, 3)).astype(jnp.bfloat16)

    model = ResNet(depth=args.depth, num_classes=1000)
    variables = {"params": model.init(KEY), "state": model.init_state()}
    if args.v3:
        from bench import run_pipeline
        from convnet_approximater_tpu.core import LowRankExpV3
        from convnet_approximater_tpu.filters import (
            IndicesFilter,
            KernelSizeFilter,
        )

        from bench import RESNET_BLOCK_MIDS

        mids = RESNET_BLOCK_MIDS[args.depth]
        app = LowRankExpV3(num_bases=tuple(n // args.v3 for n in mids))
        model, variables = run_pipeline(
            model, variables, app,
            [KernelSizeFilter(min_kernel=2, max_kernel=5),
             IndicesFilter(tuple(range(1, 17)))])
        name += f" V3 r=N/{args.v3}"
    n = fold_batchnorm(model, variables)
    variables["params"] = cast_floating(variables["params"])
    log(f"{name} BN-fold ({n}) bf16 serving baseline (b={B}):")
    t_bf16 = time_apply(model, variables, x)
    y_bf = jax.jit(lambda p, s, xx: model.apply(p, xx, state=s, training=False)[0])(
        variables["params"], variables.get("state", {}), x).astype(jnp.float32)

    calib = [jax.random.normal(jax.random.fold_in(KEY, i),
                               (8, 224, 224, 3)).astype(jnp.bfloat16) * 0.7
             for i in range(2)]
    nq = quantize_int8(model, variables, calib)
    log(f"{name} int8 PTQ ({nq} convs quantized):")
    t_int8 = time_apply(model, variables, x)
    y_q = jax.jit(lambda p, s, xx: model.apply(p, xx, state=s, training=False)[0])(
        variables["params"], variables.get("state", {}), x).astype(jnp.float32)
    rel = float(jnp.max(jnp.abs(y_q - y_bf)) / (jnp.max(jnp.abs(y_bf)) + 1e-9))

    log(f"{name} int8 summary (b={B}): bf16 {t_bf16*1e3:.2f} ms -> int8 "
        f"{t_int8*1e3:.2f} ms = {t_bf16/t_int8:.3f}x | logit max rel err "
        f"{rel:.4f} | {B/t_int8:.0f} img/s")


if __name__ == "__main__":
    main()
