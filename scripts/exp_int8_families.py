#!/usr/bin/env python
"""int8 PTQ across the fc/MLP-heavy families (QuantLinear + QuantConv2d).

VGG-16 (13 convs + 3 classifier fcs), AlexNet (5 convs + 3 fcs), and
ConvNeXt-T (stem/downsample convs + 36 pwconv Linears; the depthwise 7x7s
stay float) vs their bf16 serving surfaces.  Complements exp_int8_resnet.

Usage: python scripts/exp_int8_families.py [--model vgg16|alexnet|convnext|all]
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
from convnet_approximater_tpu.deploy import quantize_int8
from convnet_approximater_tpu.utils import cast_floating


def bench(name, build, B):
    x = jax.random.normal(KEY, (B, 224, 224, 3)).astype(jnp.bfloat16)
    model, variables = build()
    variables["params"] = cast_floating(variables["params"])
    log(f"{name} dense bf16 serving (b={B}):")
    t_bf16 = time_apply(model, variables, x)
    y_bf = jax.jit(lambda p, s, xx: model.apply(p, xx, state=s, training=False)[0])(
        variables["params"], variables.get("state", {}), x).astype(jnp.float32)

    calib = [jax.random.normal(jax.random.fold_in(KEY, i),
                               (8, 224, 224, 3)).astype(jnp.bfloat16) * 0.7
             for i in range(2)]
    nq = quantize_int8(model, variables, calib)
    log(f"{name} int8 ({nq} modules quantized):")
    t_int8 = time_apply(model, variables, x)
    y_q = jax.jit(lambda p, s, xx: model.apply(p, xx, state=s, training=False)[0])(
        variables["params"], variables.get("state", {}), x).astype(jnp.float32)
    rel = float(jnp.max(jnp.abs(y_q - y_bf)) / (jnp.max(jnp.abs(y_bf)) + 1e-9))
    log(f"{name} int8 summary (b={B}): bf16 {t_bf16*1e3:.2f} ms -> int8 "
        f"{t_int8*1e3:.2f} ms = {t_bf16/t_int8:.3f}x | logit max rel err "
        f"{rel:.4f} | {B/t_int8:.0f} img/s")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="all",
                    choices=["vgg16", "alexnet", "convnext", "all"])
    ap.add_argument("--batch", type=int, default=64)
    args = ap.parse_args()
    log(f"devices: {jax.devices()}")
    if args.model in ("vgg16", "all"):
        from convnet_approximater_tpu.models import VGG

        bench("VGG-16", lambda: (lambda m: (m, {"params": m.init(KEY)}))(
            VGG(depth=16, num_classes=1000)), args.batch)
    if args.model in ("alexnet", "all"):
        from convnet_approximater_tpu.models import AlexNet

        bench("AlexNet", lambda: (lambda m: (m, {"params": m.init(KEY)}))(
            AlexNet(num_classes=1000)), args.batch)
    if args.model in ("convnext", "all"):
        from convnet_approximater_tpu.models import ConvNeXt

        bench("ConvNeXt-T", lambda: (lambda m: (m, {"params": m.init(KEY)}))(
            ConvNeXt(arch="tiny", num_classes=1000)), args.batch)


if __name__ == "__main__":
    main()
