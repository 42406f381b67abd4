#!/usr/bin/env python
"""Disjoint-layer stack with Tucker-2: V4 on the kxk conv stacks + int8 on
the dense REMAINDER (fc/Linears, stem, downsamples) — the rule measured on
ConvNeXt (DwSepRep+int8 1.81x) applied to the V4 record points.

Same-layer stacks lose (V3+int8, perf-notes); here int8 only touches
modules V4 left dense, so the quant boundaries stay off the factored
sites.  Candidates:
  * VGG-16: V4 /4 on convs 2-13 + QuantLinear on the 3-fc classifier
    (VGG's MACs are conv-heavy but its params/bytes are fc-heavy).
  * ResNet-18: V4 /4 on the 16 block 3x3s + int8 on stem/downsamples/fc.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cat_jax_cache"))

from bench import B, KEY, log, run_pipeline, time_apply, wait_for_relay
from convnet_approximater_tpu.core import LowRankExpV4
from convnet_approximater_tpu.deploy import fold_batchnorm, quantize_int8
from convnet_approximater_tpu.filters import (IndicesFilter, KernelSizeFilter,
                                              SimpleConvFilter)
from convnet_approximater_tpu.models import VGG, ResNet
from convnet_approximater_tpu.utils import cast_floating


def calib(n=2, batch=8):
    return [jax.random.normal(jax.random.fold_in(KEY, 100 + i),
                              (batch, 224, 224, 3)).astype(jnp.bfloat16) * 0.8
            for i in range(n)]


def main():
    wait_for_relay()
    x = jax.random.normal(KEY, (B, 224, 224, 3)).astype(jnp.bfloat16)

    # --- VGG-16: V4 /4 convs + int8 Linears -----------------------------
    vgg_N = (64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512)
    vgg_C = (64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512)
    m = VGG(depth=16, num_classes=1000)
    v = {"params": m.init(KEY), "state": m.init_state()}
    ranks = tuple((c // 4, n // 4) for c, n in zip(vgg_C, vgg_N))
    m, v = run_pipeline(m, v, LowRankExpV4(num_bases=ranks),
                        [SimpleConvFilter(),
                         IndicesFilter(tuple(range(2, 14)))])
    fold_batchnorm(m, v)
    v = {"params": cast_floating(v["params"]), "state": v.get("state", {})}
    log("VGG-16 V4 /4 bf16 (pre-stack):")
    t0 = time_apply(m, v, x)
    from convnet_approximater_tpu.nn.layers import Linear

    nq = quantize_int8(m, v, calib(),
                       filter_fn=lambda path, mod: isinstance(mod, Linear))
    log(f"VGG-16 V4 /4 + int8 Linears ({nq} fc):")
    t1 = time_apply(m, v, x)
    log(f"  stack delta: {t0 * 1e3:.3f} -> {t1 * 1e3:.3f} ms "
        f"({t0 / t1:.3f}x on top; {B / t1:.0f} img/s)")

    # --- ResNet-18: V4 /4 block 3x3s + int8 remainder -------------------
    from bench import RESNET_BLOCK_MIDS

    mids = RESNET_BLOCK_MIDS[18]
    m = ResNet(depth=18, num_classes=1000)
    v = {"params": m.init(KEY), "state": m.init_state()}
    m, v = run_pipeline(m, v,
                        LowRankExpV4(num_bases=tuple((c // 4, c // 4)
                                                     for c in mids)),
                        [KernelSizeFilter(min_kernel=2, max_kernel=5),
                         IndicesFilter(tuple(range(1, 17)))])
    fold_batchnorm(m, v)
    v = {"params": cast_floating(v["params"]), "state": v.get("state", {})}
    log("ResNet-18 V4 /4 bf16 (pre-stack):")
    t0 = time_apply(m, v, x)
    # int8 the dense remainder only: plain Conv2d sites (stem 7x7 +
    # downsample 1x1s — quantize_int8 skips the factored V4 internals via
    # type gating? No: V4's in/core/out ARE plain Conv2d children, so gate
    # by path — only modules NOT under a V4 site.
    from convnet_approximater_tpu.layers import LowRankExpConvV4

    v4_prefixes = [p for p, mod in m.named_modules()
                   if isinstance(mod, LowRankExpConvV4)]

    def remainder_only(path, mod):
        return not any(path.startswith(p + ".") for p in v4_prefixes)

    nq = quantize_int8(m, v, calib(), filter_fn=remainder_only)
    log(f"ResNet-18 V4 /4 + int8 remainder ({nq} modules):")
    t1 = time_apply(m, v, x)
    log(f"  stack delta: {t0 * 1e3:.3f} -> {t1 * 1e3:.3f} ms "
        f"({t0 / t1:.3f}x on top; {B / t1:.0f} img/s)")


if __name__ == "__main__":
    main()
