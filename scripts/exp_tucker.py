#!/usr/bin/env python
"""LowRankExpV4 (Tucker-2) vs V3 (channel-rank) vs dense — wall-clock +
MACs on the families where V3 won (round 4).

Both factorizations are all-dense-MXU; Tucker-2 compresses BOTH channel
modes, so at matched ranks its kxk term shrinks from C k^2 r to r1 r2 k^2.
The open question is wall-clock: three thin convs vs two — more kernel
launches/fusion boundaries per site.  Measured in f32 raw (the V3
crossover regime) AND bf16+bnfold serving form.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cat_jax_cache"))

from bench import B, KEY, log, run_pipeline, time_apply, wait_for_relay
from convnet_approximater_tpu.core import LowRankExpV3, LowRankExpV4
from convnet_approximater_tpu.deploy import fold_batchnorm
from convnet_approximater_tpu.filters import (IndicesFilter, KernelSizeFilter,
                                              SimpleConvFilter)
from convnet_approximater_tpu.hooks.model_analysis import analyze_model
from convnet_approximater_tpu.models import VGG, AlexNet, ResNet
from convnet_approximater_tpu.utils import cast_floating


def report(tag, m, v, x):
    t = time_apply(m, v, x)
    info = analyze_model(m, v, x.shape, dtype=x.dtype)
    log(f"  {tag}: {t * 1e3:.3f} ms | MACs {info['macs'] / 1e9:.2f} G")
    return t


def bf16(m, v, x, tag):
    n = fold_batchnorm(m, v)
    vb = {"params": cast_floating(v["params"]), "state": v.get("state", {})}
    return report(f"{tag} bf16+fold({n})", m, vb, x.astype(jnp.bfloat16))


def main():
    wait_for_relay()
    x = jax.random.normal(KEY, (B, 224, 224, 3))

    # --- VGG-16 convs 2-13 (the V3 1.05x f32 / 1.38x bf16 site) ---------
    vgg_N = (64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512)
    vgg_C = (64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512)
    m0 = VGG(depth=16, num_classes=1000)
    v0 = {"params": m0.init(KEY), "state": m0.init_state()}
    log("VGG-16:")
    t_d = report("dense f32", m0, v0, x)
    t_db = bf16(m0, v0, x, "dense")
    for div in (2, 4):
        m3 = VGG(depth=16, num_classes=1000)
        v3 = {"params": m3.init(KEY), "state": m3.init_state()}
        m3, v3 = run_pipeline(m3, v3,
                              LowRankExpV3(num_bases=tuple(n // div
                                                           for n in vgg_N)),
                              [SimpleConvFilter(),
                               IndicesFilter(tuple(range(2, 14)))])
        t = report(f"V3 r=N/{div} f32", m3, v3, x)
        log(f"    -> {t_d / t:.3f}x vs dense f32")
        m4 = VGG(depth=16, num_classes=1000)
        v4 = {"params": m4.init(KEY), "state": m4.init_state()}
        ranks = tuple((c // div, n // div) for c, n in zip(vgg_C, vgg_N))
        m4, v4 = run_pipeline(m4, v4, LowRankExpV4(num_bases=ranks),
                              [SimpleConvFilter(),
                               IndicesFilter(tuple(range(2, 14)))])
        t = report(f"V4 tucker r=(C,N)/{div} f32", m4, v4, x)
        log(f"    -> {t_d / t:.3f}x vs dense f32")
        tb = bf16(m4, v4, x, f"V4 r/{div}")
        log(f"    -> {t_db / tb:.3f}x vs dense bf16")

    # --- AlexNet convs 2-5 (reference's own targets; V3 1.26x at r=N/2) -
    m0 = AlexNet(num_classes=1000)
    v0 = {"params": m0.init(KEY), "state": {}}
    log("AlexNet:")
    t_d = report("dense f32", m0, v0, x)
    alex_C = (64, 192, 384, 256)
    alex_N = (192, 384, 256, 256)
    for div, tag in ((2, "r=/2"), (4, "r=/4")):
        m4 = AlexNet(num_classes=1000)
        v4 = {"params": m4.init(KEY), "state": {}}
        ranks = tuple((c // div, n // div) for c, n in zip(alex_C, alex_N))
        m4, v4 = run_pipeline(m4, v4, LowRankExpV4(num_bases=ranks),
                              [SimpleConvFilter(),
                               IndicesFilter(tuple(range(2, 6)))])
        t = report(f"V4 tucker {tag} f32", m4, v4, x)
        log(f"    -> {t_d / t:.3f}x vs dense f32")

    # --- ResNet-18 block 3x3s (V3 won only in bf16; r=N/4 1.32x) --------
    from bench import RESNET_BLOCK_MIDS

    mids = RESNET_BLOCK_MIDS[18]
    m0 = ResNet(depth=18, num_classes=1000)
    v0 = {"params": m0.init(KEY), "state": m0.init_state()}
    log("ResNet-18:")
    t_d = report("dense f32", m0, v0, x)
    m0b = ResNet(depth=18, num_classes=1000)
    v0b = {"params": m0b.init(KEY), "state": m0b.init_state()}
    t_db = bf16(m0b, v0b, x, "dense")
    for div in (2, 4):
        m4 = ResNet(depth=18, num_classes=1000)
        v4 = {"params": m4.init(KEY), "state": m4.init_state()}
        ranks = tuple((c // div, c // div) for c in mids)
        m4, v4 = run_pipeline(m4, v4, LowRankExpV4(num_bases=ranks),
                              [KernelSizeFilter(min_kernel=2, max_kernel=5),
                               IndicesFilter(tuple(range(1, 17)))])
        t = report(f"V4 tucker r=/{div} f32", m4, v4, x)
        log(f"    -> {t_d / t:.3f}x vs dense f32")
        tb = bf16(m4, v4, x, f"V4 r/{div}")
        log(f"    -> {t_db / tb:.3f}x vs dense bf16")


if __name__ == "__main__":
    main()
