#!/usr/bin/env python
"""README-table benchmarks beyond the headline: MSCAN-s and VGG-16.

MSCAN-s (the reference's larger classification config,
``/root/reference/configs/_base_/models/mscan/mscan-s.py``): original vs
msca-rep d1+fix vs best serving config (d1+fix+dconv0+ffnrep stages 1-2),
f32 and bf16.  VGG-16: dense vs scheme-1 decomposed (bases chosen at ~2x
MAC cut on the 3x3 stack), the BASELINE.json workload class.

Usage: python scripts/bench_models.py [--model mscan-s|vgg16|all] [--batch 64]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cat_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from bench import KEY, run_pipeline, time_apply
from convnet_approximater_tpu.core import FfnRep, LowRankExpV1, MscaRep
from convnet_approximater_tpu.filters import IndicesFilter, SimpleConvFilter
from convnet_approximater_tpu.models import MSCAN_Classifier, VGG
from convnet_approximater_tpu.utils import cast_floating


def log(msg):
    print(msg, flush=True)


def bench_mscan_s(B):
    x = jax.random.normal(KEY, (B, 224, 224, 3))
    model = MSCAN_Classifier(
        num_classes=1000, num_channels=(64, 128, 320, 512),
        num_blocks=(2, 2, 4, 2), exp_ratios=(8, 8, 4, 4))
    variables = {"params": model.init(KEY), "state": model.init_state()}
    log("MSCAN-s original f32:")
    t_orig = time_apply(model, variables, x)
    vb = {"params": cast_floating(variables["params"]), "state": variables["state"]}
    log("MSCAN-s original bf16:")
    t_orig_bf16 = time_apply(model, vb, x.astype(jnp.bfloat16))

    m2 = MSCAN_Classifier(
        num_classes=1000, num_channels=(64, 128, 320, 512),
        num_blocks=(2, 2, 4, 2), exp_ratios=(8, 8, 4, 4))
    v2 = {"params": m2.init(KEY), "state": m2.init_state()}
    m2, v2 = run_pipeline(m2, v2, MscaRep(decomp=1, fix=True), [])
    log("MSCAN-s msca-rep d1+fix f32 (headline config):")
    t_rep = time_apply(m2, v2, x)

    m3 = MSCAN_Classifier(
        num_classes=1000, num_channels=(64, 128, 320, 512),
        num_blocks=(2, 2, 4, 2), exp_ratios=(8, 8, 4, 4))
    v3 = {"params": m3.init(KEY), "state": m3.init_state()}
    m3, v3 = run_pipeline(m3, v3, MscaRep(decomp=1, fix=True, decomp_conv0=True), [])
    # stages 1-2 of mscan-s = the first 4 blocks (1-based indices)
    m3, v3 = run_pipeline(m3, v3, FfnRep(fix=True), [IndicesFilter((1, 2, 3, 4))])
    log("MSCAN-s best serving config f32:")
    t_best_f32 = time_apply(m3, v3, x)
    v3b = {"params": cast_floating(v3["params"]), "state": v3["state"]}
    log("MSCAN-s best serving config bf16:")
    t_best = time_apply(m3, v3b, x.astype(jnp.bfloat16))

    log(f"MSCAN-s summary (b={B}): orig f32 {t_orig*1e3:.2f} ms | "
        f"rep d1fix {t_rep*1e3:.2f} ms = {t_orig/t_rep:.3f}x | "
        f"best f32 {t_best_f32*1e3:.2f} ms = {t_orig/t_best_f32:.3f}x | "
        f"best bf16 {t_best*1e3:.2f} ms = {t_orig_bf16/t_best:.3f}x vs bf16 orig, "
        f"{t_orig/t_best:.3f}x vs f32 orig ({B/t_best:.0f} img/s)")


def bench_vgg16(B):
    x = jax.random.normal(KEY, (B, 224, 224, 3))
    model = VGG(depth=16, num_classes=1000)
    variables = {"params": model.init(KEY)}
    log("VGG-16 dense f32:")
    t_orig = time_apply(model, variables, x)

    m2 = VGG(depth=16, num_classes=1000)
    v2 = {"params": m2.init(KEY)}
    # scheme-1 on convs 2..13 (skip the first 3->64).  For k=3 kernels the
    # mixing conv costs M/9 of the original conv's MACs by itself, so only
    # small M cuts MACs at all: M=4 gives ~2.1x at C>=128 (the reference's
    # AlexNet cuts used M << k^2 on 11x11/5x5 kernels for the same reason).
    # Channel-proportional bases (C/16 and up) INCREASE MACs and create
    # C*M>=16384-channel intermediates that are HBM-catastrophic on any
    # hardware — measured 186 ms (0.107x) before this fix.
    bases = (4,) * 12
    app = LowRankExpV1(num_bases=bases, max_iter=0, lmda_length=1, min_lmda=0,
                       max_lmda=0, init_method="svd", do_decomp=True)
    # IndicesFilter is a 1-based cursor: positions 2..13 = convs 2-13
    # (matches configs/vgg/low-rank-exp-v1_all_svd_vgg16.py)
    m2, v2 = run_pipeline(m2, v2, app,
                          [SimpleConvFilter(), IndicesFilter(tuple(range(2, 14)))])
    log("VGG-16 scheme-1 decomposed (M=4 bases, layers 2-13) f32:")
    t_dec = time_apply(m2, v2, x)

    from convnet_approximater_tpu.deploy import never_lose_deploy

    # greedy=False: the per-layer story is already measured (doc/perf-notes
    # "grouped-conv wall" — every VGG scheme-1 layer loses individually), so
    # the whole-model A/B is sufficient and saves ~12 VGG compiles
    res = never_lose_deploy(m2, v2, x.shape, greedy=False, verbose=False)
    for row in res["layers"]:
        log(f"  [arbiter] {row['name']}: {row['kept']}")
    log("VGG-16 never-lose deploy surface f32:")
    t_nl = time_apply(m2, v2, x)
    log(f"VGG-16 summary (b={B}): dense {t_orig*1e3:.2f} ms -> decomposed "
        f"{t_dec*1e3:.2f} ms = {t_orig/t_dec:.3f}x | never-lose deploy "
        f"{t_nl*1e3:.2f} ms = {t_orig/t_nl:.3f}x "
        f"({res['kept_decomposed']}/{len(res['layers'])} kept decomposed)")


def bench_resnet(B, depth=18):
    """ResNet (beyond-reference family, models/resnet.py): dense f32,
    BN-folded bf16 serving, and scheme-1 on the block 3x3s under the
    never-lose arbiter.  All block convs are bias-less (BN absorbs the
    bias) so the registration skips SimpleConvFilter and keys on kernel
    size instead.  Both 18 (BasicBlock, 16 3x3s) and 50 (Bottleneck, 16
    3x3s — one per block; the 1x1s carry most MACs and stay dense) have
    exactly 16 scheme-1 candidates after the KernelSizeFilter drops the
    7x7 stem."""
    from convnet_approximater_tpu.deploy import fold_batchnorm, never_lose_deploy
    from convnet_approximater_tpu.filters import KernelSizeFilter
    from convnet_approximater_tpu.models import ResNet

    name = f"ResNet-{depth}"
    x = jax.random.normal(KEY, (B, 224, 224, 3))

    def build():
        m = ResNet(depth=depth, num_classes=1000)
        return m, {"params": m.init(KEY), "state": m.init_state()}

    model, variables = build()
    log(f"{name} dense f32 (b={B}):")
    t_orig = time_apply(model, variables, x)

    m_s, v_s = build()
    n_folded = fold_batchnorm(m_s, v_s)
    v_sb = {"params": cast_floating(v_s["params"]), "state": v_s["state"]}
    log(f"{name} BN-folded ({n_folded} pairs) bf16 serving:")
    t_serve = time_apply(m_s, v_sb, x.astype(jnp.bfloat16))

    m2, v2 = build()
    # scheme-1 on the 16 block 3x3s (the 7x7 stem is dropped by
    # max_kernel=5 BEFORE the IndicesFilter cursor sees it); M=4 for the
    # same mixing-conv math as VGG (k=3 => M/9 overhead per conv).
    app = LowRankExpV1(num_bases=(4,) * 16, max_iter=0, lmda_length=1,
                       min_lmda=0, max_lmda=0, init_method="svd",
                       do_decomp=True)
    m2, v2 = run_pipeline(
        m2, v2, app,
        [KernelSizeFilter(min_kernel=2, max_kernel=5),
         IndicesFilter(tuple(range(1, 17)))])
    log(f"{name} scheme-1 decomposed (M=4, block 3x3s) f32:")
    t_dec = time_apply(m2, v2, x)

    res = never_lose_deploy(m2, v2, x.shape, greedy=False, verbose=False)
    for row in res["layers"]:
        log(f"  [arbiter] {row['name']}: {row['kept']}")
    log(f"{name} never-lose deploy surface f32:")
    t_nl = time_apply(m2, v2, x)
    log(f"{name} summary (b={B}): dense {t_orig*1e3:.2f} ms | serving "
        f"bf16+fold {t_serve*1e3:.2f} ms = {t_orig/t_serve:.3f}x "
        f"({B/t_serve:.0f} img/s) | decomposed {t_dec*1e3:.2f} ms = "
        f"{t_orig/t_dec:.3f}x | never-lose {t_nl*1e3:.2f} ms = "
        f"{t_orig/t_nl:.3f}x ({res['kept_decomposed']}/{len(res['layers'])} "
        f"kept decomposed)")


def bench_v3(B):
    """LowRankExpV3 (channel-rank: dense kxk C->r + 1x1 r->N) on VGG-16 and
    ResNet-18 — the TPU answer to scheme-1's grouped-conv wall.  Expected
    MAC ratio at r=N/2 ~ 0.56, at r=N/4 ~ 0.31."""
    from convnet_approximater_tpu.core import LowRankExpV3
    from convnet_approximater_tpu.deploy import never_lose_deploy
    from convnet_approximater_tpu.filters import KernelSizeFilter
    from convnet_approximater_tpu.models import ResNet

    x = jax.random.normal(KEY, (B, 224, 224, 3))

    vgg_N = (64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512)
    for div in (2, 4):
        model = VGG(depth=16, num_classes=1000)
        variables = {"params": model.init(KEY)}
        log(f"VGG-16 dense f32 (b={B}):")
        t_orig = time_apply(model, variables, x)
        m2 = VGG(depth=16, num_classes=1000)
        v2 = {"params": m2.init(KEY)}
        app = LowRankExpV3(num_bases=tuple(n // div for n in vgg_N))
        m2, v2 = run_pipeline(m2, v2, app,
                              [SimpleConvFilter(),
                               IndicesFilter(tuple(range(2, 14)))])
        log(f"VGG-16 V3 r=N/{div} f32:")
        t_v3 = time_apply(m2, v2, x)
        res = never_lose_deploy(m2, v2, x.shape, greedy=False, verbose=False)
        log(f"VGG-16 V3 r=N/{div} never-lose surface:")
        t_nl = time_apply(m2, v2, x)
        log(f"VGG-16 V3 summary (r=N/{div}, b={B}): dense {t_orig*1e3:.2f} ms "
            f"-> V3 {t_v3*1e3:.2f} ms = {t_orig/t_v3:.3f}x | never-lose "
            f"{t_nl*1e3:.2f} ms = {t_orig/t_nl:.3f}x "
            f"({res['kept_decomposed']}/{len(res['layers'])} kept)")

    # AlexNet convs 2-5 (the reference's own scheme-1 targets): V3 at r=N/2
    from convnet_approximater_tpu.models import AlexNet

    model = AlexNet(num_classes=1000)
    variables = {"params": model.init(KEY)}
    log(f"AlexNet dense f32 (b={B}):")
    t_orig = time_apply(model, variables, x)
    m2 = AlexNet(num_classes=1000)
    v2 = {"params": m2.init(KEY)}
    app = LowRankExpV3(num_bases=(96, 192, 128, 128))
    m2, v2 = run_pipeline(m2, v2, app,
                          [SimpleConvFilter(),
                           IndicesFilter(tuple(range(2, 6)))])
    log("AlexNet V3 r=N/2 (convs 2-5) f32:")
    t_v3 = time_apply(m2, v2, x)
    res = never_lose_deploy(m2, v2, x.shape, greedy=True, verbose=False)
    log("AlexNet V3 never-lose surface:")
    t_nl = time_apply(m2, v2, x)
    log(f"AlexNet V3 summary (r=N/2, b={B}): dense {t_orig*1e3:.2f} ms -> "
        f"V3 {t_v3*1e3:.2f} ms = {t_orig/t_v3:.3f}x | never-lose "
        f"{t_nl*1e3:.2f} ms = {t_orig/t_nl:.3f}x "
        f"({res['kept_decomposed']}/{len(res['layers'])} kept)")

    r18_N = (64,) * 4 + (128,) * 4 + (256,) * 4 + (512,) * 4

    def build():
        m = ResNet(depth=18, num_classes=1000)
        return m, {"params": m.init(KEY), "state": m.init_state()}

    model, variables = build()
    log(f"ResNet-18 dense f32 (b={B}):")
    t_orig = time_apply(model, variables, x)
    m2, v2 = build()
    app = LowRankExpV3(num_bases=tuple(n // 2 for n in r18_N))
    m2, v2 = run_pipeline(
        m2, v2, app,
        [KernelSizeFilter(min_kernel=2, max_kernel=5),
         IndicesFilter(tuple(range(1, 17)))])
    log("ResNet-18 V3 r=N/2 f32:")
    t_v3 = time_apply(m2, v2, x)
    res = never_lose_deploy(m2, v2, x.shape, greedy=False, verbose=False)
    log("ResNet-18 V3 never-lose surface:")
    t_nl = time_apply(m2, v2, x)
    log(f"ResNet-18 V3 summary (r=N/2, b={B}): dense {t_orig*1e3:.2f} ms -> "
        f"V3 {t_v3*1e3:.2f} ms = {t_orig/t_v3:.3f}x | never-lose "
        f"{t_nl*1e3:.2f} ms = {t_orig/t_nl:.3f}x "
        f"({res['kept_decomposed']}/{len(res['layers'])} kept)")


def bench_v3_serving(B):
    """V3 bf16 serving surface on ResNet-18/50: fold BN *through* the
    decomposed sites (deploy.FOLD_TAILS resolves V3's 1x1 mix_conv), cast
    bf16, and arbitrate per-layer at the serving dtype.  Baseline is the
    dense BN-fold bf16 surface (the r3d serving numbers: 2.90 / 4.77 ms)."""
    from convnet_approximater_tpu.core import LowRankExpV3
    from convnet_approximater_tpu.deploy import fold_batchnorm, never_lose_deploy
    from convnet_approximater_tpu.filters import KernelSizeFilter
    from convnet_approximater_tpu.models import ResNet

    x = jax.random.normal(KEY, (B, 224, 224, 3)).astype(jnp.bfloat16)

    # VGG-16 first (no BN — the bf16 cast IS the serving surface); V3 at
    # r=N/4, the f32 crossover winner (perf-notes "LowRankExpV3 on TPU").
    vgg_N = (64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512)
    m_v = VGG(depth=16, num_classes=1000)
    v_v = {"params": cast_floating(m_v.init(KEY))}
    log(f"VGG-16 dense bf16 serving (b={B}):")
    t_vd = time_apply(m_v, v_v, x)
    m_v2 = VGG(depth=16, num_classes=1000)
    v_v2 = {"params": m_v2.init(KEY)}
    m_v2, v_v2 = run_pipeline(
        m_v2, v_v2, LowRankExpV3(num_bases=tuple(n // 4 for n in vgg_N)),
        [SimpleConvFilter(), IndicesFilter(tuple(range(2, 14)))])
    v_v2["params"] = cast_floating(v_v2["params"])
    log("VGG-16 V3 r=N/4 bf16 serving:")
    t_vv = time_apply(m_v2, v_v2, x)
    res_v = never_lose_deploy(m_v2, v_v2, x.shape, dtype=jnp.bfloat16,
                              greedy=False, verbose=False)
    log("VGG-16 V3 never-lose bf16 surface:")
    t_vn = time_apply(m_v2, v_v2, x)
    log(f"VGG-16 V3 serving summary (r=N/4, b={B}): dense bf16 "
        f"{t_vd*1e3:.2f} ms -> V3 {t_vv*1e3:.2f} ms = {t_vd/t_vv:.3f}x | "
        f"never-lose {t_vn*1e3:.2f} ms = {t_vd/t_vn:.3f}x "
        f"({res_v['kept_decomposed']}/{len(res_v['layers'])} kept, "
        f"{B/t_vn:.0f} img/s)")

    from bench import RESNET_BLOCK_MIDS as mids

    for depth, div in ((18, 2), (18, 4), (50, 2)):
        name = f"ResNet-{depth}"

        def build():
            m = ResNet(depth=depth, num_classes=1000)
            return m, {"params": m.init(KEY), "state": m.init_state()}

        m_d, v_d = build()
        n_folded = fold_batchnorm(m_d, v_d)
        v_db = {"params": cast_floating(v_d["params"]), "state": v_d["state"]}
        log(f"{name} dense BN-fold ({n_folded}) bf16 serving (b={B}):")
        t_dense = time_apply(m_d, v_db, x)

        m2, v2 = build()
        app = LowRankExpV3(num_bases=tuple(n // div for n in mids[depth]))
        m2, v2 = run_pipeline(
            m2, v2, app,
            [KernelSizeFilter(min_kernel=2, max_kernel=5),
             IndicesFilter(tuple(range(1, 17)))])
        n2 = fold_batchnorm(m2, v2)
        assert n2 == n_folded, (n2, n_folded)  # V3 sites fold through
        v2["params"] = cast_floating(v2["params"])
        log(f"{name} V3 r=N/{div} BN-fold bf16 serving:")
        t_v3 = time_apply(m2, v2, x)
        res = never_lose_deploy(m2, v2, x.shape, dtype=jnp.bfloat16,
                                greedy=(depth == 18), verbose=False)
        log(f"{name} V3 never-lose bf16 surface:")
        t_nl = time_apply(m2, v2, x)
        log(f"{name} V3 serving summary (r=N/{div}, b={B}): dense+fold bf16 "
            f"{t_dense*1e3:.2f} ms -> V3+fold {t_v3*1e3:.2f} ms = "
            f"{t_dense/t_v3:.3f}x | never-lose {t_nl*1e3:.2f} ms = "
            f"{t_dense/t_nl:.3f}x ({res['kept_decomposed']}/"
            f"{len(res['layers'])} kept, {B/t_nl:.0f} img/s)")


def bench_convnext(B):
    """ConvNeXt-T (beyond-reference family, models/convnext.py): the
    depthwise-7x7 ConvNet.  DwSepRep rank-1 cuts each dwconv's taps
    49 -> 14 and lowers the strips as banded-Toeplitz MXU contractions
    (``strip_matmul=True``); the never-lose arbiter re-materializes any
    layer where that loses.  No BN, so bf16 cast is the serving surface."""
    from convnet_approximater_tpu.core import DwSepRep
    from convnet_approximater_tpu.deploy import never_lose_deploy
    from convnet_approximater_tpu.filters import DepthwiseConvFilter
    from convnet_approximater_tpu.models import ConvNeXt

    x = jax.random.normal(KEY, (B, 224, 224, 3))

    def build():
        m = ConvNeXt(arch="tiny", num_classes=1000)
        return m, {"params": m.init(KEY)}

    model, variables = build()
    log(f"ConvNeXt-T dense f32 (b={B}):")
    t_orig = time_apply(model, variables, x)
    vb = {"params": cast_floating(variables["params"])}
    log("ConvNeXt-T dense bf16:")
    t_bf16 = time_apply(model, vb, x.astype(jnp.bfloat16))

    for strip, tag in ((True, "strip-matmul"), (False, "lax-conv")):
        m1, v1 = build()
        m1, v1 = run_pipeline(m1, v1, DwSepRep(ranks=1, strip_matmul=strip),
                              [DepthwiseConvFilter()])
        log(f"ConvNeXt-T DwSepRep rank-1 ({tag}) f32:")
        t1 = time_apply(m1, v1, x)
        v1b = {"params": cast_floating(v1["params"])}
        log(f"ConvNeXt-T DwSepRep rank-1 ({tag}) bf16:")
        t1b = time_apply(m1, v1b, x.astype(jnp.bfloat16))
        log(f"  -> {tag}: f32 {t_orig/t1:.3f}x | bf16 {t_bf16/t1b:.3f}x vs bf16 dense")

    # never-lose on the measured-winning variant (lax-conv cascades) at the
    # serving dtype (bf16 — ConvNeXt has no BN, the cast IS the surface)
    m2, v2 = build()
    m2, v2 = run_pipeline(m2, v2, DwSepRep(ranks=1, strip_matmul=False),
                          [DepthwiseConvFilter()])
    v2["params"] = cast_floating(v2["params"])
    res = never_lose_deploy(m2, v2, x.shape, dtype=jnp.bfloat16,
                            greedy=False, verbose=False)
    log("ConvNeXt-T never-lose deploy surface bf16:")
    t_nl = time_apply(m2, v2, x.astype(jnp.bfloat16))
    log(f"ConvNeXt-T summary (b={B}): dense {t_orig*1e3:.2f} ms | bf16 "
        f"{t_bf16*1e3:.2f} ms ({B/t_bf16:.0f} img/s) | never-lose bf16 "
        f"{t_nl*1e3:.2f} ms = {t_bf16/t_nl:.3f}x vs bf16 dense "
        f"({res['kept_decomposed']}/{len(res['layers'])} kept decomposed, "
        f"{B/t_nl:.0f} img/s)")


def bench_segnext(B=16, hw=512):
    """SegNeXt-T semantic segmentation at its native 512^2 (ADE20K crop):
    the attention share grows with spatial size, so msca-rep should convert
    better than on classification."""
    from convnet_approximater_tpu.deploy import fold_batchnorm
    from convnet_approximater_tpu.models import build_model

    x = jax.random.normal(KEY, (B, hw, hw, 3))

    def build():
        m = build_model(dict(type="SegNeXt", num_classes=150,
                             drop_path_rate=0.0))
        return m, {"params": m.init(KEY), "state": m.init_state()}

    model, variables = build()
    log(f"SegNeXt-T original f32 (b={B} @{hw}):")
    t_orig = time_apply(model, variables, x)
    vb = {"params": cast_floating(variables["params"]), "state": variables["state"]}
    log("SegNeXt-T original bf16:")
    t_orig_bf16 = time_apply(model, vb, x.astype(jnp.bfloat16))

    m2, v2 = build()
    m2, v2 = run_pipeline(m2, v2, MscaRep(decomp=1, fix=True), [])
    log("SegNeXt-T msca-rep d1+fix f32:")
    t_rep = time_apply(m2, v2, x)
    m3, v3 = build()
    m3, v3 = run_pipeline(m3, v3, MscaRep(decomp=1, fix=True, decomp_conv0=True), [])
    fold_batchnorm(m3, v3)
    v3b = {"params": cast_floating(v3["params"]), "state": v3["state"]}
    log("SegNeXt-T rep+dconv0+fold bf16 (serving):")
    t_best = time_apply(m3, v3b, x.astype(jnp.bfloat16))
    log(f"SegNeXt-T summary (b={B} @{hw}): orig f32 {t_orig*1e3:.2f} ms | "
        f"rep d1fix {t_rep*1e3:.2f} ms = {t_orig/t_rep:.3f}x | serving bf16 "
        f"{t_best*1e3:.2f} ms = {t_orig_bf16/t_best:.3f}x vs bf16 orig, "
        f"{t_orig/t_best:.3f}x vs f32 orig ({B/t_best:.0f} img/s)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="all",
                    choices=["mscan-s", "vgg16", "resnet18", "resnet50",
                             "convnext", "v3", "v3-serving", "segnext", "all"])
    ap.add_argument("--batch", type=int, default=64)
    args = ap.parse_args()
    log(f"devices: {jax.devices()}")
    if args.model in ("mscan-s", "all"):
        bench_mscan_s(args.batch)
    if args.model in ("vgg16", "all"):
        bench_vgg16(args.batch)
    if args.model in ("resnet18", "all"):
        bench_resnet(args.batch, depth=18)
    if args.model in ("resnet50", "all"):
        bench_resnet(args.batch, depth=50)
    if args.model in ("convnext", "all"):
        bench_convnext(args.batch)
    if args.model in ("v3", "all"):
        bench_v3(args.batch)
    if args.model in ("v3-serving", "all"):
        bench_v3_serving(args.batch)
    if args.model in ("segnext", "all"):
        bench_segnext()


if __name__ == "__main__":
    main()
