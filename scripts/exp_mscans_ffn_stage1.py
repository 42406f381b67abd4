#!/usr/bin/env python
"""MSCAN-S f32: the full-surface FfnRep merge LOSES (10.88 -> 11.02 ms,
perf-notes r4) because stages 1-2 run exp_ratio 8 — the merged dense 3x3
at 8x hidden width costs more MACs than the fusion overhead it removes.
But the bf16 serving recipe (r2c) found the merge pays on STAGE 1 ONLY
(2x-channel stage at 56^2 maps).  Measure the stage-1-only f32 ladder:
d1+fix + FfnRep(idx 1-2) + bnfold + pw, interleaved vs the plain rep.

Reference anchor: the per-layer selectivity mirrors the reference's
IndicesFilter workflow (/root/reference/src/approx/filters/indices_filter.py).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cat_jax_cache"))

from bench import B, KEY, log, run_pipeline, time_apply, wait_for_relay
from convnet_approximater_tpu.core import FfnRep, MscaRep
from convnet_approximater_tpu.deploy import enable_pw_matmul, fold_batchnorm
from convnet_approximater_tpu.filters import IndicesFilter


def build_s():
    from convnet_approximater_tpu.models import MSCAN_Classifier

    m = MSCAN_Classifier(num_classes=1000,
                         num_channels=(64, 128, 320, 512),
                         num_blocks=(2, 2, 4, 2), exp_ratios=(8, 8, 4, 4))
    return m, {"params": m.init(KEY), "state": m.init_state()}


def main():
    wait_for_relay()
    x = jax.random.normal(KEY, (B, 224, 224, 3))

    mb, vb = build_s()
    mb, vb = run_pipeline(mb, vb, MscaRep(decomp=1, fix=True), [])

    mo, vo = build_s()
    t_orig = time_apply(mo, vo, x)
    log(f"orig f32: {t_orig * 1e3:.3f} ms")

    for label, idxs in (("stage1-only (idx 1-2)", (1, 2)),
                        ("stage1+2 (idx 1-4, the measured loss)", (1, 2, 3, 4))):
        mc, vc = build_s()
        mc, vc = run_pipeline(mc, vc, MscaRep(decomp=1, fix=True), [])
        mc, vc = run_pipeline(mc, vc, FfnRep(fix=True), [IndicesFilter(idxs)])
        fold_batchnorm(mc, vc)
        enable_pw_matmul(mc)
        xs = x[:2]

        @jax.jit
        def f_b(p, s, xx):
            y, _, _ = mb.apply(p, xx, state=s, training=False)
            return y

        @jax.jit
        def f_c(p, s, xx):
            y, _, _ = mc.apply(p, xx, state=s, training=False)
            return y

        yb = f_b(vb["params"], vb["state"], xs)
        err = float(jnp.max(jnp.abs(f_c(vc["params"], vc["state"], xs) - yb))
                    / (jnp.max(jnp.abs(yb)) + 1e-12))
        # 8x-hidden merged contractions accumulate more f32 rounding than
        # the t-config (measured rel 2.0e-3 here vs 3e-4 on SegNeXt)
        assert err < 5e-3, f"exact rewrites drifted: {err}"
        t_c = time_apply(mc, vc, x)
        log(f"{label}: {t_c * 1e3:.3f} ms ({t_orig / t_c:.3f}x vs orig, "
            f"rel|dy|={err:.1e})")

    t_b = time_apply(mb, vb, x)
    log(f"d1+fix plain: {t_b * 1e3:.3f} ms ({t_orig / t_b:.3f}x)")


if __name__ == "__main__":
    main()
