#!/usr/bin/env python
"""Round-4 follow-up: does the headline's exact-rewrite win (FfnRep merge
on the f32 path, +bnfold+pw) transfer to MSCAN-S and SegNeXt-T?

Same ladder as scripts/exp_headline_r4.py, on the larger classifier and
the segmentation family (b=16 @512² there).  Exactness is asserted vs the
plain d1+fix rep before timing.
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


def jit_logits(m, v, xs):
    @jax.jit
    def f(p, s, x):
        y, _, _ = m.apply(p, x, state=s, training=False)
        return y

    return f(v["params"], v["state"], xs)


def ladder(name, build, x, ffn_idxs):
    log(f"--- {name} ---")
    mo, vo = build()
    t_a = time_apply(mo, vo, x)
    log(f"  orig f32: {t_a * 1e3:.3f} ms")

    mb, vb = build()
    mb, vb = run_pipeline(mb, vb, MscaRep(decomp=1, fix=True), [])
    t_b = time_apply(mb, vb, x)
    log(f"  d1+fix plain: {t_b * 1e3:.3f} ms ({t_a / t_b:.3f}x)")

    mc, vc = build()
    mc, vc = run_pipeline(mc, vc, MscaRep(decomp=1, fix=True), [])
    mc, vc = run_pipeline(mc, vc, FfnRep(fix=True), [IndicesFilter(ffn_idxs)])
    fold_batchnorm(mc, vc)
    enable_pw_matmul(mc)
    xs = x[:2]
    yb = jit_logits(mb, vb, xs)
    err = float(jnp.max(jnp.abs(jit_logits(mc, vc, xs) - yb))
                / (jnp.max(jnp.abs(yb)) + 1e-12))
    log(f"  exactness: rel max|dy| = {err:.3e}")
    # relative gate: seg logits at 512^2 carry larger magnitudes, so the
    # f32 rounding residual scales with them (measured 9.9e-3 absolute)
    assert err < 1e-3, f"exact rewrites drifted on {name}: {err}"
    t_c = time_apply(mc, vc, x)
    log(f"  d1+fix + exact rewrites: {t_c * 1e3:.3f} ms "
        f"({t_a / t_c:.3f}x vs orig, was {t_a / t_b:.3f}x)")


def main():
    wait_for_relay()

    def build_s():
        from convnet_approximater_tpu.models import MSCAN_Classifier

        m = MSCAN_Classifier(num_classes=1000,
                             num_channels=(64, 128, 320, 512),
                             num_blocks=(2, 2, 4, 2), exp_ratios=(8, 8, 4, 4))
        return m, {"params": m.init(KEY), "state": m.init_state()}

    x = jax.random.normal(KEY, (B, 224, 224, 3))
    # MSCAN-S stages 1-2 have 2+2 blocks -> ffn indices 1-4
    ladder("MSCAN-S f32 b=64 @224", build_s, x, (1, 2, 3, 4))

    def build_seg():
        from convnet_approximater_tpu.segmentation import SegNeXt

        m = SegNeXt(num_classes=19)
        return m, {"params": m.init(KEY), "state": m.init_state()}

    xseg = jax.random.normal(KEY, (16, 512, 512, 3))
    # SegNeXt-T backbone = MSCAN-t: stages 1-2 have 3+3 blocks
    ladder("SegNeXt-T f32 b=16 @512^2", build_seg, xseg, (1, 2, 3, 4, 5, 6))


if __name__ == "__main__":
    main()
