#!/usr/bin/env python
"""Pick the real best serving config for MSCAN-s (mscan-t's recipe may not
transfer: channels are 2x wider, so the fc1+dconv merge and decomp_conv0
trade different MAC/layout costs).  All bf16, b=64, fold_batchnorm on."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cat_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp

from bench import B, KEY, log, run_pipeline, time_apply
from convnet_approximater_tpu.core import FfnRep, MscaRep
from convnet_approximater_tpu.deploy import fold_batchnorm
from convnet_approximater_tpu.filters import IndicesFilter
from convnet_approximater_tpu.models import MSCAN_Classifier
from convnet_approximater_tpu.utils import cast_floating


def build_s():
    m = MSCAN_Classifier(num_classes=1000, num_channels=(64, 128, 320, 512),
                         num_blocks=(2, 2, 4, 2), exp_ratios=(8, 8, 4, 4))
    v = {"params": m.init(KEY), "state": m.init_state()}
    return m, v


def main():
    x = jax.random.normal(KEY, (B, 224, 224, 3)).astype(jnp.bfloat16)
    variants = {
        "rep": dict(dconv0=False, ffnrep=(), fold=False),
        "rep+fold": dict(dconv0=False, ffnrep=(), fold=True),
        "rep+dconv0+fold": dict(dconv0=True, ffnrep=(), fold=True),
        "rep+dconv0+ffnrep12+fold": dict(dconv0=True, ffnrep=(1, 2, 3, 4), fold=True),
        "rep+dconv0+ffnrep1+fold": dict(dconv0=True, ffnrep=(1, 2), fold=True),
    }
    for name, v in variants.items():
        m, var = build_s()
        m, var = run_pipeline(m, var, MscaRep(decomp=1, fix=True,
                                              decomp_conv0=v["dconv0"]), [])
        if v["ffnrep"]:
            m, var = run_pipeline(m, var, FfnRep(fix=True),
                                  [IndicesFilter(v["ffnrep"])])
        if v["fold"]:
            fold_batchnorm(m, var)
        var = {"params": cast_floating(var["params"]), "state": var["state"]}
        t = time_apply(m, var, x)
        log(f"[mscan-s bf16] {name:<26}: {t*1e3:.3f} ms ({B/t:.0f} img/s)")


if __name__ == "__main__":
    main()
