#!/usr/bin/env python
"""Validate arbitrated_apply on TPU: MSCAN-S bf16 b=64, stage-grouped FfnRep.

Ground truth (hand-measured, doc/perf-notes.md "MSCAN-s serving recipe"):
the fc1/dconv merge pays on stage 1 ONLY (stage 2 at 128ch loses; stages
3-4 lose).  The arbiter should reproduce that selection from measurement
alone — the automation this replaces is the per-family IndicesFilter hand
tuning (reference ``src/approx/filters/indices_filter.py`` workflow).

Recipe under test = deploy_planner.build_mscarep minus the planner wrapper:
MscaRep(d1+fix+dconv0) -> arbitrated FfnRep (per-stage groups, bf16-cast
timing copies) -> fold_batchnorm -> cast bf16.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cat_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp

from bench import B, KEY, log, run_pipeline, time_apply
from convnet_approximater_tpu.core import FfnRep, MscaRep
from convnet_approximater_tpu.deploy import arbitrated_apply, fold_batchnorm
from convnet_approximater_tpu.hooks.inference_time_hook import time_forward
from convnet_approximater_tpu.models import MSCAN_Classifier
from convnet_approximater_tpu.utils import cast_floating


def build_s():
    m = MSCAN_Classifier(num_classes=1000, num_channels=(64, 128, 320, 512),
                         num_blocks=(2, 2, 4, 2), exp_ratios=(8, 8, 4, 4))
    v = {"params": m.init(KEY), "state": m.init_state()}
    return m, v


def main():
    shape = (B, 224, 224, 3)
    m, var = build_s()
    m, var = run_pipeline(m, var, MscaRep(decomp=1, fix=True,
                                          decomp_conv0=True), [])

    def timed(mm, vv, s, dt):
        vb = {"params": cast_floating(vv["params"], jnp.bfloat16),
              "state": vv.get("state", {})}
        _, _, times = time_forward(mm, vb, s, num_iters=6, warmup=2,
                                   dtype=jnp.bfloat16)
        return float(times.mean())

    res = arbitrated_apply(m, var, FfnRep(fix=True), [], shape,
                           dtype=jnp.bfloat16, time_fn=timed,
                           group_fn=lambda n: n.rsplit(".", 3)[0],
                           verbose=True)
    log(f"decision table: {res['layers']}")
    log(f"kept_applied={res['kept_applied']} "
        f"t_applied={res['t_applied']*1e3:.3f} ms "
        f"t_original={res['t_original']*1e3:.3f} ms "
        f"t_final={res['t_final']*1e3:.3f} ms")

    fold_batchnorm(m, var)
    vb = {"params": cast_floating(var["params"], jnp.bfloat16),
          "state": var["state"]}
    x = jax.random.normal(KEY, shape).astype(jnp.bfloat16)
    log("arbitrated final surface (bf16, post-fold):")
    t = time_apply(m, vb, x)
    log(f"final: {t*1e3:.3f} ms ({B/t:.0f} img/s) — hand-tuned record was "
        f"7.35 ms (rep+dconv0+ffnrep-stage1+fold, doc/perf-notes.md)")

    kept_stages = sorted({l["name"].split(".")[2] for l in res["layers"]
                          if l["kept"] == "applied"})
    log(f"stages kept: {kept_stages} (ground truth: ['0'] — stage 1 only)")


if __name__ == "__main__":
    main()
