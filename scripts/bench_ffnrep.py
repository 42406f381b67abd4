#!/usr/bin/env python
"""Measure the FfnRep merge on MSCAN-t (whole model, TPU).

Sweeps which stages get the FFN merge on top of the d1+fix MSCA rep —
the merge trades k*k more fc1 MACs for MXU residency, so it should win
only on the thin-channel large-map stages (1, maybe 2).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cat_jax_cache"))

from bench import B, KEY, run_pipeline, time_apply, log
from convnet_approximater_tpu.core import FfnRep, MscaRep
from convnet_approximater_tpu.filters import IndicesFilter
from convnet_approximater_tpu.models import MSCAN_Classifier

# MSCAN-t blocks per stage: (3, 3, 5, 2); IndicesFilter is 1-based
STAGE_IDX = {1: (1, 2, 3), 2: (4, 5, 6), 3: (7, 8, 9, 10, 11), 4: (12, 13)}


def build(stages, dtype=jnp.float32):
    m = MSCAN_Classifier(num_classes=1000)
    v = {"params": m.init(KEY), "state": m.init_state()}
    m, v = run_pipeline(m, v, MscaRep(decomp=1, fix=True), [])
    if stages:
        idx = tuple(i for s in stages for i in STAGE_IDX[s])
        m, v = run_pipeline(m, v, FfnRep(fix=True), [IndicesFilter(idx)])
    if dtype != jnp.float32:
        from convnet_approximater_tpu.utils import cast_floating

        v = {"params": cast_floating(v["params"], dtype), "state": v["state"]}
    return m, v


def main():
    x = jax.random.normal(KEY, (B, 224, 224, 3))
    for stages in ([], [1], [1, 2], [1, 2, 3]):
        m, v = build(stages)
        t = time_apply(m, v, x)
        log(f"d1fix + ffnrep(stages={stages}): {t * 1e3:.3f} ms/fwd "
            f"({B / t:.0f} img/s)")


if __name__ == "__main__":
    main()
