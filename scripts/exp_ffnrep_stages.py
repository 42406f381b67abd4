#!/usr/bin/env python
"""Re-test FfnRep on stages 3/4 under bf16 + the Toeplitz strip lowering.

Round-1 (f32, pre-strip) measured stages 1-2 optimal; in bf16 the dense
3x3 merge on stage 3 (160->640 @14², K=1440) is ~0.12 ms at roofline vs the
~0.35 ms the stage-3 FFN fusions cost now — worth re-measuring.
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
from convnet_approximater_tpu.filters import IndicesFilter
from convnet_approximater_tpu.models import MSCAN_Classifier
from convnet_approximater_tpu.utils import cast_floating

# FFN switchable indices (1-based): stage1=1-3, stage2=4-6, stage3=7-11, stage4=12-13
STAGE_SETS = {
    "1-2": tuple(range(1, 7)),
    "1-3": tuple(range(1, 12)),
    "1-4": tuple(range(1, 14)),
    "1-2+4": tuple(range(1, 7)) + (12, 13),
}


def main():
    x = jax.random.normal(KEY, (B, 224, 224, 3)).astype(jnp.bfloat16)
    for name, idxs in STAGE_SETS.items():
        m = MSCAN_Classifier(num_classes=1000)
        v = {"params": m.init(KEY), "state": m.init_state()}
        m, v = run_pipeline(m, v, MscaRep(decomp=1, fix=True, decomp_conv0=True), [])
        m, v = run_pipeline(m, v, FfnRep(fix=True), [IndicesFilter(idxs)])
        v = {"params": cast_floating(v["params"]), "state": v["state"]}
        t = time_apply(m, v, x)
        log(f"[best bf16] ffnrep stages {name:<5}: {t * 1e3:.3f} ms/fwd "
            f"({B / t:.0f} img/s)")


if __name__ == "__main__":
    main()
