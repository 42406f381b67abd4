#!/usr/bin/env python
"""Serving-floor candidate: pad thin stages to the 128 lane width
(VERDICT r3 #3).

Question: would zero-padding MSCAN-t's stage-1/2 channels (32/64) to the
v5e lane width make the serving forward FASTER despite the extra FLOPs?
The exact zero-channel rewrite preserves the function, but its WALL-CLOCK
is identical to a model *built* at the padded widths — so this times
rep+fold serving forwards of structurally-padded variants before paying
for the exact pass:

  base   (32,  64, 160, 256)   the real MSCAN-t
  pad64  (64,  64, 160, 256)   stage-1 to half-lane
  pad128 (128, 128, 160, 256)  stages 1-2 to full lane width

If pad* is slower (expected: XLA already tile-pads MXU contractions to
128, so explicit padding only adds real vector work), the candidate is
refuted by direct wall-clock and doc/perf-notes.md records it.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cat_jax_cache"))

from bench import B, KEY, log, time_apply, run_pipeline, wait_for_relay
from convnet_approximater_tpu.core import FfnRep, MscaRep
from convnet_approximater_tpu.deploy import enable_pw_matmul, fold_batchnorm
from convnet_approximater_tpu.filters import IndicesFilter
from convnet_approximater_tpu.models import MSCAN_Classifier
from convnet_approximater_tpu.utils import cast_floating


def serving_time(num_channels, x):
    m = MSCAN_Classifier(num_channels=num_channels, num_classes=1000)
    v = {"params": m.init(KEY), "state": m.init_state()}
    m, v = run_pipeline(m, v, MscaRep(decomp=1, fix=True, decomp_conv0=True), [])
    m, v = run_pipeline(m, v, FfnRep(fix=True),
                        [IndicesFilter((1, 2, 3, 4, 5, 6))])
    fold_batchnorm(m, v)
    enable_pw_matmul(m)
    vb = {"params": cast_floating(v["params"]), "state": v["state"]}
    return time_apply(m, vb, x.astype(jnp.bfloat16))


def main():
    wait_for_relay()
    x = jax.random.normal(KEY, (B, 224, 224, 3))
    for name, chans in (("base  (32,64,160,256)", (32, 64, 160, 256)),
                        ("pad64 (64,64,160,256)", (64, 64, 160, 256)),
                        ("pad128(128,128,160,256)", (128, 128, 160, 256))):
        log(f"{name} serving bf16:")
        t = serving_time(chans, x)
        log(f"  -> {t * 1e3:.3f} ms ({B / t:.0f} img/s)")


if __name__ == "__main__":
    main()
