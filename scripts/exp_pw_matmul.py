#!/usr/bin/env python
"""A/B the 1x1-conv-as-matmul lowering (CAT_PW_MATMUL) at MODEL level.

The round-2c trace showed stage-3 FFN fc1 (160->640 @ 14^2) at ~6% of the
bf16 MXU roofline under XLA's conv emitter (H=14 in the lanes).  This
sweeps the spatial-size threshold: off / <=196 (14^2 and down) / <=784
(28^2 and down) / all, on the best bf16 serving config and on the f32
headline config.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cat_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp

from bench import B, KEY, log, time_apply
from convnet_approximater_tpu.deploy import fold_batchnorm
from convnet_approximater_tpu.ops import conv as conv_ops
from exp_strip_matmul import build


def main():
    for cfg in ("best", "rep"):
        model, variables, dtype = build(cfg)
        if cfg == "best":
            fold_batchnorm(model, variables)
        x = jax.random.normal(KEY, (B, 224, 224, 3)).astype(dtype)
        for thresh in ("0", "196", "784", "1"):
            os.environ["CAT_PW_MATMUL"] = thresh
            conv_ops._pw_matmul_env.cache_clear()
            t = time_apply(model, variables, x)
            log(f"[{cfg} {jnp.dtype(dtype).name}] CAT_PW_MATMUL={thresh:>4}: "
                f"{t*1e3:.3f} ms ({B/t:.0f} img/s)")
    os.environ.pop("CAT_PW_MATMUL", None)
    conv_ops._pw_matmul_env.cache_clear()


if __name__ == "__main__":
    main()
