#!/usr/bin/env python
"""A/B the CAT_STRIP_MATMUL banded-Toeplitz strip-conv lowering at MODEL level
(doc/perf-notes.md lesson: isolated op probes mislead — XLA's fusions shift).

Measures MSCAN-t b=64: original f32, rep d1fix f32 (the headline config), and
the best serving config (d1fix + dconv0 + ffnrep(1,2), bf16), each with the
flag off/on.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cat_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from bench import B, KEY, log, run_pipeline, time_apply
from convnet_approximater_tpu.core import FfnRep, MscaRep
from convnet_approximater_tpu.filters import IndicesFilter
from convnet_approximater_tpu.models import MSCAN_Classifier
from convnet_approximater_tpu.ops import conv as conv_ops
from convnet_approximater_tpu.utils import cast_floating


def set_flag(mode: str):
    """'off' force-disables, 'on' force-enables, 'auto' = per-layer default
    (deploy CascadeConv strips use the MXU lowering, everything else lax)."""
    if mode == "auto":
        os.environ.pop("CAT_STRIP_MATMUL", None)
    else:
        os.environ["CAT_STRIP_MATMUL"] = "1" if mode == "on" else "0"
    conv_ops._strip_matmul_env.cache_clear()


def build(config: str):
    model = MSCAN_Classifier(num_classes=1000)
    variables = {"params": model.init(KEY), "state": model.init_state()}
    if config == "orig":
        return model, variables, jnp.float32
    model, variables = run_pipeline(
        model, variables,
        MscaRep(decomp=1, fix=True, decomp_conv0=(config == "best")), [])
    if config == "best":
        model, variables = run_pipeline(model, variables, FfnRep(fix=True),
                                        [IndicesFilter((1, 2, 3, 4, 5, 6))])
        variables = {"params": cast_floating(variables["params"]),
                     "state": variables["state"]}
        return model, variables, jnp.bfloat16
    return model, variables, jnp.float32


def main():
    configs = sys.argv[1:] or ["rep", "best", "orig"]
    x32 = jax.random.normal(KEY, (B, 224, 224, 3))
    for config in configs:
        model, variables, dtype = build(config)
        x = x32.astype(dtype)
        for mode in ("off", "auto", "on"):
            set_flag(mode)
            t = time_apply(model, variables, x)
            log(f"[{config}] strip_matmul={mode:<4}: "
                f"{t * 1e3:.3f} ms/fwd ({B / t:.0f} img/s)")
    set_flag("auto")


if __name__ == "__main__":
    main()
