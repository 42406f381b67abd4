#!/usr/bin/env python
"""Refine the strip-matmul dispatch policy: which strips actually win?

The round-2 trace (trace_best_r2b) shows the stage-1 strips got ~3x cheaper
under the Toeplitz lowering, but stages 2-3 gained layout copies
(copy.295/304).  Variants, best-serving config bf16 b=64:

  both      — current default (every deploy-cascade strip k>=7)
  vert      — vertical (k,1) strips only (the expensive direction on VPU)
  big       — both directions, but only on maps with H*W >= 56*56
  vert+big  — intersection
  none      — lax everywhere
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cat_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import B, KEY, log, time_apply
from convnet_approximater_tpu.ops import conv as conv_ops
from exp_strip_matmul import build  # noqa: E402

ORIG_TRY = conv_ops._try_strip_matmul


def variant(name):
    def flt(x, w):
        vertical = w.shape[1] == 1
        big = x.shape[1] * x.shape[2] >= 56 * 56
        if name == "both":
            return True
        if name == "vert":
            return vertical
        if name == "big":
            return big
        if name == "vert+big":
            return vertical and big
        return False

    def wrapped(x, w, b, stride, padding, groups, dilation, prefer=False):
        if prefer and not flt(x, w):
            prefer = False
        return ORIG_TRY(x, w, b, stride, padding, groups, dilation, prefer=prefer)

    conv_ops._try_strip_matmul = wrapped
    # conv2d captured _try_strip_matmul at module import — patch the module
    # binding both ways to be safe
    import convnet_approximater_tpu.ops.conv as m

    m._try_strip_matmul = wrapped


def main():
    model, variables, dtype = build("best")
    x = jax.random.normal(KEY, (B, 224, 224, 3)).astype(dtype)
    for name in ("none", "vert+big", "vert", "big", "both"):
        variant(name)
        t = time_apply(model, variables, x)
        log(f"[best bf16] strips={name:<9}: {t * 1e3:.3f} ms/fwd ({B / t:.0f} img/s)")
    conv_ops._try_strip_matmul = ORIG_TRY


if __name__ == "__main__":
    main()
