#!/usr/bin/env python
"""Interleaved A/B: scan-over-blocks vs fully-unrolled blocks on the BEST
serving config (d1fix + dconv0 + ffnrep + bnfold + pw-matmul, bf16, b=64).

Motivation (doc/perf-notes.md round-3 floor status): the post-pw-matmul
trace attributes ~0.4 ms/iter to ~200 scattered data-formatting ops,
including the scan's dynamic-slice reads of the stacked per-block params and
the loop-carry DUS writes.  ``scan_blocks='off'`` removes the loop entirely
— every block becomes straight-line HLO with its own param leaves, so XLA
sees static slices it can fold into the conv fusions.  The cost is compile
time (~5x HLO; one-time with the persistent cache), which is the right
trade for a frozen serving graph.

Interleaved method per CLAUDE.md: the relay drifts ±0.1 ms across minutes,
so compile both variants first, then alternate slope reps and read pairwise
deltas.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cat_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp

from bench import B, KEY, log
from convnet_approximater_tpu.deploy import enable_pw_matmul, fold_batchnorm
from exp_pw_interleaved import slope_time
from exp_strip_matmul import build


def main():
    model, variables, dtype = build("best")
    fold_batchnorm(model, variables)
    enable_pw_matmul(model)
    x = jax.random.normal(KEY, (B, 224, 224, 3)).astype(dtype)
    args = (variables["params"], variables["state"], x)
    backbone = model.backbone

    def fwd_scan(params, state, xx):
        y, _, _ = model.apply(params, xx, state=state, training=False)
        return y

    def fwd_unrolled(params, state, xx):
        y, _, _ = model.apply(params, xx, state=state, training=False)
        return y

    backbone.scan_blocks = "auto"
    f_a = jax.jit(fwd_scan)
    t0 = time.time()
    float(jnp.sum(f_a(*args)))
    log(f"compiled scan variant in {time.time() - t0:.0f} s")

    backbone.scan_blocks = "off"
    f_b = jax.jit(fwd_unrolled)
    t0 = time.time()
    float(jnp.sum(f_b(*args)))
    log(f"compiled unrolled variant in {time.time() - t0:.0f} s")

    deltas = []
    for i in range(6):
        backbone.scan_blocks = "auto"
        ta = slope_time(f_a, args)
        backbone.scan_blocks = "off"
        tb = slope_time(f_b, args)
        deltas.append(ta - tb)
        log(f"  pair {i}: scan {ta*1e3:.3f} ms | unrolled {tb*1e3:.3f} ms | "
            f"delta {1e3*(ta-tb):+.3f} ms")
    mean = sum(deltas) / len(deltas)
    std = (sum((d - mean) ** 2 for d in deltas) / len(deltas)) ** 0.5
    log(f"unrolled-serving effect: {mean*1e3:+.3f} ± {std*1e3:.3f} ms "
        f"({'WIN' if mean > 2 * std else 'not significant'})")


if __name__ == "__main__":
    main()
