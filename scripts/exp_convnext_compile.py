#!/usr/bin/env python
"""Compile-time A/B for the ConvNeXt scan-over-blocks engine.

ConvNeXt-S carries a 27-block stage 3 — the worst unrolled-HLO offender
in the model zoo.  The shared stage engine (``models/stage_exec.py``)
runs each stage as ONE ``lax.scan`` body; this measures the XLA compile
wall-clock (through the remote-compile tunnel, cache disabled for the
A/B) and the runtime delta, scan vs unrolled.

Usage: python scripts/exp_convnext_compile.py [--arch small] [--batch 64]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

import jax.numpy as jnp

from bench import KEY, log, time_apply

# NO persistent compile cache: the A/B is the compile itself (bench's
# import enables it; undo that here so re-runs stay honest)
jax.config.update("jax_compilation_cache_dir", None)
from convnet_approximater_tpu.models import ConvNeXt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="small")
    ap.add_argument("--batch", type=int, default=64)
    args = ap.parse_args()
    B = args.batch
    log(f"devices: {jax.devices()}")
    x = jax.random.normal(KEY, (B, 224, 224, 3))

    results = {}
    for mode in ("off", "auto"):
        model = ConvNeXt(arch=args.arch, num_classes=1000, scan_blocks=mode)
        variables = {"params": model.init(KEY)}

        def fwd(p, xx):
            y, _, _ = model.apply(p, xx, training=False)
            return y

        t0 = time.time()
        lowered = jax.jit(fwd).lower(variables["params"], x)
        compiled = lowered.compile()
        t_compile = time.time() - t0
        hlo_lines = len(lowered.as_text().splitlines())
        log(f"ConvNeXt-{args.arch} scan_blocks={mode}: compile "
            f"{t_compile:.1f}s, HLO {hlo_lines} lines")
        log(f"ConvNeXt-{args.arch} scan_blocks={mode} runtime:")
        t_run = time_apply(model, variables, x)
        results[mode] = (t_compile, hlo_lines, t_run)

    off, auto = results["off"], results["auto"]
    log(f"ConvNeXt-{args.arch} compile A/B (b={B}): unrolled {off[0]:.1f}s "
        f"/ {off[1]} HLO lines / {off[2]*1e3:.2f} ms -> scan {auto[0]:.1f}s "
        f"/ {auto[1]} HLO lines / {auto[2]*1e3:.2f} ms "
        f"({off[0]/auto[0]:.1f}x compile, {off[2]/auto[2]:.3f}x runtime)")


if __name__ == "__main__":
    main()
