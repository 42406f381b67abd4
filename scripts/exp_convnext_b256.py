#!/usr/bin/env python
"""ConvNeXt-T b=256 throughput-regression trace (VERDICT r3 #5).

The DwSepRep+int8 serving stack peaks at b=128 (14.1k img/s) and REGRESSES
at b=256 (12.7k, doc/serving.md).  Suspects: scan dynamic-update-slice at
the larger carry, HBM working set, int8 requant tails.  This script
re-measures the knee and takes a profiler trace at both batch sizes, then
prints the per-op tables side by side so the regressing fusion(s) can be
named in doc/perf-notes.md.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cat_jax_cache"))

from bench import KEY, log, time_apply, run_pipeline, wait_for_relay
from convnet_approximater_tpu.core import DwSepRep
from convnet_approximater_tpu.deploy import quantize_int8
from convnet_approximater_tpu.filters import DepthwiseConvFilter
from convnet_approximater_tpu.models import ConvNeXt
from convnet_approximater_tpu.parallel import replicate
from convnet_approximater_tpu.utils import cast_floating
from convnet_approximater_tpu.utils.trace import summarize_trace


def build_stack():
    m = ConvNeXt(arch="tiny", num_classes=1000)
    v = {"params": m.init(KEY)}
    m, v = run_pipeline(m, v, DwSepRep(ranks=1, strip_matmul=False),
                        [DepthwiseConvFilter()])
    v["params"] = cast_floating(v["params"])
    calib = [jax.random.normal(jax.random.fold_in(KEY, i),
                               (8, 224, 224, 3)).astype(jnp.bfloat16)
             for i in range(2)]
    nq = quantize_int8(m, v, calib)
    log(f"stack: DwSepRep rank-1 + int8 ({nq} modules)")
    return m, v


def main():
    wait_for_relay()
    m, v = build_stack()
    results = {}
    for b in (128, 256):
        x = jax.random.normal(KEY, (b, 224, 224, 3)).astype(jnp.bfloat16)
        log(f"ConvNeXt-T stack b={b}:")
        t = time_apply(m, v, x)
        results[b] = t
        log(f"  {b / t:.0f} img/s ({t / b * 1e6:.2f} us/img)")

        # trace: params already resident (time_apply device_puts); run a
        # few steps under the profiler and summarize device-lane ops
        tdir = f"/tmp/cx_trace_b{b}"
        params = jax.device_put(v["params"])

        @jax.jit
        def fwd(p, xx):
            y, _, _ = m.apply(p, xx, training=False)
            return y

        fwd(params, x).block_until_ready()
        with jax.profiler.trace(tdir):
            for _ in range(3):
                r = fwd(params, x)
            float(jnp.sum(r))
        print(f"=== b={b} per-op table ===", file=sys.stderr)
        print(summarize_trace(tdir, top_k=18, group_by="op"), file=sys.stderr)
        print(f"=== b={b} per-category ===", file=sys.stderr)
        print(summarize_trace(tdir, top_k=8, group_by="category"),
              file=sys.stderr)

    r128, r256 = 128 / results[128], 256 / results[256]
    log(f"knee: b=128 {r128:.0f} img/s vs b=256 {r256:.0f} img/s "
        f"({(r256 / r128 - 1) * 100:+.1f}%)")


if __name__ == "__main__":
    main()
