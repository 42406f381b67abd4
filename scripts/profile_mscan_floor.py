#!/usr/bin/env python
"""Profile the MSCAN-t rep model on TPU and attribute device time to source
lines — used to find the non-attention floor (FFN / projections / norms).

Usage: python scripts/profile_mscan_floor.py [--config orig|rep|best]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cat_jax_cache"))

from convnet_approximater_tpu.core import MscaRep
from convnet_approximater_tpu.models import MSCAN_Classifier
from convnet_approximater_tpu.runner import Runner  # noqa: F401 (registry)
from convnet_approximater_tpu.utils.trace import summarize_trace

B = 64
KEY = jax.random.PRNGKey(0)


def run_pipeline(model, variables, app, filters=()):
    from bench import run_pipeline as rp

    return rp(model, variables, app, list(filters))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="rep",
                    choices=["orig", "rep", "best", "quad"])
    ap.add_argument("--trace-dir", default="/tmp/mscan_trace")
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    x = jax.random.normal(KEY, (B, 224, 224, 3))
    model = MSCAN_Classifier(num_classes=1000)
    variables = {"params": model.init(KEY), "state": model.init_state()}
    if args.config == "quad":
        # the r4e record surface (bench.bench_records recipe): trunk+attn+
        # ffn prune 0.5 + rep; the FfnRep arbiter replays the persisted
        # decision table (written by the first bench_records run) so this
        # profiles the SAME structure bench times — on a checkout where no
        # table exists yet, this run measures and writes it instead
        from convnet_approximater_tpu.core import AttnPrune, FfnPrune, FfnRep
        from convnet_approximater_tpu.deploy import (arbitrated_apply,
                                                     enable_pw_matmul,
                                                     fold_batchnorm,
                                                     prune_trunks)
        from convnet_approximater_tpu.hooks.inference_time_hook import (
            time_forward,
        )
        from convnet_approximater_tpu.utils import cast_floating

        prune_trunks(model, variables, keep_ratio=0.5, round_to=64)
        model, variables = run_pipeline(model, variables,
                                        AttnPrune(keep_ratio=0.5))
        model, variables = run_pipeline(model, variables,
                                        FfnPrune(keep_ratio=0.5, round_to=128))
        model, variables = run_pipeline(
            model, variables, MscaRep(decomp=1, fix=True, decomp_conv0=True))

        def timed(mm, vv, s, dt):
            vb = {"params": cast_floating(vv["params"], jnp.bfloat16),
                  "state": vv.get("state", {})}
            _, _, ts = time_forward(mm, vb, s, num_iters=6, warmup=2,
                                    dtype=jnp.bfloat16)
            return float(ts.mean())

        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        arbitrated_apply(
            model, variables, FfnRep(fix=True), [], x.shape,
            dtype=jnp.bfloat16, time_fn=timed,
            group_fn=lambda n: n.rsplit(".", 3)[0], verbose=False,
            decisions_path=os.path.join(root, "doc", "record_decisions",
                                        "mscan-t_ffnrep.json"))
        fold_batchnorm(model, variables)
        enable_pw_matmul(model)
        variables = {"params": cast_floating(variables["params"]),
                     "state": variables["state"]}
        x = x.astype(jnp.bfloat16)
    if args.config in ("rep", "best"):
        model, variables = run_pipeline(
            model, variables,
            MscaRep(decomp=1, fix=True, decomp_conv0=(args.config == "best")))
    if args.config == "best":
        from convnet_approximater_tpu.core import FfnRep
        from convnet_approximater_tpu.filters import IndicesFilter

        model, variables = run_pipeline(
            model, variables, FfnRep(fix=True),
            filters=[IndicesFilter((1, 2, 3, 4, 5, 6))])
        from convnet_approximater_tpu.deploy import fold_batchnorm
        from convnet_approximater_tpu.utils import cast_floating

        fold_batchnorm(model, variables)
        variables = {"params": cast_floating(variables["params"]),
                     "state": variables["state"]}
        x = x.astype(jnp.bfloat16)

    def fwd(params, state, xx):
        y, _, _ = model.apply(params, xx, state=state, training=False)
        return y

    jf = jax.jit(fwd)
    r = jf(variables["params"], variables["state"], x)
    float(jnp.sum(r))  # force real execution through the relay

    with jax.profiler.trace(args.trace_dir):
        for _ in range(args.iters):
            r = jf(variables["params"], variables["state"], x)
        float(jnp.sum(r))

    for gb in ("source", "category"):
        print(f"\n=== group_by={gb} (config={args.config}, {args.iters} iters) ===")
        print(summarize_trace(args.trace_dir, top_k=25, group_by=gb))


if __name__ == "__main__":
    main()
