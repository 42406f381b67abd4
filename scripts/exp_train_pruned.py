#!/usr/bin/env python
"""Training-path payoff of the width-prune family (VERDICT r4 #7).

The emitted recovery chains (plan_serving --emit-recovery) fine-tune the
PRUNED structure — so the width cut pays twice: at serving AND during
the recovery training itself.  This measures the full CE+AdamW train
step (fwd+bwd+update) dense vs pruned, f32 and amp, with approximate
train-step MFU (3x forward FLOPs / step time — the standard fwd+bwd
estimate) next to the serving MFU bench.py reports:

  ResNet-18: dense vs trunk+chain keep=0.5 (round_to=64)
  MSCAN-t:   dense vs the quad width cut (deploy.prune_width 0.5) —
             the structure the quad-record recovery chain trains

Usage: python scripts/exp_train_pruned.py [--model resnet18|mscan|all]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cat_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import optax

from bench import B, KEY, PEAK_TFLOPS, log
from exp_train_models import make_step, time_steps
from convnet_approximater_tpu.deploy import (prune_chains, prune_trunks,
                                             prune_width)
from convnet_approximater_tpu.hooks.model_analysis import analyze_model


def bench(name, build, shape=(None, 224, 224, 3)):
    shape = (B,) + shape[1:]
    x = jax.random.normal(KEY, shape)
    y = jnp.zeros((B,), jnp.int32)
    tx = optax.adamw(1e-4)
    out = {}
    for amp in (False, True):
        model, variables = build()
        try:
            fwd_flops = analyze_model(model, variables, shape)["flops"]
        except Exception:
            fwd_flops = None
        carry = (variables["params"], variables.get("state", {}),
                 tx.init(variables["params"]))
        step = make_step(model, tx, amp)
        ts = []
        for i in range(3):
            t, carry = time_steps(step, carry, x, y)
            ts.append(t)
        t = min(ts)
        tag = "amp(bf16)" if amp else "f32"
        mfu = ""
        if fwd_flops:
            # fwd+bwd ~ 3x forward FLOPs (weight grad + input grad)
            tflops = 3 * fwd_flops / t / 1e12
            peak = PEAK_TFLOPS["bfloat16" if amp else "float32"]
            mfu = f" | ~{tflops:.1f} TFLOP/s = {100 * tflops / peak:.1f}% MFU"
        log(f"{name} train step {tag} (CE+AdamW, b={B}): {t * 1e3:.2f} ms "
            f"({B / t:.0f} img/s){mfu}")
        out[tag] = t
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="all",
                    choices=["resnet18", "mscan", "all"])
    args = ap.parse_args()
    log(f"devices: {jax.devices()}")

    if args.model in ("resnet18", "all"):
        from convnet_approximater_tpu.models import ResNet

        def dense():
            m = ResNet(depth=18, num_classes=1000)
            return m, {"params": m.init(KEY), "state": m.init_state()}

        def pruned():
            m, var = dense()
            prune_trunks(m, var, keep_ratio=0.5, round_to=64)
            prune_chains(m, var, keep_ratio=0.5, round_to=64)
            return m, var

        td = bench("ResNet-18 dense", dense)
        tp = bench("ResNet-18 trunk+chain 0.5", pruned)
        for tag in td:
            log(f"  -> R18 {tag} train speedup {td[tag] / tp[tag]:.2f}x")

    if args.model in ("mscan", "all"):
        from convnet_approximater_tpu.models import MSCAN_Classifier

        def dense():
            m = MSCAN_Classifier(num_classes=1000)
            return m, {"params": m.init(KEY), "state": m.init_state()}

        def pruned():
            m, var = dense()
            prune_width(m, var, keep_ratio=0.5, round_to=64,
                        ffn_round_to=128)
            return m, var

        td = bench("MSCAN-t dense", dense)
        tp = bench("MSCAN-t quad-width 0.5", pruned)
        for tag in td:
            log(f"  -> MSCAN-t {tag} train speedup {td[tag] / tp[tag]:.2f}x")


if __name__ == "__main__":
    main()
