#!/usr/bin/env python
"""Measure the QAT fake-quant training tax on TPU.

``PrepareQAT`` swaps dense Conv2d/Linear for their STE fake-quant twins
(layers/quant.py), adding per-site weight quantize-dequantize in the
forward and the EMA absmax observer update to the step.  This experiment
times the full CE+AdamW train step (fwd+bwd+update) dense vs QAT-prepared
at b=64 @224 so doc/perf-notes.md can state the tax directly — the number
that decides whether QAT runs for the whole fine-tune or only the last
epochs.  (The reference has no QAT; its finetune protocol is
``src/approx/hooks/finetune.py:95-420`` — this measures the quant-axis
extension round 4 added.)

Usage: python scripts/exp_qat_step.py [--model resnet18|alexnet|all]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cat_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
if "--platform" in sys.argv:  # sitecustomize pins axon; flag beats env var
    jax.config.update("jax_platforms",
                      sys.argv[sys.argv.index("--platform") + 1])

import optax

from bench import B, KEY, log
from convnet_approximater_tpu.deploy import prepare_qat
from exp_train_models import make_step, time_steps


def bench_pair(name, build):
    import jax.numpy as jnp

    x = jax.random.normal(KEY, (B, 224, 224, 3))
    y = jnp.zeros((B,), jnp.int32)
    tx = optax.adamw(1e-4)
    rows = {}
    for qat in (False, True):
        for amp in (False, True):
            model, variables = build()
            if qat:
                n = prepare_qat(model, variables)
            carry = (variables["params"], variables.get("state", {}),
                     tx.init(variables["params"]))
            step = make_step(model, tx, amp)
            ts = []
            for _ in range(3):
                t, carry = time_steps(step, carry, x, y)
                ts.append(t)
            t = min(ts)
            tag = ("qat " if qat else "dense ") + ("amp" if amp else "f32")
            rows[tag] = t
            extra = f" ({n} fake-quant sites)" if qat else ""
            log(f"{name} {tag} step (b={B}): {t*1e3:.2f} ms "
                f"({B/t:.0f} img/s){extra}")
    for amp_tag in ("f32", "amp"):
        d, q = rows[f"dense {amp_tag}"], rows[f"qat {amp_tag}"]
        log(f"{name} QAT tax {amp_tag}: {(q/d - 1)*100:+.1f}% "
            f"({d*1e3:.2f} -> {q*1e3:.2f} ms)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="all",
                    choices=["resnet18", "alexnet", "all"])
    ap.add_argument("--platform", default=None, help="pin jax_platforms "
                    "(handled at import; listed here for --help)")
    args = ap.parse_args()
    log(f"devices: {jax.devices()}")
    if args.model in ("resnet18", "all"):
        from convnet_approximater_tpu.models import ResNet

        def build():
            m = ResNet(depth=18, num_classes=1000)
            return m, {"params": m.init(KEY), "state": m.init_state()}

        bench_pair("ResNet-18", build)
    if args.model in ("alexnet", "all"):
        from convnet_approximater_tpu.models import build_model

        def build():
            m = build_model(dict(type="AlexNet"))
            return m, {"params": m.init(KEY), "state": m.init_state()}

        bench_pair("AlexNet", build)


if __name__ == "__main__":
    main()
