#!/usr/bin/env python
"""Training-step throughput for the beyond-reference families.

CE + AdamW full train step (fwd+bwd+update), f32 and amp (bf16 compute /
f32 master params — the `amp=True` path in hooks/finetune.py and
TrainHelper), on ResNet-50 and ConvNeXt-T at b=64 @224.  Complements the
MSCAN-t number in README ("Fine-tune train step").

Usage: python scripts/exp_train_models.py [--model resnet50|convnext|all]
"""

import argparse
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cat_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import optax

from bench import B, KEY, log
from convnet_approximater_tpu.nn.module import Ctx, _merge_state
from convnet_approximater_tpu.utils import cast_floating


def make_step(model, tx, amp):
    def loss_fn(params, state, images, labels, rng):
        if amp:
            params = cast_floating(params, jnp.bfloat16)
            images = images.astype(jnp.bfloat16)
        ctx = Ctx(training=True, rng=rng, state=state)
        logits = model(params, images, ctx).astype(jnp.float32)
        new_state = _merge_state(state, ctx.state_out)
        one_hot = jax.nn.one_hot(labels, logits.shape[-1])
        loss = -jnp.mean(jnp.sum(jax.nn.log_softmax(logits) * one_hot, axis=-1))
        return loss, new_state

    @jax.jit
    def step(params, state, opt_state, images, labels, rng):
        (loss, new_state), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, state, images, labels, rng)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_state, opt_state, loss

    return step


def time_steps(step, carry, x, y, n=24):
    p, s, o = carry
    for i in range(2):
        p, s, o, loss = step(p, s, o, x, y, jax.random.fold_in(KEY, i))
    float(loss)
    t0 = time.time()
    for i in range(n):
        p, s, o, loss = step(p, s, o, x, y, jax.random.fold_in(KEY, 100 + i))
    float(loss)
    return (time.time() - t0) / n, (p, s, o)


def bench(name, build, mfu=False):
    """Min-of-3 full-train-step timing, f32 and amp.  ``mfu=True`` adds an
    approximate train MFU line (3x forward FLOPs / step — the standard
    fwd+bwd estimate).  Returns ``{tag: seconds}`` (shared with
    exp_train_pruned so the timing protocol cannot drift)."""
    x = jax.random.normal(KEY, (B, 224, 224, 3))
    y = jnp.zeros((B,), jnp.int32)
    tx = optax.adamw(1e-4)
    out = {}
    for amp in (False, True):
        model, variables = build()
        fwd_flops = None
        if mfu:
            try:
                from convnet_approximater_tpu.hooks.model_analysis import (
                    analyze_model,
                )

                fwd_flops = analyze_model(model, variables, x.shape)["flops"]
            except Exception:
                pass
        carry = (variables["params"], variables.get("state", {}),
                 tx.init(variables["params"]))
        step = make_step(model, tx, amp)
        ts = []
        for i in range(3):
            t, carry = time_steps(step, carry, x, y)
            ts.append(t)
        t = min(ts)
        tag = "amp(bf16)" if amp else "f32"
        line = ""
        if fwd_flops:
            from bench import PEAK_TFLOPS

            tflops = 3 * fwd_flops / t / 1e12
            peak = PEAK_TFLOPS["bfloat16" if amp else "float32"]
            line = f" | ~{tflops:.1f} TFLOP/s = {100 * tflops / peak:.1f}% MFU"
        log(f"{name} train step {tag} (CE+AdamW, b={B}): {t*1e3:.2f} ms "
            f"({B/t:.0f} img/s){line}")
        out[tag] = t
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="all",
                    choices=["resnet50", "convnext", "all"])
    args = ap.parse_args()
    log(f"devices: {jax.devices()}")
    if args.model in ("resnet50", "all"):
        from convnet_approximater_tpu.models import ResNet

        def build():
            m = ResNet(depth=50, num_classes=1000)
            return m, {"params": m.init(KEY), "state": m.init_state()}

        bench("ResNet-50", build)
    if args.model in ("convnext", "all"):
        from convnet_approximater_tpu.models import ConvNeXt

        # b=64 f32 fwd+bwd activations OOM a single v5e-1 (measured r3f);
        # remat=True checkpoints each scanned block on the backward pass —
        # activation memory O(1) in depth for one extra forward per block
        def build():
            m = ConvNeXt(arch="tiny", num_classes=1000, drop_path_rate=0.1,
                         remat=True)
            return m, {"params": m.init(KEY)}

        bench("ConvNeXt-T (remat)", build)


if __name__ == "__main__":
    main()
