#!/usr/bin/env python
"""Interleaved A/B: buffer donation on the training step (TPU v5e).

Measures a CE train step (MSCAN-t d1+fix rep model, b=64, AdamW) with and
without ``donate_argnums=(params, state, opt_state)``.  Donation lets XLA
update weights/moments in place instead of allocating output buffers —
a bandwidth and peak-HBM saving.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cat_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from functools import partial

import jax.numpy as jnp
import optax

from bench import B, KEY, log, run_pipeline
from convnet_approximater_tpu.core import MscaRep
from convnet_approximater_tpu.models import MSCAN_Classifier
from convnet_approximater_tpu.nn.module import Ctx, _merge_state


def make_step(model, tx, donate):
    def loss_fn(params, state, images, labels, rng):
        ctx = Ctx(training=True, rng=rng, state=state)
        logits = model(params, images, ctx)
        new_state = _merge_state(state, ctx.state_out)
        one_hot = jax.nn.one_hot(labels, logits.shape[-1])
        loss = -jnp.mean(jnp.sum(jax.nn.log_softmax(logits) * one_hot, axis=-1))
        return loss, new_state

    @partial(jax.jit, donate_argnums=(0, 1, 2) if donate else ())
    def step(params, state, opt_state, images, labels, rng):
        (loss, new_state), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, state, images, labels, rng)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_state, opt_state, loss

    return step


def time_steps(step, carry, x, y, n=24):
    # carry = (params, state, opt_state): donated buffers are consumed, so
    # the caller must thread the returned trees into the next measurement
    p, s, o = carry
    rng = KEY
    for i in range(2):
        p, s, o, loss = step(p, s, o, x, y, jax.random.fold_in(rng, i))
    float(loss)
    t0 = time.time()
    for i in range(n):
        p, s, o, loss = step(p, s, o, x, y, jax.random.fold_in(rng, 100 + i))
    float(loss)
    return (time.time() - t0) / n, (p, s, o)


def main():
    model = MSCAN_Classifier(num_classes=1000)
    variables = {"params": model.init(KEY), "state": model.init_state()}
    model, variables = run_pipeline(model, variables,
                                    MscaRep(decomp=1, fix=True), [])
    tx = optax.adamw(1e-4)
    x = jax.random.normal(KEY, (B, 224, 224, 3))
    y = jnp.zeros((B,), jnp.int32)

    import jax.tree_util as jtu
    v_a = jtu.tree_map(lambda a: a, variables)
    v_b = jtu.tree_map(lambda a: a, variables)
    opt_a = tx.init(v_a["params"])
    opt_b = tx.init(v_b["params"])

    s_plain = make_step(model, tx, donate=False)
    s_don = make_step(model, tx, donate=True)

    # plain pairs FIRST: a failed aliased executable wedges the whole relay
    # session (every op afterwards dies), so the donated attempt goes last
    carry_a = (v_a["params"], v_a["state"], opt_a)
    ts = []
    for i in range(4):
        ta, carry_a = time_steps(s_plain, carry_a, x, y)
        ts.append(ta)
        log(f"  rep {i}: plain {ta*1e3:.3f} ms")
    ma = sum(ts) / len(ts)
    log(f"train step (CE, AdamW, d1+fix rep, b={B}): plain {ma*1e3:.3f} ms "
        f"({B/ma:.0f} img/s training)")
    try:
        carry_b = (v_b["params"], v_b["state"], opt_b)
        tb, carry_b = time_steps(s_don, carry_b, x, y)
        tb2, _ = time_steps(s_don, carry_b, x, y)
        mb = (tb + tb2) / 2
        log(f"donation: {ma*1e3:.3f} -> {mb*1e3:.3f} ms ({ma/mb:.3f}x)")
    except Exception as e:
        # the axon relay rejects aliased-buffer executables
        # (doc/perf-notes.md "relay limitations")
        log(f"donated step FAILED on this runtime: {str(e)[:120]}")


if __name__ == "__main__":
    main()
