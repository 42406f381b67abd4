"""Pallas fused kernels vs the lax reference path (interpret mode on CPU;
the same tests compile natively on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from convnet_approximater_tpu.layers import MSCA, ParallelConv
from convnet_approximater_tpu.ops.pallas import (
    msca_fused,
    pack_cascade_weights,
    parallel_cascade,
)

INTERPRET = jax.default_backend() == "cpu"


def _rel(a, b):
    return float(jnp.linalg.norm(a - b) / (jnp.linalg.norm(a) + 1e-9))


def _bank_params_from_module(pc, params):
    w1s, b1s, w2s, b2s = [], [], [], []
    for name, b in pc.branches.named_children():
        if not hasattr(b, "conv1"):
            continue
        bp = params["branches"][name]
        w1s.append(bp["conv1"]["weight"][0, :, 0, :])  # (1,k,1,C) -> (k, C)
        b1s.append(bp["conv1"].get("bias"))
        w2s.append(bp["conv2"]["weight"][:, 0, 0, :])  # (k,1,1,C) -> (k, C)
        b2s.append(bp["conv2"].get("bias"))
    return pack_cascade_weights(w1s, b1s, w2s, b2s)


def test_parallel_cascade_matches_lax():
    C, k_sizes = 16, (3, 5, 7)
    pc = ParallelConv(C, list(k_sizes), [k // 2 for k in k_sizes], len(k_sizes),
                      all_bias=True, identity=True)
    params = pc.init(jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (2, 12, 10, C))
    y_ref, _, _ = pc.apply(params, x)
    w1, b1, w2, b2, ks = _bank_params_from_module(pc, params)
    y = parallel_cascade(x, w1, b1, w2, b2, ks=ks, identity=True, interpret=INTERPRET)
    assert _rel(y_ref, y) < 1e-5


def test_parallel_cascade_no_identity_no_bias():
    C = 8
    pc = ParallelConv(C, 5, 2, 2, all_bias=False, identity=False)
    params = pc.init(jax.random.key(2))
    x = jax.random.normal(jax.random.key(3), (1, 9, 9, C))
    y_ref, _, _ = pc.apply(params, x)
    w1, b1, w2, b2, ks = _bank_params_from_module(pc, params)
    y = parallel_cascade(x, w1, b1, w2, b2, ks=ks, identity=False, interpret=INTERPRET)
    assert _rel(y_ref, y) < 1e-5


def test_msca_fused_matches_module():
    C, k1, k_sizes = 16, 5, (3, 5, 7)
    msca = MSCA(C, k1, k_sizes)
    params = msca.init(jax.random.key(4))
    x = jax.random.normal(jax.random.key(5), (2, 14, 14, C))
    y_ref, _, _ = msca.apply(params, x)
    w1, b1, w2, b2, ks = _bank_params_from_module(msca.sd_convs, params["sd_convs"])
    w0 = params["conv0"]["weight"][:, :, 0, :]  # (k0, k0, C) depthwise taps
    b0 = params["conv0"]["bias"]
    wm = params["channel_mix"]["weight"][0, 0]  # (C, C): in, out
    bm = params["channel_mix"]["bias"]
    y = msca_fused(x, w0, b0, w1, b1, w2, b2, wm, bm, ks=ks, identity=True,
                   interpret=INTERPRET)
    assert _rel(y_ref, y) < 1e-5


def test_msca_fused_decomposed_form():
    """The decomp=1 cascade (single branch, no identity) also runs through the
    fused kernel after MscaRep."""
    from convnet_approximater_tpu.core import MscaRep

    C, k_sizes = 8, (3, 5)
    msca = MSCA(C, 5, k_sizes)
    params = msca.init(jax.random.key(6))
    app = MscaRep(decomp=1, fix=False)
    sub, sparams = app.initialize(msca, params, jax.random.key(7))
    app.optimize(sub, sparams)
    tgt = sub.new_module
    tp = sparams["new"]
    x = jax.random.normal(jax.random.key(8), (1, 12, 12, C))
    y_ref, _, _ = tgt.apply(tp, x)
    # single-cascade bank
    w1, b1, w2, b2, ks = pack_cascade_weights(
        [tp["sd_convs"]["conv1"]["weight"][0, :, 0, :]],
        [tp["sd_convs"]["conv1"].get("bias")],
        [tp["sd_convs"]["conv2"]["weight"][:, 0, 0, :]],
        [tp["sd_convs"]["conv2"].get("bias")],
    )
    w0 = tp["conv0"]["weight"][:, :, 0, :]
    y = msca_fused(x, w0, tp["conv0"]["bias"], w1, b1, w2, b2,
                   tp["channel_mix"]["weight"][0, 0], tp["channel_mix"]["bias"],
                   ks=ks, identity=False, interpret=INTERPRET)
    assert _rel(y_ref, y) < 1e-5
