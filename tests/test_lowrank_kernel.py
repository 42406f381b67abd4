"""Fused scheme-1 kernel vs the lax path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import pytest

from convnet_approximater_tpu.core import LowRankExpV1
from convnet_approximater_tpu.nn import Conv2d


def _rel(a, b):
    return float(jnp.linalg.norm(a - b) / (jnp.linalg.norm(a) + 1e-9))


def _build(do_decomp, C=6, N=10, d=5, M=4, stride=1, padding=2):
    conv = Conv2d(C, N, d, stride=stride, padding=padding)
    cparams = conv.init(jax.random.key(0))
    app = LowRankExpV1(num_bases=(M,), max_iter=0, lmda_length=1, min_lmda=0,
                       max_lmda=0, init_method="svd", do_decomp=do_decomp)
    sub, sparams = app.initialize(conv, cparams, jax.random.key(1))
    app.optimize(sub, sparams)
    mod, new_params = app.postprocess(sub, sparams)
    return mod, new_params


@pytest.mark.parametrize("do_decomp,stride", [(False, 1), (True, 1), (False, 2), (True, 2)])
def test_fused_lowrank_matches_lax(do_decomp, stride):
    mod, params = _build(do_decomp, stride=stride)
    x = jax.random.normal(jax.random.key(2), (2, 13, 13, 6))
    y_lax, _, _ = mod.apply(params, x)
    y_fused = mod._fused_forward(params, x, interpret=True)
    assert y_fused.shape == y_lax.shape
    assert _rel(y_lax, y_fused) < 1e-5


def test_fused_lowrank_rect_padding():
    mod, params = _build(False, d=3, padding=1)
    x = jax.random.normal(jax.random.key(3), (1, 9, 11, 6))
    y_lax, _, _ = mod.apply(params, x)
    y_fused = mod._fused_forward(params, x, interpret=True)
    assert _rel(y_lax, y_fused) < 1e-5


@pytest.mark.parametrize("stride", [1, 2])
def test_matmul_mode_matches_lax(stride):
    """The banded-Toeplitz MXU forward must match the conv path exactly."""
    mod, params = _build(True, stride=stride)  # decomposed form
    x = jax.random.normal(jax.random.key(4), (2, 13, 13, 6))
    from convnet_approximater_tpu.nn.module import Ctx

    y_lax = mod.apply(params, x)[0] if False else None
    # explicit lax path (training ctx disables all fast modes)
    y_lax, _, _ = mod.apply(params, x, training=True)
    y_mm = mod._matmul_forward(params, x)
    assert y_mm.shape == y_lax.shape
    assert _rel(y_lax, y_mm) < 1e-5


def test_matmul_mode_rect_kernel():
    mod, params = _build(True, d=3, padding=1, C=4, N=6, M=2)
    x = jax.random.normal(jax.random.key(5), (1, 9, 11, 4))
    y_lax, _, _ = mod.apply(params, x, training=True)
    y_mm = mod._matmul_forward(params, x)
    assert _rel(y_lax, y_mm) < 1e-5
