"""MSCA fused-dispatch correctness: forcing the fused path (interpret mode)
must match the lax path for the original bank, the decomp=1 cascade, and the
fix=True border-corrected form."""

import jax
import numpy as np
import pytest

from convnet_approximater_tpu.core import MscaRep
from convnet_approximater_tpu.layers import MSCA


def _rel(a, b):
    import jax.numpy as jnp

    return float(jnp.linalg.norm(a - b) / (jnp.linalg.norm(a) + 1e-9))


def test_fused_dispatch_original_bank():
    msca = MSCA(16, 5, (3, 5, 7))
    params = msca.init(jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (2, 12, 12, 16))
    y_lax, _, _ = msca.apply(params, x)
    y_fused = msca._fused_forward(params, x, interpret=True)
    assert _rel(y_lax, y_fused) < 1e-5


@pytest.mark.parametrize("decomp,fix", [(1, False), (1, True), (2, True), (4, False)])
def test_fused_dispatch_after_rep(decomp, fix):
    msca = MSCA(8, 5, (3, 5))
    params = msca.init(jax.random.key(2))
    app = MscaRep(decomp=decomp, fix=fix)
    sub, sparams = app.initialize(msca, params, jax.random.key(3))
    app.optimize(sub, sparams)
    tgt = sub.new_module
    x = jax.random.normal(jax.random.key(4), (1, 10, 10, 8))
    y_lax, _, _ = tgt.apply(sparams["new"], x)
    assert tgt._fuse_parts() is not None
    y_fused = tgt._fused_forward(sparams["new"], x, interpret=True)
    assert _rel(y_lax, y_fused) < 1e-5


def test_fused_not_used_when_training_or_off():
    from convnet_approximater_tpu.nn.module import Ctx

    msca = MSCA(8, 5, (3, 5))
    x = jax.numpy.ones((1, 8, 8, 8))
    assert not msca._can_fuse(Ctx(training=True), x)
    msca.fused = "off"
    assert not msca._can_fuse(Ctx(training=False), x)


def test_fused_d0_falls_back():
    """decomp=0 target (dense depthwise) is not bank-expressible."""
    msca = MSCA(8, 5, (3, 5))
    params = msca.init(jax.random.key(5))
    app = MscaRep(decomp=0, fix=True)
    sub, sparams = app.initialize(msca, params, jax.random.key(6))
    assert sub.new_module._fuse_parts() is None
