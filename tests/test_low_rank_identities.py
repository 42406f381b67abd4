"""The three convolution identities scheme-1 rests on (SURVEY.md §4).

TPU-native ports of the reference's ``tests/test_low_rank_exp.py``: the same
numeric statements expressed on NHWC tensors with ``lax.conv_general_dilated``
(via ops.conv2d).  These gate every layer/solver above them.
"""

import jax
import jax.numpy as jnp
import pytest

from convnet_approximater_tpu.ops import conv as ops


def compare4d(y1, y2, tol=1e-5):
    assert y1.shape == y2.shape
    B = y1.shape[0]
    a = jnp.mean(jnp.linalg.norm((y1 - y2).reshape(B, -1), axis=1))
    ref = jnp.mean(jnp.linalg.norm(y1.reshape(B, -1), axis=1))
    assert float(a / ref) < tol, f"rel err {float(a / ref)}"


@pytest.fixture(scope="module")
def keys():
    return jax.random.split(jax.random.key(0), 8)


def test_scalar_linearity(keys):
    B, C, H, W, N, d = 4, 64, 14, 14, 32, 3
    x = jax.random.normal(keys[0], (B, H, W, C))
    w = jax.random.uniform(keys[1], (d, d, C, N))
    y1 = ops.conv2d(x, w) * 2
    y2 = ops.conv2d(x, w * 2)
    compare4d(y1, y2)


def test_separability_identity(keys):
    """Grouped conv with rank-1 kernels v@h == cascade of (1,d) then (d,1)."""
    B, C, H, W, M, d = 4, 64, 14, 14, 6, 3
    x = jax.random.normal(keys[2], (B, H, W, C))
    v = jax.random.normal(keys[3], (M * C, d))  # vertical taps per out-channel
    h = jax.random.normal(keys[4], (M * C, d))  # horizontal taps
    # full kernels: k[o, i, j] = v[o, i] * h[o, j] -> HWIO grouped (d, d, 1, M*C)
    k = v[:, :, None] * h[:, None, :]
    s_w = jnp.transpose(k, (1, 2, 0))[:, :, None, :]
    y1 = ops.conv2d(x, s_w, groups=C)
    # cascade: horizontal (1, d) grouped by C, then vertical (d, 1) depthwise
    h_w = jnp.transpose(h, (1, 0))[None, :, None, :]  # (1, d, 1, M*C)
    v_w = jnp.transpose(v, (1, 0))[:, None, None, :]  # (d, 1, 1, M*C)
    tmp = ops.conv2d(x, h_w, groups=C)
    y2 = ops.conv2d(tmp, v_w, groups=M * C)
    compare4d(y1, y2)


def test_basis_expansion_identity(keys):
    """Conv with W = weights @ bases == grouped basis conv + 1x1 mixing conv.

    Channel conventions match the reference exactly: the grouped conv's output
    channel c*M + m applies basis m to input channel c, and the 1x1 weight is
    weights reshaped (N, C*M).
    """
    N, C, M, d = 32, 48, 8, 5
    x = jax.random.normal(keys[5], (4, 14, 14, C))
    weights = jax.random.uniform(keys[6], (N * C, M))
    bases = jax.random.uniform(keys[7], (M, d * d))
    W = (weights @ bases).reshape(N, C, d, d)
    y1 = ops.conv2d(x, jnp.transpose(W, (2, 3, 1, 0)))
    # s_conv: bases replicated across C groups -> HWIO (d, d, 1, C*M)
    s_w = jnp.transpose(
        jnp.broadcast_to(bases.reshape(1, M, d, d), (C, M, d, d)).reshape(C * M, d, d),
        (1, 2, 0),
    )[:, :, None, :]
    tmp = ops.conv2d(x, s_w, groups=C)
    # d_conv: (N, C*M) -> HWIO (1, 1, C*M, N)
    d_w = jnp.transpose(weights.reshape(N, C * M))[None, None, :, :]
    y2 = ops.conv2d(tmp, d_w)
    compare4d(y1, y2, tol=2e-5)


def test_grouped_matches_dense_blockdiag(keys):
    """Grouped conv equals dense conv with block-diagonal kernel."""
    B, C, H, W, d, g = 2, 16, 10, 10, 3, 4
    x = jax.random.normal(keys[0], (B, H, W, C))
    w = jax.random.normal(keys[1], (d, d, C // g, C))
    y1 = ops.conv2d(x, w, padding=1, groups=g)
    dense = jnp.zeros((d, d, C, C))
    cg = C // g
    for gi in range(g):
        dense = dense.at[:, :, gi * cg:(gi + 1) * cg, gi * cg:(gi + 1) * cg].set(
            w[:, :, :, gi * cg:(gi + 1) * cg]
        )
    y2 = ops.conv2d(x, dense, padding=1)
    compare4d(y1, y2)


def test_matmul_mode_falls_back_on_per_channel_taps(monkeypatch):
    """CAT_ENABLE_MATMUL_MODE assumes channel-shared bases; after per-channel
    fine-tuning the layer must detect it (eager path) and use the exact conv
    path instead of silently computing a different function (ADVICE r1 low)."""
    import jax
    import numpy as np

    from convnet_approximater_tpu.layers.low_rank_conv import LowRankExpConvV1
    from convnet_approximater_tpu.nn import Ctx

    monkeypatch.setenv("CAT_ENABLE_MATMUL_MODE", "1")
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    layer = LowRankExpConvV1(4, 6, num_base=2, kernel_size=3, stride=1,
                             padding=1, decomp=True)
    params = layer.init(jax.random.key(0))
    # per-channel taps (as L2Reconstruct training would produce)
    params["s_conv"]["v_conv"]["weight"] = jax.random.normal(
        jax.random.key(1), params["s_conv"]["v_conv"]["weight"].shape)
    x = jax.random.normal(jax.random.key(2), (2, 8, 8, 4))
    y_guarded = layer(params, x, Ctx())
    monkeypatch.delenv("CAT_ENABLE_MATMUL_MODE")
    y_conv = layer(params, x, Ctx())
    np.testing.assert_allclose(np.asarray(y_guarded), np.asarray(y_conv),
                               rtol=1e-5, atol=1e-6)
    assert layer._warned_per_channel


def test_separable_shift_lowering_matches_grouped():
    """CAT_SEP_SHIFT=1: shift-multiply lowering == grouped-conv pair."""
    import os

    import jax

    from convnet_approximater_tpu.layers.low_rank_conv import SeparableConv
    from convnet_approximater_tpu.nn.module import Ctx

    key = jax.random.PRNGKey(3)
    for (C, M, k, pad) in [(4, 3, 3, 1), (8, 2, 5, 2)]:
        sc = SeparableConv(C, M, k, 1, pad)
        params = sc.init(key)
        x = jax.random.normal(key, (2, 12, 12, C))
        y0 = sc(params, x, Ctx(training=False))
        try:
            os.environ["CAT_SEP_SHIFT"] = "1"
            y1 = sc(params, x, Ctx(training=False))
        finally:
            os.environ.pop("CAT_SEP_SHIFT", None)
        assert jnp.max(jnp.abs(y1 - y0)) < 1e-5
