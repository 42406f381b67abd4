"""Numerical parity of the NHWC ops against torch's reference implementations
(torch CPU is available in the image).  This anchors every layer's semantics
to exactly what the reference's models computed."""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

import convnet_approximater_tpu.nn as nn
from convnet_approximater_tpu.ops import conv as ops


def _nhwc(x_nchw):
    return jnp.asarray(np.transpose(x_nchw, (0, 2, 3, 1)))


def _hwio(w_oihw):
    return jnp.asarray(np.transpose(w_oihw, (2, 3, 1, 0)))


@pytest.mark.parametrize("stride,padding,groups", [(1, 2, 1), (2, 1, 1), (1, 1, 4), (1, 2, 8)])
def test_conv2d_matches_torch(stride, padding, groups):
    rs = np.random.RandomState(0)
    C, N, k = 8, 16, 5 if padding == 2 else 3
    x = rs.randn(2, C, 13, 13).astype(np.float32)
    w = rs.randn(N, C // groups, k, k).astype(np.float32)
    b = rs.randn(N).astype(np.float32)
    y_t = torch.nn.functional.conv2d(
        torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
        stride=stride, padding=padding, groups=groups,
    ).numpy()
    y_j = ops.conv2d(_nhwc(x), _hwio(w), jnp.asarray(b), stride=stride,
                     padding=padding, groups=groups)
    np.testing.assert_allclose(np.transpose(np.asarray(y_j), (0, 3, 1, 2)), y_t,
                               rtol=1e-4, atol=1e-4)


def test_maxpool_matches_torch():
    rs = np.random.RandomState(1)
    x = rs.randn(2, 4, 15, 15).astype(np.float32)
    y_t = torch.nn.functional.max_pool2d(torch.from_numpy(x), 3, 2).numpy()
    y_j = ops.max_pool2d(_nhwc(x), 3, 2)
    np.testing.assert_allclose(np.transpose(np.asarray(y_j), (0, 3, 1, 2)), y_t, rtol=1e-5)


@pytest.mark.parametrize("in_hw,out_hw", [((13, 13), (6, 6)), ((14, 10), (7, 7)), ((5, 5), (7, 7))])
def test_adaptive_avg_pool_matches_torch(in_hw, out_hw):
    rs = np.random.RandomState(2)
    x = rs.randn(2, 3, *in_hw).astype(np.float32)
    y_t = torch.nn.functional.adaptive_avg_pool2d(torch.from_numpy(x), out_hw).numpy()
    y_j = ops.adaptive_avg_pool2d(_nhwc(x), out_hw)
    np.testing.assert_allclose(np.transpose(np.asarray(y_j), (0, 3, 1, 2)), y_t,
                               rtol=1e-5, atol=1e-6)


def test_batchnorm_matches_torch_train_and_eval():
    rs = np.random.RandomState(3)
    C = 6
    x = rs.randn(4, C, 5, 5).astype(np.float32)
    bn_t = torch.nn.BatchNorm2d(C, eps=1e-5, momentum=0.1)
    bn_t.weight.data = torch.from_numpy(rs.randn(C).astype(np.float32))
    bn_t.bias.data = torch.from_numpy(rs.randn(C).astype(np.float32))

    bn_j = nn.BatchNorm2d(C)
    params = {"scale": jnp.asarray(bn_t.weight.detach().numpy()),
              "bias": jnp.asarray(bn_t.bias.detach().numpy())}
    state = bn_j.init_own_state()

    # training step: normalized output + running-stat update
    bn_t.train()
    y_t = bn_t(torch.from_numpy(x)).detach().numpy()
    y_j, new_state, _ = nn.Sequential(bn_j).apply({"0": params}, _nhwc(x),
                                                  state={"0": state}, training=True)
    np.testing.assert_allclose(np.transpose(np.asarray(y_j), (0, 3, 1, 2)), y_t,
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(new_state["0"]["mean"]),
                               bn_t.running_mean.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_state["0"]["var"]),
                               bn_t.running_var.numpy(), rtol=1e-4, atol=1e-5)

    # eval step uses running stats
    bn_t.eval()
    y_t2 = bn_t(torch.from_numpy(x)).detach().numpy()
    y_j2, _, _ = nn.Sequential(bn_j).apply({"0": params}, _nhwc(x),
                                           state={"0": new_state["0"]}, training=False)
    np.testing.assert_allclose(np.transpose(np.asarray(y_j2), (0, 3, 1, 2)), y_t2,
                               rtol=1e-4, atol=1e-4)


def test_layernorm_and_gelu_match_torch():
    rs = np.random.RandomState(4)
    C = 10
    x = rs.randn(3, 7, C).astype(np.float32)
    ln_t = torch.nn.LayerNorm(C)
    ln_t.weight.data = torch.from_numpy(rs.randn(C).astype(np.float32))
    ln_t.bias.data = torch.from_numpy(rs.randn(C).astype(np.float32))
    y_t = ln_t(torch.from_numpy(x)).detach().numpy()
    ln_j = nn.LayerNorm(C)
    params = {"scale": jnp.asarray(ln_t.weight.detach().numpy()),
              "bias": jnp.asarray(ln_t.bias.detach().numpy())}
    y_j = ln_j(params, jnp.asarray(x), nn.Ctx())
    np.testing.assert_allclose(np.asarray(y_j), y_t, rtol=1e-4, atol=1e-4)

    g_t = torch.nn.functional.gelu(torch.from_numpy(x)).numpy()
    # exact mode matches torch bit-tightly; the default tanh form is close
    g_exact = nn.GELU(approximate=False)({}, jnp.asarray(x), nn.Ctx())
    np.testing.assert_allclose(np.asarray(g_exact), g_t, rtol=1e-5, atol=1e-6)
    g_fast = nn.GELU()({}, jnp.asarray(x), nn.Ctx())
    np.testing.assert_allclose(np.asarray(g_fast), g_t, rtol=1e-2, atol=2e-3)


def test_torch_checkpoint_conversion_end_to_end():
    """A real torch model's state_dict, converted by torch_to_tpu, must make
    the equivalent JAX model produce identical outputs."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "t2t", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                            "scripts", "ckpt_converter", "torch_to_tpu.py"))
    t2t = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(t2t)

    tm = torch.nn.Sequential(
        torch.nn.Conv2d(3, 8, 3, padding=1),
        torch.nn.BatchNorm2d(8),
        torch.nn.ReLU(),
        torch.nn.Conv2d(8, 4, 3, stride=2, padding=1, groups=4),
    )
    tm.eval()
    with torch.no_grad():
        tm[1].running_mean.uniform_(-1, 1)
        tm[1].running_var.uniform_(0.5, 2.0)
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    tree = t2t.convert_state_dict(sd, "generic")

    jm = nn.Sequential(
        nn.Conv2d(3, 8, 3, padding=1),
        nn.BatchNorm2d(8),
        nn.ReLU(),
        nn.Conv2d(8, 4, 3, stride=2, padding=1, groups=4),
    )
    x = np.random.RandomState(7).randn(2, 3, 12, 12).astype(np.float32)
    with torch.no_grad():
        y_t = tm(torch.from_numpy(x)).numpy()
    y_j, _, _ = jm.apply(tree["params"], _nhwc(x), state=tree["state"], training=False)
    np.testing.assert_allclose(np.transpose(np.asarray(y_j), (0, 3, 1, 2)), y_t,
                               rtol=1e-4, atol=1e-4)


def test_torch_conv_flatten_linear_conversion_end_to_end():
    """Converted classifiers that flatten a feature map must produce the same
    logits despite torch flattening CHW-major and us NHWC-major — requires
    convert_state_dict's first_fc_shape permutation (ADVICE r1 medium)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "t2t", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                            "scripts", "ckpt_converter", "torch_to_tpu.py"))
    t2t = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(t2t)

    torch.manual_seed(0)

    class TM(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.features = torch.nn.Sequential(torch.nn.Conv2d(3, 6, 3, padding=1),
                                                torch.nn.ReLU())
            self.classifier = torch.nn.Sequential(torch.nn.Linear(6 * 4 * 4, 10),
                                                  torch.nn.ReLU(),
                                                  torch.nn.Linear(10, 7))

        def forward(self, x):
            return self.classifier(torch.flatten(self.features(x), 1))

    tm = TM().eval()
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    tree = t2t.convert_state_dict(sd, "generic", first_fc_shape=(6, 4, 4))

    class JM(nn.Module):
        def __init__(self):
            super().__init__()
            self.features = nn.Sequential(nn.Conv2d(3, 6, 3, padding=1), nn.ReLU())
            self.classifier = nn.Sequential(nn.Linear(6 * 4 * 4, 10), nn.ReLU(),
                                            nn.Linear(10, 7))

        def __call__(self, params, x, ctx):
            x = self.child("features", params, x, ctx)
            x = x.reshape(x.shape[0], -1)  # NHWC flatten
            return self.child("classifier", params, x, ctx)

    x = np.random.RandomState(11).randn(2, 3, 4, 4).astype(np.float32)
    with torch.no_grad():
        y_t = tm(torch.from_numpy(x)).numpy()
    y_j, _, _ = JM().apply(tree["params"], _nhwc(x), training=False)
    np.testing.assert_allclose(np.asarray(y_j), y_t, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("k,vertical,bias", [(7, True, True), (21, False, True),
                                             (11, True, False), (21, True, True)])
def test_strip_conv_matmul_matches_depthwise(k, vertical, bias):
    """The banded-Toeplitz MXU lowering of depthwise strip convs must be
    numerically equivalent to the lax depthwise conv (and to torch)."""
    rs = np.random.RandomState(k)
    C, H, W = 8, 13, 9
    x = rs.randn(2, H, W, C).astype(np.float32)
    shape = (k, 1, 1, C) if vertical else (1, k, 1, C)
    w = rs.randn(*shape).astype(np.float32)
    b = rs.randn(C).astype(np.float32) if bias else None
    pad = (k // 2, 0) if vertical else (0, k // 2)
    y_conv = ops.conv2d(jnp.asarray(x), jnp.asarray(w),
                        None if b is None else jnp.asarray(b),
                        padding=pad, groups=C)
    y_mm = ops.strip_conv_matmul(jnp.asarray(x), jnp.asarray(w),
                                 None if b is None else jnp.asarray(b), k // 2)
    np.testing.assert_allclose(np.asarray(y_mm), np.asarray(y_conv),
                               rtol=1e-5, atol=1e-5)


def test_strip_matmul_env_dispatch(monkeypatch):
    """CAT_STRIP_MATMUL routes qualifying strip convs to the MXU lowering
    (k >= 7 by default; 1x1s, 2-D kernels, and strided convs keep lax)."""
    from convnet_approximater_tpu.ops import conv as C

    monkeypatch.setenv("CAT_STRIP_MATMUL", "1")
    C._strip_matmul_env.cache_clear()
    try:
        rs = np.random.RandomState(0)
        x = jnp.asarray(rs.randn(2, 12, 12, 4).astype(np.float32))
        w21 = jnp.asarray(rs.randn(21, 1, 1, 4).astype(np.float32))
        got = C._try_strip_matmul(x, w21, None, 1, (10, 0), 4, 1)
        assert got is not None
        w5 = jnp.asarray(rs.randn(5, 1, 1, 4).astype(np.float32))
        assert C._try_strip_matmul(x, w5, None, 1, (2, 0), 4, 1) is None  # k<7
        w2d = jnp.asarray(rs.randn(7, 7, 1, 4).astype(np.float32))
        assert C._try_strip_matmul(x, w2d, None, 1, 3, 4, 1) is None
        assert C._try_strip_matmul(x, w21, None, 2, (10, 0), 4, 1) is None
        # whole conv2d path agrees with the lax lowering
        y_on = C.conv2d(x, w21, None, padding=(10, 0), groups=4)
    finally:
        monkeypatch.delenv("CAT_STRIP_MATMUL")
        C._strip_matmul_env.cache_clear()
    y_off = C.conv2d(x, w21, None, padding=(10, 0), groups=4)
    np.testing.assert_allclose(np.asarray(y_on), np.asarray(y_off),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("shape,k,s,p", [
    ((2, 8, 8, 4), 2, None, 0),       # non-overlap: reshape-mean path
    ((2, 9, 9, 3), 3, 2, 1),          # overlapping + padded: conv path
    ((2, 13, 13, 5), (3, 2), (2, 3), 0),
])
def test_avg_pool_matches_torch_and_differentiates(shape, k, s, p):
    """avg_pool2d torch parity on both lowerings (reshape-mean /
    depthwise-conv).  The conv lowering exists because the axon relay
    rejects reduce_window+add linearization under grad (r3f) — so also
    assert the op differentiates."""
    import torch.nn.functional as F

    x = np.random.RandomState(11).randn(*shape).astype(np.float32)
    from convnet_approximater_tpu.ops.conv import avg_pool2d

    y = np.asarray(avg_pool2d(jnp.asarray(x), k, stride=s, padding=p))
    kt = k if isinstance(k, tuple) else (k, k)
    st = s if s is not None else kt
    st = st if isinstance(st, tuple) else (st, st)
    yt = F.avg_pool2d(torch.from_numpy(x).permute(0, 3, 1, 2), kt, st, p)
    np.testing.assert_allclose(y, yt.permute(0, 2, 3, 1).numpy(),
                               rtol=1e-5, atol=1e-6)
    g = jax.grad(lambda a: jnp.sum(avg_pool2d(a, k, stride=s, padding=p)))(
        jnp.asarray(x))
    assert g.shape == x.shape and bool(jnp.isfinite(g).all())
