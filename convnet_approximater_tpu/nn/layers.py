"""Leaf neural-net layers (Conv2d, Linear, norms, activations, dropout).

These are the building blocks the reference got from ``torch.nn``; here each
is a :class:`~convnet_approximater_tpu.nn.module.Module` leaf with explicit
param/state trees and pure forward functions on NHWC tensors.  Initializers
match torch defaults (kaiming-uniform fan-in with a = sqrt(5), uniform bias
bound 1/sqrt(fan_in)) so randomly-initialised models are statistically
comparable to the reference's.
"""

from __future__ import annotations

import math
import jax
import jax.numpy as jnp

from convnet_approximater_tpu.ops import conv as ops
from convnet_approximater_tpu.utils.general import to_2tuple

from .module import Ctx, Module


def _kaiming_uniform(key, shape, fan_in, dtype=jnp.float32):
    # torch's default conv/linear weight init: kaiming_uniform(a=sqrt(5))
    gain = math.sqrt(2.0 / (1 + 5.0))
    bound = gain * math.sqrt(3.0 / fan_in)
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def _bias_uniform(key, shape, fan_in, dtype=jnp.float32):
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


class Conv2d(Module):
    """NHWC conv with HWIO kernel ``(kh, kw, in/groups, out)``.

    Mirrors ``torch.nn.Conv2d`` semantics (reference models use it directly,
    e.g. ``/root/reference/src/approx/models/alexnet.py:12-24``); it is the
    ``src_type`` of the scheme-1 approximater and is registered in the LAYER
    registry as ``SimpleConv`` (reference ``layers/simple_conv.py:7-47``).
    """

    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        kernel_size,
        stride=1,
        padding=0,
        dilation=1,
        groups: int = 1,
        bias: bool = True,
        strip_matmul: bool = False,
        pw_matmul: bool = False,
    ):
        super().__init__()
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = to_2tuple(kernel_size)
        self.stride = to_2tuple(stride)
        self.padding = to_2tuple(padding)
        self.dilation = to_2tuple(dilation)
        self.groups = groups
        self.use_bias = bias
        # opt this conv into the banded-Toeplitz MXU lowering when it is a
        # depthwise strip (set by CascadeConv for its k>=7 strips — measured
        # whole-model win on TPU; see ops/conv.py docstring)
        self.strip_matmul = strip_matmul
        # opt this conv into the flattened-matmul 1x1 lowering on small
        # spatial maps (set by deploy.enable_pw_matmul on serving surfaces —
        # measured whole-model win on TPU; see ops/conv.py)
        self.pw_matmul = pw_matmul
        # transient deploy-time flag: tap this conv's input absmax during a
        # quantization calibration pass (deploy.quantize_int8)
        self._calib = False
        self._capture_in = False  # full-input tap (deploy.prune_chains refit)
        assert in_channels % groups == 0 and out_channels % groups == 0

    def init_params(self, rng):
        kh, kw = self.kernel_size
        cin_g = self.in_channels // self.groups
        fan_in = cin_g * kh * kw
        k1, k2 = jax.random.split(rng)
        params = {"weight": _kaiming_uniform(k1, (kh, kw, cin_g, self.out_channels), fan_in)}
        if self.use_bias:
            params["bias"] = _bias_uniform(k2, (self.out_channels,), fan_in)
        return params

    def __call__(self, params, x, ctx: Ctx):
        if self._calib:
            ctx.tap("in_absmax", jnp.max(jnp.abs(x.astype(jnp.float32))))
        if getattr(self, "_capture_in", False):
            ctx.tap("in", x)
        on_tpu = jax.default_backend() in ("tpu", "axon")
        sm = self.strip_matmul and not ctx.training and on_tpu
        pw = self.pw_matmul and not ctx.training and on_tpu
        return ops.conv2d(
            x,
            params["weight"],
            params.get("bias"),
            stride=self.stride,
            padding=self.padding,
            groups=self.groups,
            dilation=self.dilation,
            strip_matmul=sm,
            pw_matmul=pw,
        )


class Linear(Module):
    """Dense layer; weight ``(in, out)`` so forward is ``x @ W + b``."""

    def __init__(self, in_features: int, out_features: int, bias: bool = True):
        super().__init__()
        self.in_features = in_features
        self.out_features = out_features
        self.use_bias = bias
        self._calib = False  # int8 PTQ calibration tap (deploy.quantize_int8)
        self._capture_in = False  # full-input tap (deploy.prune_chains refit)

    def init_params(self, rng):
        k1, k2 = jax.random.split(rng)
        params = {"weight": _kaiming_uniform(k1, (self.in_features, self.out_features), self.in_features)}
        if self.use_bias:
            params["bias"] = _bias_uniform(k2, (self.out_features,), self.in_features)
        return params

    def __call__(self, params, x, ctx: Ctx):
        if self._calib:
            ctx.tap("in_absmax", jnp.max(jnp.abs(x.astype(jnp.float32))))
        if getattr(self, "_capture_in", False):
            ctx.tap("in", x)
        y = x @ params["weight"]
        if self.use_bias:
            y = y + params["bias"]
        return y


class BatchNorm2d(Module):
    """BatchNorm over (B, H, W) of NHWC tensors with running stats.

    Running mean/var live in the *state* collection, updated functionally via
    ``ctx.put_state``.  Under ``jit`` over a sharded global batch the reduction
    is a global mean, so multi-device runs get synchronized-BN semantics for
    free — replacing the reference's ``distribute_bn`` NCCL machinery
    (``/root/reference/src/approx/utils/distributed.py:16-26``).
    """

    def __init__(self, num_features: int, eps: float = 1e-5, momentum: float = 0.1):
        super().__init__()
        self.num_features = num_features
        self.eps = eps
        self.momentum = momentum

    def init_params(self, rng):
        return {
            "scale": jnp.ones((self.num_features,)),
            "bias": jnp.zeros((self.num_features,)),
        }

    def init_own_state(self):
        return {
            "mean": jnp.zeros((self.num_features,)),
            "var": jnp.ones((self.num_features,)),
        }

    def __call__(self, params, x, ctx: Ctx):
        state = ctx.get_state()
        if ctx.training:
            xf = x.astype(jnp.float32)  # batch stats always in f32
            mean = jnp.mean(xf, axis=(0, 1, 2))
            var = jnp.var(xf, axis=(0, 1, 2))
            n = x.shape[0] * x.shape[1] * x.shape[2]
            # torch tracks unbiased var in running stats
            unbiased = var * (n / max(n - 1, 1))
            m = self.momentum
            ctx.put_state(
                {
                    "mean": (1 - m) * state["mean"] + m * mean,
                    "var": (1 - m) * state["var"] + m * unbiased,
                }
            )
        else:
            mean, var = state["mean"], state["var"]
        inv = jax.lax.rsqrt(var + self.eps)
        # normalize in f32 (stats/params are f32) but keep the activation
        # dtype flowing — bf16 inference stays bf16 end-to-end
        y = (x - mean) * inv * params["scale"] + params["bias"]
        return y.astype(x.dtype)


class LayerNorm(Module):
    """LayerNorm over the trailing (channel) axis."""

    def __init__(self, num_features: int, eps: float = 1e-5):
        super().__init__()
        self.num_features = num_features
        self.eps = eps

    def init_params(self, rng):
        return {
            "scale": jnp.ones((self.num_features,)),
            "bias": jnp.zeros((self.num_features,)),
        }

    def __call__(self, params, x, ctx: Ctx):
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps) * params["scale"] + params["bias"]
        return y.astype(x.dtype)


class GroupNorm(Module):
    """GroupNorm over NHWC tensors (torch semantics: normalize each sample's
    (H, W, C/G) group; affine per channel)."""

    def __init__(self, num_groups: int, num_channels: int, eps: float = 1e-5):
        super().__init__()
        assert num_channels % num_groups == 0
        self.num_groups = num_groups
        self.num_channels = num_channels
        self.eps = eps

    def init_params(self, rng):
        return {
            "scale": jnp.ones((self.num_channels,)),
            "bias": jnp.zeros((self.num_channels,)),
        }

    def __call__(self, params, x, ctx: Ctx):
        B, H, W, C = x.shape
        g = self.num_groups
        xf = x.astype(jnp.float32).reshape(B, H, W, g, C // g)
        mean = jnp.mean(xf, axis=(1, 2, 4), keepdims=True)
        var = jnp.var(xf, axis=(1, 2, 4), keepdims=True)
        y = ((xf - mean) * jax.lax.rsqrt(var + self.eps)).reshape(B, H, W, C)
        y = y * params["scale"] + params["bias"]
        return y.astype(x.dtype)


class ReLU(Module):
    def __call__(self, params, x, ctx: Ctx):
        return jax.nn.relu(x)


class GELU(Module):
    """GELU with selectable form.

    torch defaults to the exact erf form; on the TPU VPU erf costs ~40% of a
    whole MSCAN-t forward (measured: 10.0 -> 14.8 ms/fwd), while the tanh
    approximation's output drift is ~1e-3 — negligible for accuracy.  Default
    is therefore the fast tanh form; pass ``approximate=False`` (or set
    ``CAT_EXACT_GELU=1``) for bit-level parity runs against torch checkpoints.
    """

    def __init__(self, approximate: bool = True):
        super().__init__()
        self.approximate = approximate

    def __call__(self, params, x, ctx: Ctx):
        import os

        exact = (not self.approximate) or os.environ.get("CAT_EXACT_GELU")
        if os.environ.get("CAT_FAST_GELU"):  # explicit opt-out wins
            exact = False
        return jax.nn.gelu(x, approximate=not exact)


class MaxPool2d(Module):
    def __init__(self, kernel_size, stride=None, padding=0):
        super().__init__()
        self.kernel_size = kernel_size
        self.stride = stride
        self.padding = padding

    def __call__(self, params, x, ctx: Ctx):
        return ops.max_pool2d(x, self.kernel_size, self.stride, self.padding)


class AdaptiveAvgPool2d(Module):
    def __init__(self, output_size):
        super().__init__()
        self.output_size = output_size

    def __call__(self, params, x, ctx: Ctx):
        return ops.adaptive_avg_pool2d(x, self.output_size)


class Dropout(Module):
    def __init__(self, p: float = 0.5):
        super().__init__()
        self.p = p

    def __call__(self, params, x, ctx: Ctx):
        if not ctx.training or self.p == 0.0:
            return x
        keep = 1.0 - self.p
        mask = jax.random.bernoulli(ctx.rng(), keep, x.shape)
        return jnp.where(mask, x / keep, 0.0)


class Flatten(Module):
    """Flatten all dims after batch."""

    def __call__(self, params, x, ctx: Ctx):
        return x.reshape(x.shape[0], -1)
