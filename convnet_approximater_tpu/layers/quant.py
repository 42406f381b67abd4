"""int8 post-training quantization for serving (TPU-native extension).

No reference counterpart (the reference serves fp32 CUDA); this exists
because the v5e MXU runs int8 convolutions at ~1.4x the bf16 rate measured
end-to-end WITH the quantize/dequantize chain (in-jit probe, see
doc/perf-notes.md "int8 PTQ serving").  The scheme is standard conv-net PTQ:

* weights: symmetric per-output-channel int8 (scale = absmax / 127 over
  ``(kh, kw, cin)``), quantized once at deploy time;
* activations: symmetric per-tensor int8 with a STATIC scale calibrated
  from sample batches (``deploy.quantize_int8`` collects per-conv input
  absmax via ``Ctx.tap``);
* accumulation int32 on the MXU, dequantized per-channel in f32, bias
  added, cast back to the network dtype — every elementwise piece fuses
  into the conv's epilogue under XLA.

Inference-only: quantized modules refuse to run under ``training=True``
(PTQ is a serving rewrite, like ``deploy.fold_batchnorm``).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from convnet_approximater_tpu.nn import Ctx, Module
from convnet_approximater_tpu.nn.layers import Conv2d
from convnet_approximater_tpu.ops import conv as conv_ops

INT8_MAX = 127.0


def quantize_weight_per_channel(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """HWIO weight -> (int8 weight, f32 per-out-channel scale)."""
    w32 = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(w32), axis=(0, 1, 2))
    scale = jnp.maximum(absmax, 1e-12) / INT8_MAX
    w_q = jnp.clip(jnp.round(w32 / scale), -INT8_MAX, INT8_MAX).astype(jnp.int8)
    return w_q, scale


def quantize_activation(x: jnp.ndarray, scale) -> jnp.ndarray:
    """Symmetric per-tensor quantization with a static (calibrated) scale."""
    q = jnp.round(x.astype(jnp.float32) / scale)
    return jnp.clip(q, -INT8_MAX, INT8_MAX).astype(jnp.int8)


class QuantConv2d(Module):
    """Serving-form int8 conv produced by ``deploy.quantize_int8``.

    Params: ``weight_q`` (int8 HWIO), ``w_scale`` (f32 per-out-channel),
    ``act_scale`` (f32 scalar, calibrated input scale), optional ``bias``
    (f32).  Forward: quantize input -> int8 conv (int32 accumulate) ->
    per-channel dequant + bias -> cast back to the input dtype.
    """

    def __init__(self, in_channels: int, out_channels: int, kernel_size,
                 stride=1, padding=0, dilation=1, bias: bool = True):
        super().__init__()
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = kernel_size
        self.stride = stride
        self.padding = padding
        self.dilation = dilation
        self.use_bias = bias

    @classmethod
    def from_conv(cls, conv: Conv2d, conv_params: dict,
                  act_scale) -> Tuple["QuantConv2d", dict]:
        """Build (module, params) from a dense ``Conv2d`` and its params.

        Only ``groups == 1`` convs quantize (grouped/depthwise strips are
        VPU/band-matmul work where int8 buys nothing — they stay as-is).
        """
        assert conv.groups == 1, "only dense convs quantize"
        mod = cls(conv.in_channels, conv.out_channels, conv.kernel_size,
                  stride=conv.stride, padding=conv.padding,
                  dilation=conv.dilation, bias="bias" in conv_params)
        w_q, w_scale = quantize_weight_per_channel(conv_params["weight"])
        params = {
            "weight_q": w_q,
            "w_scale": w_scale,
            "act_scale": jnp.asarray(act_scale, jnp.float32).reshape(()),
        }
        if "bias" in conv_params:
            params["bias"] = conv_params["bias"].astype(jnp.float32)
        return mod, params

    def init_params(self, rng):  # pragma: no cover - deploy-built only
        raise NotImplementedError(
            "QuantConv2d is built from a trained Conv2d via "
            "deploy.quantize_int8, not initialized from scratch")

    def __call__(self, params, x, ctx: Ctx):
        if ctx.training:
            raise RuntimeError("QuantConv2d is inference-only (serving PTQ)")
        a_scale = params["act_scale"].astype(jnp.float32)
        x_q = quantize_activation(x, a_scale)
        y32 = conv_ops.conv2d_int8(x_q, params["weight_q"], stride=self.stride,
                                   padding=self.padding, dilation=self.dilation)
        scale = a_scale * params["w_scale"].astype(jnp.float32)
        y = y32.astype(jnp.float32) * scale
        if "bias" in params:
            y = y + params["bias"].astype(jnp.float32)
        return y.astype(x.dtype)


def quantize_linear_weight(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(in, out) weight -> (int8 weight, f32 per-out-feature scale)."""
    w32 = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(w32), axis=0)
    scale = jnp.maximum(absmax, 1e-12) / INT8_MAX
    w_q = jnp.clip(jnp.round(w32 / scale), -INT8_MAX, INT8_MAX).astype(jnp.int8)
    return w_q, scale


class QuantLinear(Module):
    """Serving-form int8 Linear (same scheme as :class:`QuantConv2d`):
    per-out-feature int8 weights, calibrated static per-tensor input scale,
    int32 MXU accumulation, fused dequant+bias epilogue.  Covers the
    fc-heavy families (VGG/AlexNet classifier stacks) and ConvNeXt's
    pwconv MLPs, where the Linears carry the MACs."""

    def __init__(self, in_features: int, out_features: int, bias: bool = True):
        super().__init__()
        self.in_features = in_features
        self.out_features = out_features
        self.use_bias = bias

    @classmethod
    def from_linear(cls, lin, lin_params: dict,
                    act_scale) -> Tuple["QuantLinear", dict]:
        mod = cls(lin.in_features, lin.out_features,
                  bias="bias" in lin_params)
        w_q, w_scale = quantize_linear_weight(lin_params["weight"])
        params = {
            "weight_q": w_q,
            "w_scale": w_scale,
            "act_scale": jnp.asarray(act_scale, jnp.float32).reshape(()),
        }
        if "bias" in lin_params:
            params["bias"] = lin_params["bias"].astype(jnp.float32)
        return mod, params

    def init_params(self, rng):  # pragma: no cover - deploy-built only
        raise NotImplementedError(
            "QuantLinear is built from a trained Linear via "
            "deploy.quantize_int8, not initialized from scratch")

    def __call__(self, params, x, ctx: Ctx):
        if ctx.training:
            raise RuntimeError("QuantLinear is inference-only (serving PTQ)")
        import jax.lax as lax

        a_scale = params["act_scale"].astype(jnp.float32)
        x_q = quantize_activation(x, a_scale)
        y32 = lax.dot_general(
            x_q, params["weight_q"],
            dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = y32.astype(jnp.float32) * (a_scale * params["w_scale"].astype(jnp.float32))
        if "bias" in params:
            y = y + params["bias"].astype(jnp.float32)
        return y.astype(x.dtype)
