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


# ---------------------------------------------------------------------------
# Quantization-aware training (fake-quant with straight-through estimator)
# ---------------------------------------------------------------------------
#
# PTQ (above) calibrates scales on a frozen model; QAT instead *trains the
# float weights under the int8 grid* so the network learns to absorb the
# rounding error.  The training-form modules below keep the EXACT dense
# param structure (``weight`` + optional ``bias``) so every existing trainer
# (L2Reconstruct, TrainHelper — the TPU rebuild of the reference's recovery
# protocol, /root/reference/src/approx/hooks/finetune.py:95-420) works
# unchanged; the activation-scale observer lives in the *state* collection
# like BN running stats.  ``deploy.prepare_qat`` swaps dense modules in,
# ``deploy.convert_qat_to_int8`` emits the serving int8 form using the
# learned observer scales (no calibration batches needed) — bit-identical
# quantization math to ``quantize_int8``'s output.


def fake_quant(x: jnp.ndarray, scale) -> jnp.ndarray:
    """Simulated int8 quantize-dequantize with a straight-through gradient.

    Forward: ``clip(round(x / scale), -127, 127) * scale`` (``scale``
    broadcasts, enabling per-channel weight grids).  Backward: identity
    inside the representable range, zero outside the clip boundary — the
    standard STE with clip-masking.  ``scale`` is stop-gradiented (scales
    come from absmax observers, not learned directly).
    """
    import jax.lax as lax

    s = lax.stop_gradient(
        jnp.maximum(jnp.asarray(scale, jnp.float32), 1e-12)).astype(x.dtype)
    r = x / s
    q = jnp.clip(jnp.round(r), -INT8_MAX, INT8_MAX) * s
    mask = (jnp.abs(r) <= INT8_MAX).astype(x.dtype)
    xm = x * mask
    return xm + lax.stop_gradient(q - xm)


def fake_quant_weight(w: jnp.ndarray, reduce_axes) -> jnp.ndarray:
    """Per-output-channel fake-quant of a weight on its live float values
    (same grid as :func:`quantize_weight_per_channel`, so the QAT forward
    sees exactly the weights the exported int8 module will run)."""
    absmax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=reduce_axes,
                     keepdims=True)
    return fake_quant(w, jnp.maximum(absmax, 1e-12) / INT8_MAX)


def _observe_absmax(ctx: Ctx, x: jnp.ndarray, momentum: float) -> jnp.ndarray:
    """EMA absmax observer in the module's state slot (warm-started on the
    first training batch, frozen thereafter at eval).  Returns the absmax
    to quantize the *current* forward with."""
    absmax = ctx.get_state().get("act_absmax", jnp.zeros((), jnp.float32))
    absmax = jnp.asarray(absmax, jnp.float32)
    if ctx.training:
        cur = jnp.max(jnp.abs(x.astype(jnp.float32)))
        absmax = jnp.where(absmax > 0, (1 - momentum) * absmax + momentum * cur,
                           cur)
        ctx.put_state({"act_absmax": absmax})
    return absmax


class QATConv2d(Conv2d):
    """Fake-quant training twin of :class:`QuantConv2d`.

    Identical param tree to the dense ``Conv2d`` it replaces (float
    ``weight``/``bias`` keep training normally); the forward quantize-
    dequantizes both operands onto the int8 grid with STE gradients, so the
    loss sees serving numerics while the optimizer sees smooth gradients.
    State: ``act_absmax`` EMA observer (the analog of PTQ calibration,
    learned online instead of from a frozen calib set).
    """

    def __init__(self, *args, qat_momentum: float = 0.1, **kwargs):
        super().__init__(*args, **kwargs)
        self.qat_momentum = qat_momentum

    @classmethod
    def from_conv(cls, conv: Conv2d, qat_momentum: float = 0.1) -> "QATConv2d":
        assert conv.groups == 1, "only dense convs quantize"
        return cls(conv.in_channels, conv.out_channels, conv.kernel_size,
                   stride=conv.stride, padding=conv.padding,
                   dilation=conv.dilation, bias=conv.use_bias,
                   qat_momentum=qat_momentum)

    def init_own_state(self):
        return {"act_absmax": jnp.zeros((), jnp.float32)}

    def __call__(self, params, x, ctx: Ctx):
        absmax = _observe_absmax(ctx, x, self.qat_momentum)
        x_fq = jnp.where(absmax > 0,
                         fake_quant(x, absmax / INT8_MAX), x)
        w_fq = fake_quant_weight(params["weight"], reduce_axes=(0, 1, 2))
        return conv_ops.conv2d(x_fq, w_fq, params.get("bias"),
                               stride=self.stride, padding=self.padding,
                               groups=1, dilation=self.dilation)


class QATLinear(Module):
    """Fake-quant training twin of :class:`QuantLinear` (dense ``Linear``
    param tree, per-out-feature weight grid, EMA input observer)."""

    def __init__(self, in_features: int, out_features: int, bias: bool = True,
                 qat_momentum: float = 0.1):
        super().__init__()
        self.in_features = in_features
        self.out_features = out_features
        self.use_bias = bias
        self.qat_momentum = qat_momentum

    @classmethod
    def from_linear(cls, lin, qat_momentum: float = 0.1) -> "QATLinear":
        return cls(lin.in_features, lin.out_features, bias=lin.use_bias,
                   qat_momentum=qat_momentum)

    def init_params(self, rng):
        from convnet_approximater_tpu.nn.layers import Linear

        return Linear(self.in_features, self.out_features,
                      bias=self.use_bias).init_params(rng)

    def init_own_state(self):
        return {"act_absmax": jnp.zeros((), jnp.float32)}

    def __call__(self, params, x, ctx: Ctx):
        absmax = _observe_absmax(ctx, x, self.qat_momentum)
        x_fq = jnp.where(absmax > 0,
                         fake_quant(x, absmax / INT8_MAX), x)
        w_fq = fake_quant_weight(params["weight"], reduce_axes=(0,))
        y = x_fq @ w_fq
        if self.use_bias:
            y = y + params["bias"]
        return y
