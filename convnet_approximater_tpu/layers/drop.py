"""Stochastic depth (reference: ``src/approx/layers/drop.py``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from convnet_approximater_tpu.nn import Ctx, Module


def drop_path(x, drop_prob, ctx: Ctx, scale_by_keep: bool = True):
    """Drop entire residual paths per sample.

    ``drop_prob`` may be a traced scalar (the scan-over-blocks training path
    threads per-block rates through the ``lax.scan`` body); all math below is
    trace-safe."""
    if not ctx.training:
        return x
    if isinstance(drop_prob, float) and drop_prob == 0.0:
        return x
    keep_prob = 1.0 - drop_prob
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(ctx.rng(), keep_prob, shape).astype(x.dtype)
    if scale_by_keep:
        kp = jnp.asarray(keep_prob, x.dtype)
        mask = jnp.where(kp > 0, mask / jnp.maximum(kp, jnp.asarray(1e-8, x.dtype)), mask)
    return x * mask


class DropPath(Module):
    def __init__(self, drop_prob: float = 0.0, scale_by_keep: bool = True):
        super().__init__()
        self.drop_prob = drop_prob
        self.scale_by_keep = scale_by_keep

    def __call__(self, params, x, ctx: Ctx):
        # the scan-over-blocks path overrides the (per-block, hence
        # structure-breaking) rate with a traced scalar carried in the ctx
        rate = getattr(ctx, "drop_path_rate", None)
        if rate is None:
            rate = self.drop_prob
        return drop_path(x, rate, ctx, self.scale_by_keep)
