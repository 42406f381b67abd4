"""Stochastic depth (reference: ``src/approx/layers/drop.py``)."""

from __future__ import annotations

import jax

from convnet_approximater_tpu.nn import Ctx, Module


def drop_path(x, drop_prob: float, ctx: Ctx, scale_by_keep: bool = True):
    """Drop entire residual paths per sample."""
    if drop_prob == 0.0 or not ctx.training:
        return x
    keep_prob = 1.0 - drop_prob
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(ctx.rng(), keep_prob, shape).astype(x.dtype)
    if keep_prob > 0.0 and scale_by_keep:
        mask = mask / keep_prob
    return x * mask


class DropPath(Module):
    def __init__(self, drop_prob: float = 0.0, scale_by_keep: bool = True):
        super().__init__()
        self.drop_prob = drop_prob
        self.scale_by_keep = scale_by_keep

    def __call__(self, params, x, ctx: Ctx):
        return drop_path(x, self.drop_prob, ctx, self.scale_by_keep)
