"""Light-Ham decode head for SegNeXt segmentation (TPU-native extension).

The reference intended but never materialized segmentation: its
``src/approx/segmentation/__init__.py`` is empty and ``models/segnext.py``
is fully commented out.  This implements the decode side so the msca-rep
pipeline covers the SegNeXt family end-to-end, re-derived from the SegNeXt
paper (arXiv 2209.08575) and HamNet (arXiv 2109.04553):

* multi-level features (backbone stages 2-4) are resized to 1/8 scale and
  concatenated, squeezed to ``ham_channels`` by a 1x1 conv;
* the **Hamburger** module models global context via matrix decomposition:
  the (nonneg) feature matrix ``X (C x N)`` is factorized as ``X ~= D @ R``
  by ``T`` multiplicative NMF updates, and the low-rank reconstruction
  replaces the attention map (linear in N, jit-friendly fixed iteration
  count);
* align conv + classifier produce logits at 1/8 input resolution
  (``upsample_logits`` bilinearly resizes to label resolution, the
  mmseg ``resize``-in-loss convention).

HamNet's one-step gradient trick is kept: the NMF iterations run under
``stop_gradient`` and only the final coefficient update is differentiated —
backprop through the full unrolled solver is unstable and 6x the memory.
The dictionary is initialized from a fixed PRNG key, so eval is
deterministic (the published implementation uses fresh ``torch.rand`` every
forward; any fixed draw is an equally valid NMF init).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

import convnet_approximater_tpu.nn as nn
from convnet_approximater_tpu.nn import Ctx, Module

def _nmf_key():
    """Fixed dictionary-init key (see module doc), created lazily so a bare
    ``import`` never materializes a device array on the default backend
    (the axon relay) before callers can force CPU.  Never cached: under jit
    the key is a tracer (caching one leaks it across traces); XLA constant-
    folds the recreation anyway."""
    return jax.random.PRNGKey(42)


def _gn_groups(channels: int, wanted: int = 32) -> int:
    """Largest divisor of ``channels`` not exceeding ``wanted`` (SegNeXt uses
    32 groups; small test/debug widths need a valid fallback)."""
    g = min(wanted, channels)
    while channels % g:
        g -= 1
    return g


def nmf2d(x: jnp.ndarray, rank: int, iters: int, eps: float = 1e-6) -> jnp.ndarray:
    """Low-rank NMF reconstruction of ``x`` (B, N, C) -> (B, N, C).

    Multiplicative-update NMF on the nonnegative part, iterations under
    ``stop_gradient`` + one differentiated coefficient update (HamNet)."""
    B, N, C = x.shape
    X = jnp.maximum(x.astype(jnp.float32), 0.0)  # (B, N, C)
    X = jnp.swapaxes(X, 1, 2)  # (B, C, N)
    D = jax.random.uniform(_nmf_key(), (1, C, rank), jnp.float32, 1e-3, 1.0)
    D = jnp.broadcast_to(D / (jnp.linalg.norm(D, axis=1, keepdims=True) + eps),
                         (B, C, rank))
    R = jnp.einsum("bcr,bcn->brn", D, X)
    R = jnp.maximum(R, eps)

    def mu_step(D, R):
        # R <- R * (D^T X) / (D^T D R);  D <- D * (X R^T) / (D R R^T)
        R = R * (jnp.einsum("bcr,bcn->brn", D, X)
                 / (jnp.einsum("bcr,bcs,bsn->brn", D, D, R) + eps))
        D = D * (jnp.einsum("bcn,brn->bcr", X, R)
                 / (jnp.einsum("bcs,bsn,brn->bcr", D, R, R) + eps))
        return D, R

    Ds, Rs = jax.lax.stop_gradient((D, R))
    for _ in range(iters):
        Ds, Rs = mu_step(Ds, Rs)
    D = jax.lax.stop_gradient(Ds)
    # one differentiated update of the coefficients against the live X
    R = Rs * (jnp.einsum("bcr,bcn->brn", D, X)
              / (jnp.einsum("bcr,bcs,bsn->brn", D, D, Rs) + eps))
    Y = jnp.einsum("bcr,brn->bcn", D, R)  # low-rank reconstruction
    return jnp.swapaxes(Y, 1, 2).astype(x.dtype)  # (B, N, C)


class Hamburger(Module):
    """ham_in (1x1) -> NMF context -> ham_out (1x1 + GroupNorm), residual."""

    def __init__(self, ham_channels: int, rank: int = 64, iters: int = 6,
                 gn_groups: int = 0):
        super().__init__()
        gn_groups = gn_groups or _gn_groups(ham_channels)
        self.rank = rank
        self.iters = iters
        self.ham_in = nn.Conv2d(ham_channels, ham_channels, 1, bias=False)
        self.ham_out = nn.Conv2d(ham_channels, ham_channels, 1, bias=False)
        self.norm = nn.GroupNorm(gn_groups, ham_channels)

    def __call__(self, params, x, ctx: Ctx):
        B, H, W, C = x.shape
        y = self.child("ham_in", params, x, ctx)
        y = nmf2d(y.reshape(B, H * W, C), self.rank, self.iters).reshape(
            B, H, W, C)
        y = self.child("ham_out", params, y, ctx)
        y = self.child("norm", params, y, ctx)
        return jax.nn.relu(x + y)


def resize_bilinear(x: jnp.ndarray, size) -> jnp.ndarray:
    """NHWC bilinear resize (half-pixel centers — torch
    ``align_corners=False`` convention)."""
    B, H, W, C = x.shape
    return jax.image.resize(x, (B, size[0], size[1], C), method="bilinear")


class LightHamHead(Module):
    """SegNeXt decode head: concat stages 2-4 at 1/8 -> squeeze ->
    Hamburger -> align -> classifier (logits at 1/8 input resolution)."""

    def __init__(self, in_channels, num_classes: int, ham_channels: int = 256,
                 align_channels: int = 0, rank: int = 64, iters: int = 6,
                 dropout: float = 0.1):
        super().__init__()
        align_channels = align_channels or ham_channels
        self.in_channels = tuple(in_channels)
        self.squeeze = nn.Conv2d(sum(self.in_channels), ham_channels, 1)
        self.hamburger = Hamburger(ham_channels, rank=rank, iters=iters)
        self.align = nn.Conv2d(ham_channels, align_channels, 1)
        self.align_norm = nn.GroupNorm(_gn_groups(align_channels), align_channels)
        self.drop = nn.Dropout(dropout)
        self.cls = nn.Conv2d(align_channels, num_classes, 1)

    def __call__(self, params, feats, ctx: Ctx):
        target = feats[0].shape[1:3]
        x = jnp.concatenate(
            [feats[0]] + [resize_bilinear(f, target) for f in feats[1:]],
            axis=-1)
        x = jax.nn.relu(self.child("squeeze", params, x, ctx))
        x = self.child("hamburger", params, x, ctx)
        x = jax.nn.relu(self.child("align_norm", params,
                                   self.child("align", params, x, ctx), ctx))
        x = self.child("drop", params, x, ctx)
        return self.child("cls", params, x, ctx)


def upsample_logits(logits: jnp.ndarray, size) -> jnp.ndarray:
    """Resize 1/8-scale logits to label resolution (mmseg convention)."""
    return resize_bilinear(logits, size)
