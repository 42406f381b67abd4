"""Mixup / CutMix batch augmentation (timm absorption, SURVEY §2.9).

The reference CE trainer instantiated timm's ``Mixup``/``FastCollateMixup``
on the host collate path (``/root/reference/src/approx/classification/
train.py:13``); the TPU-native form is a pure-jnp transform applied INSIDE
the jitted train step — the mixing rides the same XLA program as the
forward (no host round-trip, shards with the batch under the mesh), and the
randomness threads through the step rng like dropout does.

Semantics follow timm: one Beta(alpha, alpha) lambda per batch, a batch
permutation partner, optional CutMix (rectangular patch paste whose target
lambda is corrected to the *actual* pasted area), and a switch probability
choosing between the two modes per step.  Targets must already be dense
(one-hot / smoothed) — mixing is linear, so label smoothing composes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mixup_batch(rng, images, targets, lam):
    """Plain mixup: convex-combine each sample with its permutation partner.

    ``lam=1`` is exactly the identity (parity with the un-augmented step).
    """
    perm = jax.random.permutation(rng, images.shape[0])
    lam_i = jnp.asarray(lam, images.dtype)
    images = lam_i * images + (1.0 - lam_i) * images[perm]
    lam_t = jnp.asarray(lam, targets.dtype)
    targets = lam_t * targets + (1.0 - lam_t) * targets[perm]
    return images, targets


def cutmix_batch(rng, images, targets, lam):
    """CutMix: paste a random box from the partner image; the target weight
    is the EXACT kept-area fraction (timm corrects lam the same way), so the
    label always matches the pixels even when the box clips the border.

    NHWC; box center uniform, side ratio ``sqrt(1-lam)``.
    """
    k_perm, k_cy, k_cx = jax.random.split(rng, 3)
    b, h, w, _ = images.shape
    perm = jax.random.permutation(k_perm, b)
    cut_rat = jnp.sqrt(jnp.maximum(0.0, 1.0 - lam))
    cut_h = jnp.round(h * cut_rat).astype(jnp.int32)
    cut_w = jnp.round(w * cut_rat).astype(jnp.int32)
    cy = jax.random.randint(k_cy, (), 0, h)
    cx = jax.random.randint(k_cx, (), 0, w)
    y0 = jnp.clip(cy - cut_h // 2, 0, h)
    y1 = jnp.clip(cy + cut_h // 2, 0, h)
    x0 = jnp.clip(cx - cut_w // 2, 0, w)
    x1 = jnp.clip(cx + cut_w // 2, 0, w)
    rows = jnp.arange(h)[:, None]
    cols = jnp.arange(w)[None, :]
    in_box = ((rows >= y0) & (rows < y1) & (cols >= x0) & (cols < x1))
    images = jnp.where(in_box[None, :, :, None], images[perm], images)
    lam_actual = (1.0 - ((y1 - y0) * (x1 - x0)) / (h * w)).astype(targets.dtype)
    targets = lam_actual * targets + (1.0 - lam_actual) * targets[perm]
    return images, targets


def mixup_cutmix(rng, images, targets, mixup_alpha: float = 0.0,
                 cutmix_alpha: float = 0.0, switch_prob: float = 0.5):
    """Per-step dispatcher (timm ``Mixup._params_per_batch`` semantics):
    draws lambda from Beta(alpha, alpha) of the active mode; when both modes
    are on, a Bernoulli(switch_prob) picks CutMix vs mixup each step.  Alphas
    are static config — with both zero, call sites should skip entirely (the
    transform is not traced at all).
    """
    k_mode, k_lam, k_apply = jax.random.split(rng, 3)
    if mixup_alpha > 0 and cutmix_alpha > 0:
        use_cutmix = jax.random.bernoulli(k_mode, switch_prob)
        lam_mix = jax.random.beta(k_lam, mixup_alpha, mixup_alpha)
        lam_cut = jax.random.beta(k_lam, cutmix_alpha, cutmix_alpha)
        return jax.lax.cond(
            use_cutmix,
            lambda: cutmix_batch(k_apply, images, targets, lam_cut),
            lambda: mixup_batch(k_apply, images, targets, lam_mix),
        )
    if cutmix_alpha > 0:
        lam = jax.random.beta(k_lam, cutmix_alpha, cutmix_alpha)
        return cutmix_batch(k_apply, images, targets, lam)
    if mixup_alpha > 0:
        lam = jax.random.beta(k_lam, mixup_alpha, mixup_alpha)
        return mixup_batch(k_apply, images, targets, lam)
    return images, targets
