"""Segmentation losses (TPU-native extension — the reference's
``src/approx/segmentation/`` is empty; this completes the family its
msca-rep experiments targeted).

Per-pixel cross-entropy with the mmseg conventions the SegNeXt paper
trained under: logits at 1/8 resolution are bilinearly upsampled to the
label resolution inside the loss ("resize-in-loss"), and ``ignore_index``
pixels (the 255 border/void label in ADE20K/Cityscapes) contribute nothing
to loss or gradient.  Everything is static-shaped: the ignore mask is a
``where``-weighted mean, not a gather.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .ham_head import upsample_logits


def seg_cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray,
                      ignore_index: int = 255,
                      class_weights=None) -> jnp.ndarray:
    """Mean per-pixel CE.  ``logits`` (B, h, w, K); ``labels`` (B, H, W) int.

    When (h, w) != (H, W) the logits are upsampled to the labels (mmseg
    resize-in-loss).  ``class_weights`` (K,) rescales per-class pixel
    contributions (rare-class boosting).
    """
    if tuple(logits.shape[1:3]) != tuple(labels.shape[1:3]):
        logits = upsample_logits(logits, labels.shape[1:3])
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    valid = labels != ignore_index
    safe = jnp.where(valid, labels, 0)
    ll = jnp.take_along_axis(logp, safe[..., None].astype(jnp.int32),
                             axis=-1)[..., 0]
    w = valid.astype(jnp.float32)
    if class_weights is not None:
        w = w * jnp.asarray(class_weights, jnp.float32)[safe]
    return -(jnp.sum(ll * w) / jnp.maximum(jnp.sum(w), 1.0))
