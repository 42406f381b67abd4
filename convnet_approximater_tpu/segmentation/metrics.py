"""Segmentation metrics: streaming confusion matrix -> mIoU / aAcc.

The device-side piece (:func:`confusion_matrix`) is one ``bincount`` over
``label * K + pred`` — static-shaped, jit/psum-friendly (under a sharded
batch the per-shard counts add, so a mesh eval just sums matrices).  The
host-side reduction (:func:`iou_from_confusion`) matches mmseg's
``mean_iou``: per-class IoU = tp / (tp + fp + fn), mIoU averages over
classes that appear (NaN-skipping), aAcc = trace / total.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def confusion_matrix(pred: jnp.ndarray, label: jnp.ndarray, num_classes: int,
                     ignore_index: int = 255) -> jnp.ndarray:
    """(K, K) float32 counts, rows = true class, cols = predicted class.

    ``pred``/``label`` are integer arrays of identical shape; pixels whose
    label equals ``ignore_index`` are dropped (weight 0 — static shapes).
    """
    valid = (label != ignore_index).reshape(-1)
    l = jnp.where(valid, label.reshape(-1), 0).astype(jnp.int32)
    p = jnp.clip(pred.reshape(-1).astype(jnp.int32), 0, num_classes - 1)
    idx = l * num_classes + p
    cm = jnp.bincount(idx, weights=valid.astype(jnp.float32),
                      length=num_classes * num_classes)
    return cm.reshape(num_classes, num_classes)


def iou_from_confusion(cm) -> dict:
    """Host-side reduction of an accumulated confusion matrix."""
    cm = np.asarray(cm, np.float64)
    tp = np.diag(cm)
    fp = cm.sum(axis=0) - tp
    fn = cm.sum(axis=1) - tp
    denom = tp + fp + fn
    with np.errstate(divide="ignore", invalid="ignore"):
        iou = np.where(denom > 0, tp / np.maximum(denom, 1e-12), np.nan)
        acc = np.where(cm.sum(axis=1) > 0,
                       tp / np.maximum(cm.sum(axis=1), 1e-12), np.nan)
    present = ~np.isnan(iou)
    total = cm.sum()
    return dict(
        iou=iou,
        miou=float(np.nanmean(iou)) if present.any() else 0.0,
        macc=float(np.nanmean(acc)) if present.any() else 0.0,
        aacc=float(tp.sum() / total) if total > 0 else 0.0,
    )
