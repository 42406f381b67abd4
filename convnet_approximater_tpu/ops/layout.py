"""Kernel layout conversions between TPU-native HWIO and torch-style OIHW.

The solver algebra in :mod:`convnet_approximater_tpu.core` is written in OIHW
(matching the reference's published equations for auditability); these
helpers convert at the parameter-tree boundary.
"""

from __future__ import annotations

import jax.numpy as jnp


def hwio_to_oihw(w):
    """(kh, kw, I, O) -> (O, I, kh, kw)."""
    return jnp.transpose(w, (3, 2, 0, 1))


def oihw_to_hwio(w):
    """(O, I, kh, kw) -> (kh, kw, I, O)."""
    return jnp.transpose(w, (2, 3, 1, 0))
