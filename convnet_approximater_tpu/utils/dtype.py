"""Mixed-precision helpers: cast the floating leaves of a param/state tree
(bf16 inference is the idiomatic TPU serving mode; norm layers keep their
statistics in f32 and return the activation dtype)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cast_floating(tree, dtype=jnp.bfloat16):
    """Cast all floating-point leaves of a pytree to ``dtype``."""

    def cast(leaf):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            return leaf.astype(dtype)
        return leaf

    return jax.tree_util.tree_map(cast, tree)
