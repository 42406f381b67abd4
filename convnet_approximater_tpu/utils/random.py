"""Seeding (reference: ``src/approx/utils/random.py`` seeds torch/numpy/random
with ``seed + rank``).  In JAX randomness is explicit: this returns a root
``jax.random`` key folded with the process index so each host draws distinct
streams, and also seeds numpy/python for host-side shuffling."""

from __future__ import annotations

import random as _py_random

import numpy as np


def random_seed(seed: int = 42, rank: int = 0):
    """Seed host RNGs and return a JAX PRNG key for device-side randomness."""
    import jax

    _py_random.seed(seed + rank)
    np.random.seed(seed + rank)
    key = jax.random.key(seed)
    if rank:
        key = jax.random.fold_in(key, rank)
    return key
