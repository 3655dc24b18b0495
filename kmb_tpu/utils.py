"""Small shared utilities."""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def hard_fence(tree):
    """Force completion of every array in `tree` and return it.

    `jax.block_until_ready` alone is NOT a reliable fence on remote/proxy
    backends (e.g. tunneled TPU devices), where the client-side future can
    resolve before the device finishes executing.  Reading back a value
    that data-depends on each output buffer forces true completion, at the
    cost of one tiny dispatch + transfer per leaf.

    Measured bound (tunneled v5e chip, 2026-08): 24-27 ms per call,
    independent of array size from (1024,1) to (2^20, 8) — the cost is
    tunnel round-trips, not the reduction.  This is the timing floor of
    every benchmarked phase; it biases only sub-100 ms configs (<3% on
    the smallest shipped config's 0.78 s query).  On a directly attached
    chip the same call is sub-millisecond.
    """
    leaves = [leaf for leaf in jax.tree.leaves(tree)
              if hasattr(leaf, "dtype")]
    jax.block_until_ready(leaves)
    for leaf in leaves:
        if leaf.size:
            # A global reduction depends on every element (and stays legal
            # for sharded arrays, where slicing would need an out_sharding).
            np.asarray(jax.device_get(jnp.max(jnp.abs(leaf))))
    return tree
