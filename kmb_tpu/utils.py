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
    cost of one tiny dispatch + transfer per leaf (~ms).  All timed
    benchmark regions must end with this.
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
