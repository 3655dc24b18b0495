"""Kernel function zoo (JAX side).

Semantics match the reference implementation exactly
(/root/reference/kernel_matrix_benchmarks/algorithms/bruteforce.py:8-22 and
datasets.py:35-48):

- "gaussian":              k(x, y) = exp(-|x - y|^2)
- "absolute-exponential":  k(x, y) = exp(-|x - y|)
- "inverse-distance":      k(x, y) = 1 / |x - y|, with k = 0 on the diagonal
                           (singular BEM-style kernel; the reference zeroes
                           the main diagonal post-hoc, which assumes
                           source == target points).
- "exponential":           k(x, y) = exp(<x, y>)  (attention kernel;
                           described in reference datasets.py:45-48 and
                           README.md:53-59, used with normalize_rows=True).

Each kernel is described by a `KernelSpec`:

- `on`: whether the kernel is a function of the squared distance ("sqdist")
  or of the dot product ("dot").  This decides which bilinear form the tiled
  engines compute on the MXU.
- `fn`: pointwise map from the bilinear form to kernel values (VPU).
- `log_fn`: for exponential-family kernels (k = exp(l)), the "logit" map.
  This enables flash-style online-softmax accumulation for the
  row-normalized (attention) path.  `None` for non-exp-family kernels
  (inverse-distance), which fall back to direct sum normalization.
- `zero_diagonal`: whether k(x, x) must be zeroed on the matrix diagonal
  (only "inverse-distance").
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class KernelSpec:
    name: str
    on: str  # "sqdist" | "dot"
    fn: Callable[[jnp.ndarray], jnp.ndarray]
    log_fn: Optional[Callable[[jnp.ndarray], jnp.ndarray]]
    zero_diagonal: bool = False


def _gaussian(sqd):
    return jnp.exp(-sqd)


def _gaussian_log(sqd):
    return -sqd


def _abs_exp(sqd):
    return jnp.exp(-jnp.sqrt(jnp.maximum(sqd, 0.0)))


def _abs_exp_log(sqd):
    return -jnp.sqrt(jnp.maximum(sqd, 0.0))


def _inverse_distance(sqd):
    # rsqrt of the clamped squared distance.  1/sqrt(0) = inf; the engines
    # are responsible for masking the diagonal (zero_diagonal=True) exactly
    # like reference bruteforce.py:8-15 does post-hoc.
    return jax.lax.rsqrt(jnp.maximum(sqd, 0.0))


def _exponential(dot):
    return jnp.exp(dot)


def _exponential_log(dot):
    return dot


KERNELS = {
    "gaussian": KernelSpec(
        name="gaussian", on="sqdist", fn=_gaussian, log_fn=_gaussian_log
    ),
    "absolute-exponential": KernelSpec(
        name="absolute-exponential", on="sqdist", fn=_abs_exp, log_fn=_abs_exp_log
    ),
    "inverse-distance": KernelSpec(
        name="inverse-distance",
        on="sqdist",
        fn=_inverse_distance,
        log_fn=None,
        zero_diagonal=True,
    ),
    "exponential": KernelSpec(
        name="exponential", on="dot", fn=_exponential, log_fn=_exponential_log
    ),
}


def get_kernel(name: str) -> KernelSpec:
    if name not in KERNELS:
        raise NotImplementedError(
            f"Kernel {name!r} is not supported; choose from {sorted(KERNELS)}."
        )
    return KERNELS[name]
