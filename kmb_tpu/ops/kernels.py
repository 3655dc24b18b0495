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

Engine fast path (used by the tiled matvec engines only; dense consumers
keep the canonical `fn`/`log_fn`):

The TPU VPU evaluates `exp2` natively; `exp` costs an extra multiply per
element, and for exp-family kernels that multiply (by log2 e) can be folded
into the *points* before the bilinear form is ever computed: scaling both
point sets by sqrt(log2 e) scales squared distances and dot products by
log2 e, so the per-pair transcendental collapses to a bare `exp2`.
Similarly the sign of the form ("-|x-y|^2") is free inside the form
accumulation (fused negate-multiply-add / negated augmentation factors)
but would cost one VPU pass as a separate negation.  Each spec therefore
also carries:

- `point_scale`: engines multiply the (float32) points by this first.
- `form_sign`: engines produce `form_sign * point_scale^2 * true_form`.
- `scaled_fn`: kernel values from that signed, scaled form.
- `scaled_log2_fn`: BASE-2 logits from that form (flash accumulation runs
  entirely in base 2: `exp2` rescales, and the merge algebra in
  kmb_tpu.parallel.sharded matches).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp

LOG2E = math.log2(math.e)


@dataclasses.dataclass(frozen=True)
class KernelSpec:
    name: str
    on: str  # "sqdist" | "dot"
    fn: Callable[[jnp.ndarray], jnp.ndarray]
    log_fn: Optional[Callable[[jnp.ndarray], jnp.ndarray]]
    zero_diagonal: bool = False
    # Engine fast path (see module docstring); defaults = canonical form.
    point_scale: float = 1.0
    form_sign: float = 1.0
    scaled_fn: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None
    scaled_log2_fn: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None

    def __post_init__(self):
        if self.scaled_fn is None:
            object.__setattr__(self, "scaled_fn", self.fn)
        if self.scaled_log2_fn is None and self.log_fn is not None:
            log_fn = self.log_fn
            object.__setattr__(
                self, "scaled_log2_fn", lambda g: log_fn(g) * LOG2E)


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


def _neg_sqrt(g):
    return -jnp.sqrt(jnp.maximum(g, 0.0))


KERNELS = {
    # Engine form: g = -log2(e) * |x - y|^2  =>  k = 2^g.
    "gaussian": KernelSpec(
        name="gaussian", on="sqdist", fn=_gaussian, log_fn=_gaussian_log,
        point_scale=math.sqrt(LOG2E), form_sign=-1.0,
        scaled_fn=jnp.exp2, scaled_log2_fn=lambda g: g,
    ),
    # Engine form: g = (log2(e) * |x - y|)^2  =>  k = 2^(-sqrt(g)).
    "absolute-exponential": KernelSpec(
        name="absolute-exponential", on="sqdist", fn=_abs_exp,
        log_fn=_abs_exp_log,
        point_scale=LOG2E,
        scaled_fn=lambda g: jnp.exp2(_neg_sqrt(g)),
        scaled_log2_fn=_neg_sqrt,
    ),
    "inverse-distance": KernelSpec(
        name="inverse-distance",
        on="sqdist",
        fn=_inverse_distance,
        log_fn=None,
        zero_diagonal=True,
    ),
    # Engine form: g = log2(e) * <x, y>  =>  k = 2^g.
    "exponential": KernelSpec(
        name="exponential", on="dot", fn=_exponential,
        log_fn=_exponential_log,
        point_scale=math.sqrt(LOG2E),
        scaled_fn=jnp.exp2, scaled_log2_fn=lambda g: g,
    ),
}


def get_kernel(name: str) -> KernelSpec:
    if name not in KERNELS:
        raise NotImplementedError(
            f"Kernel {name!r} is not supported; choose from {sorted(KERNELS)}."
        )
    return KERNELS[name]
