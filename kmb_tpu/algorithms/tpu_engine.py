"""The TPU engine: harness-facing wrappers around the Pallas/XLA ops.

These are the first-class TPU algorithms that plug into the benchmark
harness (the slot the reference reserves for external native libraries like
Htool, htool.py:15-165 — except here the native layer is Pallas/XLA):

- `TpuProduct`: streaming tiled kernel product / attention.  `fit` is a
  no-op — the streaming design has no precomputation, shifting all cost to
  `query` (and making the (build+query) Pareto point strictly better).
- `TpuSolverDirect`: dense factorization solver (fit = materialize K +
  factorize on the MXU; query = back-substitution).
- `TpuSolverCG`: matrix-free conjugate gradient on the streaming matvec;
  O(M) memory, the only option at M ~ 10^6.  Exposes `tol` / `max_iters`
  as query arguments and reports iteration counts via `get_additional`.

Timing contract: every `query()` ends with `hard_fence()` (a readback
that data-depends on the outputs) so the harness's wall-clock timer
measures real device work despite JAX's async dispatch — plain
`block_until_ready` is not a reliable fence on tunneled TPU backends
(SURVEY.md §5 "timing semantics under async dispatch").  Device
transfers and dtype casts happen in the untimed `prepare_*` hooks
(reference base.py:64-67 notes GPU transfer belongs exactly there).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from kmb_tpu.utils import hard_fence
from kmb_tpu.algorithms.base import BaseProduct, BaseSolver
from kmb_tpu.ops.kernels import KERNELS
from kmb_tpu.ops.product import kernel_matvec
from kmb_tpu.ops.solve import (
    SPD_KERNELS, apply_nystrom_precond, block_jacobi_preconditioner,
    cg_solve, dense_apply, dense_factor, ir_solve, nystrom_preconditioner,
)


def _device_bytes_in_use():
    """Live HBM bytes on device 0, or None if the backend can't report it."""
    try:
        stats = jax.local_devices()[0].memory_stats()
        return stats.get("bytes_in_use")
    except Exception:
        return None


class _TpuAlgorithm:
    """Shared helpers: device staging and HBM-aware memory accounting."""

    # Attributes that may pin device (HBM) buffers between experiments.
    # `done()` drops them all: in a serial in-process sweep (--local) a
    # finished algorithm object can otherwise keep gigabytes of HBM
    # alive while the next algorithm stages its data — the measured
    # RESOURCE_EXHAUSTED failure mode at M=2^20 (the runner keeps the
    # best-build algo object alive until the experiment ends,
    # runner.py:119-125).
    _DEVICE_ATTRS = (
        "x", "y", "b", "rhs", "res", "factor", "u", "inv_lam", "zx", "zy",
        "phi_x", "phi_y", "omega", "phase", "c", "gram", "op", "b_blocks",
        "_precond_fn", "_prepared",
    )

    def _check_kernel(self, kernel):
        if kernel not in KERNELS:
            raise NotImplementedError(
                f"{type(self).__name__} doesn't support kernel {kernel!r}.")

    def get_memory_usage(self):
        """HBM bytes (kB) when available — the TPU analog of RSS deltas."""
        device = _device_bytes_in_use()
        if device is not None:
            return device / 1024
        import psutil
        return psutil.Process().memory_info().rss / 1024

    def done(self):
        for attr in self._DEVICE_ATTRS:
            if hasattr(self, attr):
                setattr(self, attr, None)


class TpuProduct(_TpuAlgorithm, BaseProduct):
    """Streaming Pallas kernel product / attention on TPU.

    precision tiers (MXU passes over the bilinear form / accumulation):
    "bfloat16" (1 pass, ~2^-8), "float32x3" (hand-built 3-pass hi/lo
    split, ~2^-16), "float32" (6 passes, ~2^-24) — the reference's
    float16/32/64 sweep (algos.yaml:157-162) mapped to TPU hardware.
    """

    def __init__(self, *, kernel, dimension, normalize_rows=False,
                 precision="float32", block_n=None, block_m=None):
        super().__init__(kernel=kernel, dimension=dimension,
                         normalize_rows=normalize_rows, precision=precision)
        self._check_kernel(kernel)
        self.block_n = block_n
        self.block_m = block_m
        self.name = f"TpuProduct({precision})"

    def prepare_data(self, *, source_points, target_points, same_points=False,
                     density_estimation=False):
        # Untimed: host->device transfer at float32 (the compute dtype is
        # chosen inside the engine; float64 never touches the TPU).
        self.y = jax.device_put(np.asarray(source_points, dtype=np.float32))
        self.x = (self.y if same_points else jax.device_put(
            np.asarray(target_points, dtype=np.float32)))
        self.same_points = same_points
        self.density_estimation = density_estimation

    def fit(self):
        # No precomputation: the streaming engine never builds K.
        pass

    def prepare_query(self, *, source_signal):
        self.b = (None if self.density_estimation else jax.device_put(
            np.asarray(source_signal, dtype=np.float32)))

    def query(self):
        out = kernel_matvec(
            self.x, self.y, self.b,
            kernel_name=self.kernel,
            normalize_rows=self.normalize_rows,
            density_estimation=self.density_estimation,
            precision=self.precision,
            block_n=self.block_n,
            block_m=self.block_m,
        )
        self.res = hard_fence(out)

    def get_result(self):
        return np.ascontiguousarray(np.asarray(self.res), dtype=np.float64)


class TpuSolverDirect(_TpuAlgorithm, BaseSolver):
    """Dense MXU factorization solver (K fits in HBM)."""

    def __init__(self, *, kernel, dimension, normalize_rows=False,
                 precision="float32", method="lu", rcond=1e-6):
        super().__init__(kernel=kernel, dimension=dimension,
                         normalize_rows=normalize_rows, precision=precision)
        self._check_kernel(kernel)
        self.method = method
        self.rcond = float(rcond)
        self.name = f"TpuSolverDirect({precision}, {method})"

    def set_query_arguments(self, rcond=None):
        if rcond is not None:
            self.rcond = float(rcond)

    def prepare_data(self, *, source_points):
        self.y = jax.device_put(np.asarray(source_points, dtype=np.float32))

    def fit(self):
        # TIMED: materialize K on-device and factorize it on the MXU.
        self.factor = hard_fence(dense_factor(
            self.y, kernel_name=self.kernel, precision=self.precision,
            method=self.method))

    def prepare_query(self, *, target_signal):
        self.rhs = jax.device_put(np.asarray(target_signal, dtype=np.float32))

    def query(self):
        self.res = hard_fence(dense_apply(
            self.factor, self.rhs, method=self.method, rcond=self.rcond))

    def get_result(self):
        return np.ascontiguousarray(np.asarray(self.res), dtype=np.float64)


class TpuSolverCG(_TpuAlgorithm, BaseSolver):
    """Matrix-free conjugate gradient on the streaming Pallas matvec."""

    def __init__(self, *, kernel, dimension, normalize_rows=False,
                 precision="float32", tol=1e-6, max_iters=1000,
                 precond_rank=0, precond="nystrom", leaf=512,
                 refine_iters=0, inner_tol=1e-5,
                 block_n=None, block_m=None):
        super().__init__(kernel=kernel, dimension=dimension,
                         normalize_rows=normalize_rows, precision=precision)
        self._check_kernel(kernel)
        if precond not in ("nystrom", "jacobi"):
            raise ValueError(f"precond must be 'nystrom' or 'jacobi', "
                             f"not {precond!r}.")
        # precond='jacobi' supports both regimes with one spectral
        # factorization (ops/solve.py _block_abs_factors): SPD kernels
        # run PCG with block solves; the indefinite inverse-distance
        # kernel runs preconditioned MINRES with |K_b|^-1 blocks.
        # refine_iters > 0 switches the query to mixed-precision
        # iterative refinement (ops/solve.py ir_solve): float64 host
        # residuals around float32 TPU correction solves, reusing this
        # solver's preconditioner across all outer iterations.
        self.tol = tol
        self.max_iters = max_iters
        self.precond_rank = int(precond_rank)
        self.precond_type = precond
        self.leaf = int(leaf)
        self.refine_iters = int(refine_iters)
        self.inner_tol = float(inner_tol)
        self.block_n = block_n
        self.block_m = block_m
        self.iterations = 0
        self.residual = float("nan")
        self.outer_iterations = 0
        self._precond_fn = None
        self._param_tag = (f"leaf={leaf}" if precond == "jacobi"
                          else f"rank={precond_rank}")
        if self.refine_iters > 0:
            self._param_tag += f", ir={self.refine_iters}"
        self.name = (f"TpuSolverCG({precision}, tol={tol}, "
                     f"{self._param_tag})")

    def prepare_data(self, *, source_points):
        self.y = jax.device_put(np.asarray(source_points, dtype=np.float32))

    def _matvec(self, v):
        return kernel_matvec(
            self.y, self.y, v, kernel_name=self.kernel,
            precision=self.precision, block_n=self.block_n,
            block_m=self.block_m)

    def _iterated_op(self, v):
        """The SPD operator CG actually iterates on (K, or K^2 when K is
        indefinite — see ops/solve.cg_solve)."""
        if self.kernel in SPD_KERNELS:
            return self._matvec(v)
        return self._matvec(self._matvec(v))

    def fit(self):
        # TIMED: build the preconditioner.  Nystrom: rank streaming
        # matvecs fused into one engine call (rank=0 skips it).
        # Block-Jacobi: batched Cholesky of the (leaf, leaf) diagonal
        # kernel blocks over the BLR balanced-bisection clustering.
        if self.precond_type == "jacobi":
            self._precond_fn = block_jacobi_preconditioner(
                np.asarray(self.y), kernel_name=self.kernel,
                leaf=min(self.leaf, self.y.shape[0]))
            hard_fence(self._precond_fn.args[0])
        elif self.precond_rank > 0:
            rank = min(self.precond_rank, self.y.shape[0])
            u, lam = hard_fence(nystrom_preconditioner(
                self._iterated_op, self.y.shape[0], rank))
            # Built ONCE: _pcg jit-caches on the precond callable, so the
            # same partial object must be reused across query runs.
            self._precond_fn = functools.partial(
                apply_nystrom_precond, u, lam)
        else:
            self._precond_fn = None

    def set_query_arguments(self, tol=None, max_iters=None,
                            refine_iters=None, inner_tol=None):
        if tol is not None:
            self.tol = tol
        if max_iters is not None:
            self.max_iters = max_iters
        if refine_iters is not None:
            self.refine_iters = int(refine_iters)
        if inner_tol is not None:
            self.inner_tol = float(inner_tol)
        self.name = (f"TpuSolverCG({self.precision}, tol={self.tol}, "
                     f"{self._param_tag})")

    def prepare_query(self, *, target_signal):
        self.rhs = jax.device_put(np.asarray(target_signal, dtype=np.float32))
        # Kept at float64 on the host for the iterative-refinement outer
        # residual (never touches the TPU).
        self.rhs64 = np.ascontiguousarray(target_signal, dtype=np.float64)

    def query(self):
        # Routing for the indefinite kernel: the block-abs 'jacobi'
        # preconditioner is an SPD M⁻¹ of K itself -> preconditioned
        # MINRES; the Nyström factors precondition K² -> normal
        # equations (cg_solve's "auto").
        method = ("minres" if self.precond_type == "jacobi" else "auto")
        if self.refine_iters > 0:
            b64, info = ir_solve(
                self.y, self.rhs64,
                kernel_name=self.kernel,
                precision=self.precision,
                tol=float(self.tol),
                max_iters=int(self.max_iters),
                inner_tol=self.inner_tol,
                refine_iters=self.refine_iters,
                matvec=self._matvec,
                precond=self._precond_fn,
                indefinite_method=method,
            )
            self.res = b64  # host float64: already synchronous
            self.iterations = int(info["inner_iterations"])
            self.outer_iterations = int(info["outer_iterations"])
            self.residual = float(info["relative_residual"])
            return
        b, iters, residual = cg_solve(
            self.y, self.rhs,
            kernel_name=self.kernel,
            precision=self.precision,
            tol=float(self.tol),
            max_iters=int(self.max_iters),
            matvec=self._matvec,
            precond=self._precond_fn,
            indefinite_method=method,
        )
        self.res = hard_fence(b)
        self.iterations = int(iters)
        self.outer_iterations = 0
        self.residual = float(residual)

    def get_additional(self):
        extra = {"cg_iterations": self.iterations,
                 "cg_relative_residual": self.residual}
        if self.outer_iterations:
            extra["ir_outer_iterations"] = self.outer_iterations
        return extra

    def get_result(self):
        return np.ascontiguousarray(np.asarray(self.res), dtype=np.float64)
