"""Approximate kernel products: the Htool slot, TPU-native.

The reference benchmarks exactly one approximate method — the external
Htool C++ H-matrix library (htool.py:15-165), whose knobs
(epsilon / maxblocksize / eta) trade accuracy for speed.  These wrappers
provide that role with MXU-shaped compression (see ops/lowrank.py and
ops/blr.py for the math):

- `BlrProduct(leaf=..., rank=..., eta=...)`: the direct H-matrix analog —
  cluster tree, eta-admissibility, dense near-field, low-rank far-field —
  re-shaped into equal-size blocks and batched MXU compression.

- `NystromProduct(rank=...)`: landmark low-rank factorization.  `fit`
  (TIMED, like Htool's build_HMatrix, htool.py:106-132) selects landmarks,
  factors W = K(L, L), and materializes the tall-skinny cross blocks
  K(x, L) / K(y, L).  `query` is two (tall, rank) matmuls.
- `RandomFeatureProduct(num_features=...)`: explicit feature maps (random
  Fourier features; positive Performer features for the attention
  kernel).  `fit` builds Φx / Φy; `query` is two matmuls.

Both support product + attention (row normalization and density estimation
via the ones-column trick, reference bruteforce.py:140-145) and report
their compression ratio via `get_additional`.  The singular
"inverse-distance" kernel is rejected — it is not low-rank-compressible by
these schemes (exact engines cover it).
"""

from __future__ import annotations

import numpy as np

import jax

from kmb_tpu.utils import hard_fence
from kmb_tpu.algorithms.base import BaseProduct, BaseSolver
from kmb_tpu.algorithms.tpu_engine import _TpuAlgorithm
from kmb_tpu.ops.blr import BLR_KERNELS, BlrOperator
from kmb_tpu.ops.lowrank import (
    LOWRANK_KERNELS, feature_apply, feature_apply_streamed, nystrom_apply,
    nystrom_core, nystrom_factor, nystrom_factors, nystrom_solver_apply,
    nystrom_solver_build, random_feature_map, random_feature_params,
    select_landmarks,
)


class _ApproxProduct(_TpuAlgorithm, BaseProduct):
    """Shared staging for the approximate product wrappers."""

    def _check_kernel(self, kernel):
        if kernel not in LOWRANK_KERNELS:
            raise NotImplementedError(
                f"{type(self).__name__} doesn't support kernel {kernel!r} "
                f"(supported: {LOWRANK_KERNELS}).")

    def prepare_data(self, *, source_points, target_points, same_points=False,
                     density_estimation=False):
        self.y = jax.device_put(np.asarray(source_points, dtype=np.float32))
        self.x = (self.y if same_points else jax.device_put(
            np.asarray(target_points, dtype=np.float32)))
        self.same_points = same_points
        self.density_estimation = density_estimation

    def prepare_query(self, *, source_signal):
        self.b = (None if self.density_estimation else jax.device_put(
            np.asarray(source_signal, dtype=np.float32)))

    def get_result(self):
        return np.ascontiguousarray(np.asarray(self.res), dtype=np.float64)


class BlrProduct(_ApproxProduct):
    """Block-low-rank kernel product — the H-matrix (Htool) slot.

    TPU-native re-design of Htool's cluster-tree + partialACA engine
    (reference htool.py:15-165): balanced-bisection clustering into
    equal-size leaves, Euclidean eta-admissibility, batched randomized
    compression of far-field tiles on the MXU, near-field tiles recomputed
    on the fly (see ops/blr.py).  Knobs mirror Htool's: `eta`
    (admissibility), `leaf` (maxblocksize), and either a fixed `rank`
    or Htool's adaptive `epsilon` (per-block rank from the sketch
    spectrum, reference htool.py:18-74, with `rank` as the cap).
    Unlike Nystrom/RFF, this supports the singular
    "inverse-distance" kernel — near-field (including the zeroed
    diagonal) stays exact.
    """

    def __init__(self, *, kernel, dimension, normalize_rows=False,
                 precision="float32", leaf=256, rank=16, eta=2.0,
                 epsilon=None, seed=0):
        super().__init__(kernel=kernel, dimension=dimension,
                         normalize_rows=normalize_rows, precision=precision)
        if kernel not in BLR_KERNELS:
            raise NotImplementedError(
                f"BlrProduct supports {BLR_KERNELS}, not {kernel!r}.")
        self.leaf = int(leaf)
        self.rank = int(rank)
        self.eta = float(eta)
        self.epsilon = None if epsilon is None else float(epsilon)
        self.seed = int(seed)
        if self.epsilon is None:
            self.name = f"BlrProduct(leaf={leaf}, rank={rank}, eta={eta})"
        else:
            self.name = (f"BlrProduct(leaf={leaf}, eps={epsilon}, "
                         f"eta={eta})")

    def _check_kernel(self, kernel):
        pass  # validated against BLR_KERNELS in __init__

    def prepare_data(self, *, source_points, target_points, same_points=False,
                     density_estimation=False):
        # Host-side copies: the cluster build runs in NumPy at fit time.
        self.y_np = np.ascontiguousarray(source_points, dtype=np.float32)
        self.x_np = (self.y_np if same_points else
                     np.ascontiguousarray(target_points, dtype=np.float32))
        self.same_points = same_points
        self.density_estimation = density_estimation

    def fit(self):
        # TIMED: cluster tree + admissibility (host) and batched far-field
        # compression (device) — the analog of Htool's build_clusters +
        # build_HMatrix (htool.py:106-132).
        self.op = BlrOperator(
            self.x_np, self.y_np, kernel_name=self.kernel, leaf=self.leaf,
            rank=self.rank, eta=self.eta, epsilon=self.epsilon,
            same_points=self.same_points, seed=self.seed)
        hard_fence(self.op.far_groups)

    def prepare_query(self, *, source_signal):
        m = self.y_np.shape[0]
        if self.density_estimation:
            signal = np.ones((m, 1), dtype=np.float32)
        else:
            signal = np.asarray(source_signal, dtype=np.float32)
            if self.normalize_rows:
                # Ones-column trick (reference bruteforce.py:140-145): the
                # denominator rides along as one extra signal column; pad
                # rows are zeroed inside block_signal.
                signal = np.concatenate(
                    [signal, np.ones((m, 1), np.float32)], axis=1)
        self.b_blocks = hard_fence(self.op.block_signal(signal))
        self.e = (0 if self.density_estimation
                  else np.asarray(source_signal).shape[1])

    def query(self):
        if self.density_estimation and self.normalize_rows:
            # K @ 1 / K @ 1 == 1 exactly (reference bruteforce.py:134-138).
            self.res = np.ones((self.op.n, 1), dtype=np.float32)
            return
        out = self.op.unblock(self.op.matvec_blocked(self.b_blocks))
        if self.normalize_rows:
            out = out[:, :self.e] / out[:, self.e:]
        self.res = hard_fence(out)

    def get_additional(self):
        import numpy as _np
        ranks = self.op.block_ranks
        return {"rank": self.rank,
                "near_pairs": int(self.op.plan.near_pairs.shape[0]),
                "near_sym_pairs": int(self.op.plan.near_sym_pairs.shape[0]),
                "far_pairs": int(self.op.plan.far_pairs.shape[0]),
                "symmetric": bool(self.op.plan.same_points),
                "mean_block_rank": float(_np.mean(ranks)) if ranks.size
                else 0.0,
                "compression": self.op.compression}


class NystromProduct(_ApproxProduct):
    """Landmark low-rank (Nyström) kernel product: K ≈ K(·,L) W⁺ K(L,·)."""

    def __init__(self, *, kernel, dimension, normalize_rows=False,
                 precision="float32", rank=256, rcond=1e-6, seed=0):
        super().__init__(kernel=kernel, dimension=dimension,
                         normalize_rows=normalize_rows, precision=precision)
        self._check_kernel(kernel)
        self.rank = int(rank)
        self.rcond = float(rcond)
        self.seed = int(seed)
        self.name = f"NystromProduct(rank={rank})"

    def fit(self):
        # TIMED compression build (the analog of Htool's H-matrix assembly).
        landmarks = select_landmarks(self.y, self.rank, seed=self.seed)
        self.u, self.inv_lam = nystrom_core(
            landmarks, self.kernel, rcond=self.rcond)
        if self.same_points:
            # K(x,L) == K(y,L): share the tall-skinny factor — halves the
            # build work and HBM (2 x (10^6, r) f32 is the footprint that
            # matters at north-star scale).
            self.zy = nystrom_factor(self.y, landmarks, self.kernel)
            self.zx = self.zy
        else:
            self.zx, self.zy = nystrom_factors(
                self.x, self.y, landmarks, self.kernel)
        hard_fence((self.u, self.inv_lam, self.zx, self.zy))

    def query(self):
        self.res = hard_fence(nystrom_apply(
            self.zx, self.zy, self.u, self.inv_lam, self.b,
            normalize_rows=self.normalize_rows,
            density_estimation=self.density_estimation))

    def get_additional(self):
        n, m = self.zx.shape[0], self.zy.shape[0]
        r = self.u.shape[0]
        return {"rank": r,
                "compression": float(n * m) / float((n + m + r) * r)}


class NystromSolver(_TpuAlgorithm, BaseSolver):
    """Approximate ridge solver: b ≈ (λI + K̂)⁻¹ a with Nyström K̂ = C Cᵀ.

    The compressed counterpart of TpuSolverDirect/TpuSolverCG: `fit`
    (TIMED) builds the rank-r Woodbury workspace in O(M·r·D + M·r² + r³);
    each solve is two (M, r) matmuls plus an (r, r) positive-definite
    solve — independent of how ill-conditioned the full K is.  Accuracy is
    floored by the rank truncation; `lam` (a query argument, like the
    reference solvers' rcond) trades truncation error against ridge bias.
    """

    def __init__(self, *, kernel, dimension, normalize_rows=False,
                 precision="float32", rank=512, lam=1e-4, rcond=1e-6,
                 seed=0):
        super().__init__(kernel=kernel, dimension=dimension,
                         normalize_rows=normalize_rows, precision=precision)
        if kernel not in LOWRANK_KERNELS:
            raise NotImplementedError(
                f"NystromSolver doesn't support kernel {kernel!r} "
                f"(supported: {LOWRANK_KERNELS}).")
        self.rank = int(rank)
        self.lam = float(lam)
        self.rcond = float(rcond)
        self.seed = int(seed)
        self.name = f"NystromSolver(rank={rank}, lam={lam})"

    def prepare_data(self, *, source_points):
        self.y = jax.device_put(np.asarray(source_points, dtype=np.float32))

    def fit(self):
        landmarks = select_landmarks(self.y, self.rank, seed=self.seed)
        self.c, self.gram = nystrom_solver_build(
            self.y, landmarks, self.kernel, rcond=self.rcond)
        hard_fence((self.c, self.gram))

    def set_query_arguments(self, lam=None):
        if lam is not None:
            self.lam = float(lam)
        self.name = f"NystromSolver(rank={self.rank}, lam={self.lam})"

    def prepare_query(self, *, target_signal):
        self.rhs = jax.device_put(np.asarray(target_signal, dtype=np.float32))

    def query(self):
        self.res = hard_fence(nystrom_solver_apply(
            self.c, self.gram, self.rhs, self.lam))

    def get_additional(self):
        m, r = self.c.shape
        return {"rank": r, "compression": float(m) / float(r)}

    def get_result(self):
        return np.ascontiguousarray(np.asarray(self.res), dtype=np.float64)


class BlrSolver(_TpuAlgorithm, BaseSolver):
    """H-matrix-accelerated Krylov solver: MINRES on the compressed
    BLR operator.

    The capability Htool's ecosystem markets but the reference never
    wires up (its Htool wrapper is product-only, htool.py:106-132):
    `fit` (TIMED) compresses K into BLR form — cluster tree,
    eta-admissibility, adaptive-rank far blocks (ops/blr.py) — and
    `query` runs MINRES whose matvec is the compressed
    `BlrOperator.matvec_device`, touching O(near tiles + Σ ranks·leaf)
    entries per iteration instead of M².  MINRES rather than CG because
    compression perturbs eigenvalues: K_blr is exactly symmetric (the
    mirror-group construction) but not certifiably definite even for
    SPD kernels.

    Accuracy regimes:
    - refine_iters == 0: the residual against the TRUE K floors at the
      compression error (~ epsilon · kappa).
    - refine_iters > 0: mixed-precision iterative refinement
      (ops/solve.py ir_solve) wraps the BLR inner solves in float64
      HOST residuals on the EXACT kernel — contracts past the
      compression floor while every inner iteration still rides the
      cheap compressed matvec.

    `get_additional` reports both the compressed-operator residual and
    the true-K residual (measured with one exact streaming-engine
    matvec), plus the compression ratio.
    """

    def __init__(self, *, kernel, dimension, normalize_rows=False,
                 precision="float32", leaf=256, rank=64, eta=2.0,
                 epsilon=None, tol=1e-5, max_iters=1000,
                 refine_iters=0, inner_tol=1e-4, seed=0):
        super().__init__(kernel=kernel, dimension=dimension,
                         normalize_rows=normalize_rows, precision=precision)
        if kernel not in BLR_KERNELS:
            raise NotImplementedError(
                f"BlrSolver doesn't support kernel {kernel!r} "
                f"(supported: {BLR_KERNELS}).")
        self.leaf = int(leaf)
        self.rank = int(rank)
        self.eta = float(eta)
        self.epsilon = None if epsilon is None else float(epsilon)
        self.tol = float(tol)
        self.max_iters = int(max_iters)
        self.refine_iters = int(refine_iters)
        self.inner_tol = float(inner_tol)
        self.seed = int(seed)
        self.iterations = 0
        self.outer_iterations = 0
        self.residual = float("nan")
        self.true_residual = float("nan")
        self.op = None
        tag = (f"eps={epsilon}" if epsilon is not None else f"rank={rank}")
        if self.refine_iters > 0:
            tag += f", ir={self.refine_iters}"
        self.name = f"BlrSolver(leaf={leaf}, {tag}, tol={tol})"

    def prepare_data(self, *, source_points):
        self.y_host = np.ascontiguousarray(source_points, dtype=np.float32)
        self.y = jax.device_put(self.y_host)

    def fit(self):
        # TIMED: the full H-matrix-style compression build (the honest
        # analog of Htool's build_clusters + build_HMatrix).
        self.op = BlrOperator(
            self.y_host, self.y_host, kernel_name=self.kernel,
            leaf=self.leaf, rank=self.rank, eta=self.eta,
            epsilon=self.epsilon, same_points=True, seed=self.seed)
        for u, _v, _j, _seg in self.op.far_groups:
            hard_fence(u)

    def set_query_arguments(self, tol=None, max_iters=None,
                            refine_iters=None, inner_tol=None):
        if tol is not None:
            self.tol = float(tol)
        if max_iters is not None:
            self.max_iters = int(max_iters)
        if refine_iters is not None:
            self.refine_iters = int(refine_iters)
        if inner_tol is not None:
            self.inner_tol = float(inner_tol)
        tag = (f"eps={self.epsilon}" if self.epsilon is not None
               else f"rank={self.rank}")
        if self.refine_iters > 0:
            tag += f", ir={self.refine_iters}"
        self.name = f"BlrSolver(leaf={self.leaf}, {tag}, tol={self.tol})"

    def prepare_query(self, *, target_signal):
        self.rhs = jax.device_put(np.asarray(target_signal, dtype=np.float32))
        self.rhs64 = np.ascontiguousarray(target_signal, dtype=np.float64)

    def _true_residual(self, b):
        """Relative residual against the exact kernel (f32 engine)."""
        from kmb_tpu.ops.product import kernel_matvec
        bj = jax.device_put(np.asarray(b, dtype=np.float32))
        kb = np.asarray(hard_fence(kernel_matvec(
            self.y, self.y, bj, kernel_name=self.kernel,
            precision="float32")), dtype=np.float64)
        num = np.linalg.norm(self.rhs64 - kb, axis=0)
        den = np.maximum(np.linalg.norm(self.rhs64, axis=0),
                         np.finfo(np.float64).tiny)
        return float(np.max(num / den))

    def query(self):
        from kmb_tpu.ops.solve import _minres, _split_static, ir_solve
        # matvec_partial + _split_static: the factor tiers travel as
        # runtime args of the jitted MINRES loop — closing over them
        # exceeds the remote-compile payload cap (HTTP 413 on axon).
        matvec_fn, matvec_args = _split_static(self.op.matvec_partial())
        if self.refine_iters > 0:
            def inner(r):
                return _minres(matvec_fn, r, self.inner_tol,
                               self.max_iters, matvec_args=matvec_args)

            b, info = ir_solve(
                self.y, self.rhs64, kernel_name=self.kernel,
                tol=self.tol, max_iters=self.max_iters,
                inner_tol=self.inner_tol,
                refine_iters=self.refine_iters, inner_solve=inner)
            self.res = b
            self.iterations = int(info["inner_iterations"])
            self.outer_iterations = int(info["outer_iterations"])
            self.residual = float(info["relative_residual"])
        else:
            b, iters, residual = _minres(
                matvec_fn, self.rhs, self.tol, self.max_iters,
                matvec_args=matvec_args)
            self.res = hard_fence(b)
            self.iterations = int(iters)
            self.outer_iterations = 0
            self.residual = float(residual)
        self.true_residual = self._true_residual(self.res)

    def get_additional(self):
        extra = {"cg_iterations": self.iterations,
                 "cg_relative_residual": self.residual,
                 "true_relative_residual": self.true_residual,
                 "compression": self.op.compression}
        if self.outer_iterations:
            extra["ir_outer_iterations"] = self.outer_iterations
        return extra

    def get_result(self):
        return np.ascontiguousarray(np.asarray(self.res), dtype=np.float64)


class RandomFeatureProduct(_ApproxProduct):
    """Random-feature kernel product: K @ b ≈ Φx (Φyᵀ b).

    When the materialized feature matrices would exceed
    KMB_RFF_STREAM_BYTES (default 2 GiB; at M=2^20 and F=4096 they are
    17 GB, past a 16 GB chip's HBM), `fit` keeps only the (D, F)
    spectral parameters and `query` streams row blocks through the
    feature map (ops/lowrank.feature_apply_streamed) — same estimator,
    O(block·F) memory, cost shifted honestly into the timed query.
    """

    def __init__(self, *, kernel, dimension, normalize_rows=False,
                 precision="float32", num_features=1024, seed=0,
                 stream_bytes=None):
        super().__init__(kernel=kernel, dimension=dimension,
                         normalize_rows=normalize_rows, precision=precision)
        self._check_kernel(kernel)
        import os
        self.num_features = int(num_features)
        self.seed = int(seed)
        self.stream_bytes = int(
            stream_bytes if stream_bytes is not None
            else os.environ.get("KMB_RFF_STREAM_BYTES", str(2 << 30)))
        self.streaming = False
        self.omega = self.phase = None
        self.name = f"RandomFeatureProduct(F={num_features})"

    def fit(self):
        # TIMED: sampling the spectral frequencies and (in materialized
        # mode) projecting both point clouds through them is the
        # compression build.
        n = self.x.shape[0]
        m = self.y.shape[0]
        rows = m if self.same_points else n + m
        self.streaming = rows * self.num_features * 4 > self.stream_bytes
        if self.streaming:
            self.omega, self.phase = random_feature_params(
                self.x.shape[1], self.kernel, self.num_features,
                seed=self.seed)
            hard_fence((self.omega, self.phase))
            return
        self.phi_x = random_feature_map(
            self.x, self.kernel, self.num_features, seed=self.seed)
        self.phi_y = (self.phi_x if self.same_points else random_feature_map(
            self.y, self.kernel, self.num_features, seed=self.seed))
        hard_fence((self.phi_x, self.phi_y))

    def query(self):
        if self.streaming:
            self.res = hard_fence(feature_apply_streamed(
                self.omega, self.phase, self.x, self.y, self.b,
                normalize_rows=self.normalize_rows,
                density_estimation=self.density_estimation))
            return
        self.res = hard_fence(feature_apply(
            self.phi_x, self.phi_y, self.b,
            normalize_rows=self.normalize_rows,
            density_estimation=self.density_estimation))

    def get_additional(self):
        n, m = self.x.shape[0], self.y.shape[0]
        f = self.num_features
        return {"num_features": f, "streaming": self.streaming,
                "compression": float(n * m) / float((n + m) * f)}
