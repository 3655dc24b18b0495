"""Dense NumPy/BLAS reference algorithms — the float64 oracle.

This module defines the *semantics* of every kernel and task, and doubles as
the ground-truth engine for dataset generation (same role as reference
bruteforce.py:61-207 and its use as `GroundTruth` in datasets.py:81-84).
It runs on the host CPU in float64, because ground truth must be bit-stable
and TPU float64 is emulated.

Kernel formulas (reference bruteforce.py:8-22, datasets.py:35-48):
    gaussian:             k = exp(-|x-y|^2)
    absolute-exponential: k = exp(-|x-y|)
    inverse-distance:     k = 1/|x-y| with zeros on the matrix diagonal
    exponential:          k = exp(<x,y>)   (attention kernel)

Two squared-distance paths (reference bruteforce.py:34-54):
    fast_sqdists=True:  |x|^2 + |y|^2 - 2 x.y^T via one GEMM (may go
                        slightly negative from rounding),
    fast_sqdists=False: explicit (N, M, D) difference buffer, guaranteed
                        non-negative.
"""

from __future__ import annotations

import numpy as np

from kmb_tpu.algorithms.base import BaseProduct, BaseSolver


def _zero_square_diagonal(k):
    """Zero k[i, i] for i < min(N, M) in place.

    The reference zeroes the flat-strided diagonal (bruteforce.py:12-15),
    which equals the main diagonal for the square, same-points case where
    the singular inverse-distance kernel is actually used.
    """
    n = min(k.shape[0], k.shape[1])
    k[np.arange(n), np.arange(n)] = 0.0
    return k


def squared_distances(target_points, source_points, fast=False):
    """(N, M) matrix of squared Euclidean distances |x_i - y_j|^2."""
    if fast:
        x_sq = np.einsum("nd,nd->n", target_points, target_points)
        y_sq = np.einsum("md,md->m", source_points, source_points)
        return (
            x_sq[:, None] + y_sq[None, :]
            - 2.0 * target_points @ source_points.T
        )
    diffs = target_points[:, None, :] - source_points[None, :, :]
    return np.einsum("nmd,nmd->nm", diffs, diffs)


def kernel_matrix(*, kernel, source_points, target_points=None,
                  fast_sqdists=False, diag_offset=None):
    """Dense (N, M) kernel matrix K_ij = k(x_i, y_j).

    Args:
        diag_offset: for the singular inverse-distance kernel, the global
            row index of the first target point.  k[i, diag_offset + i] is
            zeroed, so blocked evaluation over target rows still masks the
            same-points diagonal.  Defaults to 0 (plain main diagonal).
    """
    if target_points is None:
        target_points = source_points

    if kernel == "exponential":
        # Dot-product kernel: k = exp(<x, y>).
        return np.exp(target_points @ source_points.T)

    sqd = squared_distances(target_points, source_points, fast=fast_sqdists)
    if kernel == "gaussian":
        return np.exp(-sqd)
    if kernel == "absolute-exponential":
        return np.exp(-np.sqrt(np.maximum(sqd, 0.0)))
    if kernel == "inverse-distance":
        with np.errstate(divide="ignore"):
            k = 1.0 / np.sqrt(np.maximum(sqd, 0.0))
        offset = 0 if diag_offset is None else diag_offset
        rows = np.arange(k.shape[0])
        cols = rows + offset
        keep = cols < k.shape[1]
        k[rows[keep], cols[keep]] = 0.0
        return k
    raise NotImplementedError(f"Unknown kernel {kernel!r}.")


def blocked_kernel_product(*, kernel, source_points, target_points=None,
                           source_signal=None, normalize_rows=False,
                           block_rows=2048, dtype=np.float64):
    """Streaming float64 oracle: a = K b without materializing all of K.

    Evaluates the kernel matrix in blocks of `block_rows` target rows, so the
    peak memory is O(block_rows * M) instead of O(N * M).  Used to compute
    ground truth for datasets too large for the dense oracle.

    Args:
        source_signal: (M, E) array, or None for density estimation (b = 1).
        normalize_rows: attention semantics — divide each output row by the
            kernel row sum.

    Returns:
        (N, E) float64 array.
    """
    same_points = target_points is None
    x = source_points if same_points else target_points
    y = source_points
    n = x.shape[0]
    if source_signal is None:
        b = np.ones((y.shape[0], 1), dtype=dtype)
    else:
        b = np.asarray(source_signal, dtype=dtype)

    out = np.empty((n, b.shape[1]), dtype=dtype)
    for start in range(0, n, block_rows):
        stop = min(start + block_rows, n)
        # diag_offset=start zeroes k[i, start+i]: the global main diagonal,
        # matching the dense oracle's inverse-distance masking.
        k_block = kernel_matrix(
            kernel=kernel,
            source_points=y,
            target_points=np.asarray(x[start:stop], dtype=dtype),
            diag_offset=start,
        )
        block = k_block @ b
        if normalize_rows:
            block = block / k_block.sum(axis=1, keepdims=True)
        out[start:stop] = block
    return out


SUPPORTED_KERNELS = (
    "gaussian", "absolute-exponential", "inverse-distance", "exponential",
)


class BruteForceProductBLAS(BaseProduct):
    """Dense kernel product: materialize K, then one GEMM per query."""

    def __init__(self, *, kernel, dimension, normalize_rows=False,
                 precision=np.float64, fast_sqdists=False):
        super().__init__(kernel=kernel, dimension=dimension,
                         normalize_rows=normalize_rows,
                         precision=np.dtype(precision))
        if kernel not in SUPPORTED_KERNELS:
            raise NotImplementedError(
                f"BruteForceProductBLAS doesn't support kernel {kernel!r}.")
        self.fast_sqdists = fast_sqdists
        self.name = (
            f"BruteForceProductBLAS({self.precision}, "
            f"fast_sqdists={fast_sqdists})"
        )

    def prepare_data(self, *, source_points, target_points, same_points=False,
                     density_estimation=False):
        self.source_points = np.ascontiguousarray(
            source_points, dtype=self.precision)
        self.target_points = (
            None if same_points
            else np.ascontiguousarray(target_points, dtype=self.precision))
        self.same_points = same_points
        self.density_estimation = density_estimation

    def fit(self):
        # TIMED: the full dense (N, M) kernel matrix.
        self.K_ij = kernel_matrix(
            kernel=self.kernel,
            source_points=self.source_points,
            target_points=self.target_points,
            fast_sqdists=self.fast_sqdists,
        )

    def prepare_query(self, *, source_signal):
        self.source_signal = (
            None if self.density_estimation
            else np.ascontiguousarray(source_signal, dtype=self.precision))

    def query(self):
        # TIMED: K @ b, with the attention / density-estimation variants.
        if self.normalize_rows:
            if self.density_estimation:
                # Rows of the normalized kernel matrix sum to 1, so the
                # all-ones signal maps to all-ones output.
                pts = (self.source_points if self.same_points
                       else self.target_points)
                self.res = np.ones_like(pts[:, :1])
            else:
                # Fused product + normalization: append a ones column so a
                # single GEMM yields both K@b and the row sums.
                b_and_ones = np.concatenate(
                    [self.source_signal,
                     np.ones_like(self.source_signal[:, :1])], axis=1)
                out = self.K_ij @ b_and_ones
                self.res = out[:, :-1] / out[:, -1:]
        elif self.density_estimation:
            self.res = self.K_ij.sum(axis=1, keepdims=True)
        else:
            self.res = self.K_ij @ self.source_signal


class BruteForceSolverLAPACK(BaseSolver):
    """Dense solve b = K^-1 a via LAPACK least-squares (GELSD).

    Least-squares rather than a Cholesky solve because the singular
    inverse-distance kernel yields an indefinite (zero-diagonal) matrix
    (same choice as reference bruteforce.py:205-207).
    """

    def __init__(self, *, kernel, dimension, normalize_rows=False,
                 precision=np.float64, fast_sqdists=False):
        super().__init__(kernel=kernel, dimension=dimension,
                         normalize_rows=normalize_rows,
                         precision=np.dtype(precision))
        if kernel not in SUPPORTED_KERNELS:
            raise NotImplementedError(
                f"BruteForceSolverLAPACK doesn't support kernel {kernel!r}.")
        self.fast_sqdists = fast_sqdists
        self.name = (
            f"BruteForceSolverLAPACK({self.precision}, "
            f"fast_sqdists={fast_sqdists})"
        )

    def prepare_data(self, *, source_points):
        self.source_points = np.ascontiguousarray(
            source_points, dtype=self.precision)

    def fit(self):
        # TIMED: dense (M, M) kernel matrix.
        self.K_ij = kernel_matrix(
            kernel=self.kernel,
            source_points=self.source_points,
            fast_sqdists=self.fast_sqdists,
        )

    def prepare_query(self, *, target_signal):
        self.target_signal = np.ascontiguousarray(
            target_signal, dtype=self.precision)

    def query(self):
        # TIMED: least-squares solve (robust to the indefinite
        # inverse-distance matrix).
        from scipy.linalg import lstsq
        self.res = lstsq(self.K_ij, self.target_signal)[0]
