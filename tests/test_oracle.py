"""Tests for the float64 NumPy oracle (kernel semantics ground truth)."""

import numpy as np
import pytest

from kmb_tpu.algorithms.bruteforce_numpy import (
    BruteForceProductBLAS,
    BruteForceSolverLAPACK,
    blocked_kernel_product,
    kernel_matrix,
    squared_distances,
)


def naive_kernel(kernel, x, y, i, j):
    """Scalar, independent implementation of every kernel formula."""
    if kernel == "exponential":
        return np.exp(np.dot(x[i], y[j]))
    d2 = np.sum((x[i] - y[j]) ** 2)
    if kernel == "gaussian":
        return np.exp(-d2)
    if kernel == "absolute-exponential":
        return np.exp(-np.sqrt(d2))
    if kernel == "inverse-distance":
        return 0.0 if i == j else 1.0 / np.sqrt(d2)
    raise ValueError(kernel)


@pytest.mark.parametrize("kernel", [
    "gaussian", "absolute-exponential", "inverse-distance", "exponential"])
def test_kernel_matrix_matches_naive(kernel, rng):
    x = rng.standard_normal((7, 3))
    y = rng.standard_normal((5, 3))
    k = kernel_matrix(kernel=kernel, source_points=y, target_points=x)
    for i in range(7):
        for j in range(5):
            assert k[i, j] == pytest.approx(
                naive_kernel(kernel, x, y, i, j), rel=1e-12)


def test_sqdists_fast_matches_safe(rng):
    x = rng.standard_normal((20, 5))
    y = rng.standard_normal((30, 5))
    fast = squared_distances(x, y, fast=True)
    safe = squared_distances(x, y, fast=False)
    np.testing.assert_allclose(fast, safe, atol=1e-10)


def test_inverse_distance_zero_diagonal(rng):
    y = rng.standard_normal((6, 3))
    k = kernel_matrix(kernel="inverse-distance", source_points=y)
    assert np.all(np.diag(k) == 0.0)
    assert np.all(np.isfinite(k))


def test_product_lifecycle_all_cases(rng):
    y = rng.standard_normal((40, 3))
    x = rng.standard_normal((25, 3))
    b = rng.standard_normal((40, 2))
    k = kernel_matrix(kernel="gaussian", source_points=y, target_points=x)

    # Plain product
    algo = BruteForceProductBLAS(kernel="gaussian", dimension=3)
    algo.prepare_data(source_points=y, target_points=x)
    algo.fit()
    algo.prepare_query(source_signal=b)
    algo.query()
    np.testing.assert_allclose(algo.get_result(), k @ b, rtol=1e-12)

    # Normalized rows (attention)
    algo = BruteForceProductBLAS(
        kernel="gaussian", dimension=3, normalize_rows=True)
    algo.prepare_data(source_points=y, target_points=x)
    algo.fit()
    algo.prepare_query(source_signal=b)
    algo.query()
    expected = (k @ b) / k.sum(axis=1, keepdims=True)
    np.testing.assert_allclose(algo.get_result(), expected, rtol=1e-12)

    # Density estimation
    algo = BruteForceProductBLAS(kernel="gaussian", dimension=3)
    algo.prepare_data(
        source_points=y, target_points=x, density_estimation=True)
    algo.fit()
    algo.prepare_query(source_signal=None)
    algo.query()
    np.testing.assert_allclose(
        algo.get_result(), k.sum(axis=1, keepdims=True), rtol=1e-12)

    # Density estimation + normalized rows -> ones
    algo = BruteForceProductBLAS(
        kernel="gaussian", dimension=3, normalize_rows=True)
    algo.prepare_data(
        source_points=y, target_points=x, density_estimation=True)
    algo.fit()
    algo.prepare_query(source_signal=None)
    algo.query()
    np.testing.assert_allclose(algo.get_result(), np.ones((25, 1)))


def test_same_points_product(rng):
    y = rng.standard_normal((30, 3))
    b = rng.standard_normal((30, 1))
    algo = BruteForceProductBLAS(kernel="inverse-distance", dimension=3)
    algo.prepare_data(source_points=y, target_points=y, same_points=True)
    algo.fit()
    algo.prepare_query(source_signal=b)
    algo.query()
    k = kernel_matrix(kernel="inverse-distance", source_points=y)
    np.testing.assert_allclose(algo.get_result(), k @ b, rtol=1e-12)


def test_solver_roundtrip(rng):
    y = rng.standard_normal((50, 3))
    b = rng.standard_normal((50, 1))
    k = kernel_matrix(kernel="gaussian", source_points=y)
    a = k @ b

    algo = BruteForceSolverLAPACK(kernel="gaussian", dimension=3)
    algo.prepare_data(source_points=y)
    algo.fit()
    algo.prepare_query(target_signal=a)
    algo.query()
    np.testing.assert_allclose(algo.get_result(), b, atol=1e-6)


def test_blocked_product_matches_dense(rng):
    for kernel, same in [("gaussian", False), ("inverse-distance", True)]:
        y = rng.standard_normal((37, 3))
        x = y if same else rng.standard_normal((23, 3))
        b = rng.standard_normal((37, 2))
        k = kernel_matrix(
            kernel=kernel, source_points=y,
            target_points=None if same else x)
        expected = k @ b
        got = blocked_kernel_product(
            kernel=kernel, source_points=y,
            target_points=None if same else x,
            source_signal=b, block_rows=8)
        np.testing.assert_allclose(got, expected, rtol=1e-12)


def test_blocked_product_normalized(rng):
    y = rng.standard_normal((30, 4))
    b = rng.standard_normal((30, 3))
    k = kernel_matrix(kernel="exponential", source_points=y)
    expected = (k @ b) / k.sum(axis=1, keepdims=True)
    got = blocked_kernel_product(
        kernel="exponential", source_points=y, source_signal=b,
        normalize_rows=True, block_rows=7)
    np.testing.assert_allclose(got, expected, rtol=1e-12)
