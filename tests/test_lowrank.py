"""Tests for the approximate (Htool-slot) methods: Nyström + random features.

Approximate methods are judged the way the harness judges them: error vs the
float64 oracle must be bounded and must *decrease* as the compression knob
loosens (rank / num_features up) — that monotone knob is the whole point of
the Pareto front (reference htool.py epsilon sweep, algos.yaml:183-246).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from kmb_tpu.algorithms.bruteforce_numpy import kernel_matrix
from kmb_tpu.algorithms.tpu_approx import (
    NystromProduct, NystromSolver, RandomFeatureProduct,
)
from kmb_tpu.ops.lowrank import (
    feature_apply, nystrom_apply, nystrom_core, nystrom_factors,
    random_feature_map, select_landmarks,
)

SMOOTH_KERNELS = ["gaussian", "absolute-exponential", "exponential"]


@pytest.fixture
def clouds(rng):
    # Points on a small sphere: smooth kernels there decay fast in rank.
    x = rng.standard_normal((120, 3))
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    y = rng.standard_normal((150, 3))
    y /= np.linalg.norm(y, axis=1, keepdims=True)
    b = rng.standard_normal((150, 2))
    return (x.astype(np.float32), y.astype(np.float32),
            b.astype(np.float32))


def _truth(kernel, x, y, b, normalize=False):
    k = kernel_matrix(kernel=kernel, source_points=y.astype(np.float64),
                      target_points=x.astype(np.float64))
    out = k @ b
    if normalize:
        out = out / k.sum(axis=1, keepdims=True)
    return out


def _rel_err(got, want):
    return np.linalg.norm(got - want) / np.linalg.norm(want)


def _nystrom(kernel, x, y, b, rank, normalize=False):
    landmarks = select_landmarks(jnp.array(y), rank)
    u, inv_lam = nystrom_core(landmarks, kernel)
    zx, zy = nystrom_factors(jnp.array(x), jnp.array(y), landmarks, kernel)
    return np.asarray(nystrom_apply(zx, zy, u, inv_lam, jnp.array(b),
                                    normalize_rows=normalize))


@pytest.mark.parametrize("kernel", SMOOTH_KERNELS)
def test_nystrom_error_bounded_and_monotone(kernel, clouds):
    x, y, b = clouds
    want = _truth(kernel, x, y, b)
    err_lo = _rel_err(_nystrom(kernel, x, y, b, 16), want)
    err_hi = _rel_err(_nystrom(kernel, x, y, b, 128), want)
    # Analytic kernels on S^2 are near-exactly low-rank at rank ~ O(100);
    # absolute-exponential has a |x-y| kink, so its spectrum decays slower.
    assert err_hi < (0.05 if kernel == "absolute-exponential" else 1e-3)
    assert err_hi < err_lo + 1e-6


def test_nystrom_full_rank_is_near_exact(clouds):
    x, y, b = clouds
    want = _truth("gaussian", x, y, b)
    got = _nystrom("gaussian", x, y, b, rank=150)  # all sources = exact
    assert _rel_err(got, want) < 1e-4


def test_nystrom_attention_normalization(clouds):
    x, y, b = clouds
    want = _truth("exponential", x, y, b, normalize=True)
    got = _nystrom("exponential", x, y, b, 128, normalize=True)
    assert _rel_err(got, want) < 1e-3


@pytest.mark.parametrize("kernel", SMOOTH_KERNELS)
def test_random_features_converge(kernel, clouds):
    x, y, b = clouds
    want = _truth(kernel, x, y, b)

    def run(f):
        phi_x = random_feature_map(jnp.array(x), kernel, f, seed=3)
        phi_y = random_feature_map(jnp.array(y), kernel, f, seed=3)
        return np.asarray(feature_apply(phi_x, phi_y, jnp.array(b)))

    err_small = _rel_err(run(64), want)
    err_large = _rel_err(run(4096), want)
    # Monte-Carlo rate: 8x more features ~ sqrt(64)x less error.
    assert err_large < 0.1
    assert err_large < err_small


def test_performer_features_are_positive(clouds):
    x, _, _ = clouds
    phi = np.asarray(random_feature_map(jnp.array(x), "exponential", 128))
    assert (phi > 0).all()


def test_inverse_distance_rejected():
    with pytest.raises(NotImplementedError):
        NystromProduct(kernel="inverse-distance", dimension=3)
    with pytest.raises(NotImplementedError):
        RandomFeatureProduct(kernel="inverse-distance", dimension=3)
    with pytest.raises(NotImplementedError):
        NystromSolver(kernel="inverse-distance", dimension=3)


def test_nystrom_solver_full_rank_is_ridge_solve(clouds):
    # With every source as a landmark, K_hat == K, so the Woodbury solve
    # equals the ridge solve (K + lam I)^-1 a -> K^-1 a as lam -> 0.
    _, y, _ = clouds
    rng = np.random.default_rng(7)
    b_true = rng.standard_normal((150, 2))
    k = kernel_matrix(kernel="gaussian",
                      source_points=y.astype(np.float64),
                      target_points=y.astype(np.float64))
    a = (k @ b_true).astype(np.float32)

    algo = NystromSolver(kernel="gaussian", dimension=3, rank=150)
    algo.prepare_data(source_points=y)
    algo.fit()
    algo.set_query_arguments(lam=1e-2)
    algo.prepare_query(target_signal=a)
    algo.query()
    b_hat = algo.get_result()
    # Judge by residual in the K-image (K is ill-conditioned —
    # cond ~ 1e13 here — so the solution itself is not identifiable at
    # f32, and overly small lam *amplifies* the f32 factorization noise).
    res = np.linalg.norm(k @ b_hat - a.astype(np.float64))
    assert res / np.linalg.norm(a) < 1e-2
    algo.done()


def test_nystrom_solver_lam_sweep_stays_finite(clouds):
    _, y, _ = clouds
    rng = np.random.default_rng(7)
    b_true = rng.standard_normal((150, 1))
    k = kernel_matrix(kernel="gaussian",
                      source_points=y.astype(np.float64),
                      target_points=y.astype(np.float64))
    a = (k @ b_true).astype(np.float32)

    algo = NystromSolver(kernel="gaussian", dimension=3, rank=150)
    algo.prepare_data(source_points=y)
    algo.fit()

    def residual(lam):
        algo.set_query_arguments(lam=lam)
        algo.prepare_query(target_signal=a)
        algo.query()
        b_hat = algo.get_result()
        assert np.isfinite(b_hat).all()
        return (np.linalg.norm(k @ b_hat - a.astype(np.float64))
                / np.linalg.norm(a))

    # The lam knob spans the Pareto axis; its best point must be accurate.
    assert min(residual(lam) for lam in (1e-6, 1e-4, 1e-2)) < 5e-3
    algo.done()


@pytest.mark.parametrize("algo_cls,kwargs", [
    (NystromProduct, {"rank": 128}),
    (RandomFeatureProduct, {"num_features": 4096}),
])
def test_wrapper_lifecycle(algo_cls, kwargs, clouds):
    x, y, b = clouds
    algo = algo_cls(kernel="gaussian", dimension=3, **kwargs)
    algo.prepare_data(source_points=y, target_points=x)
    algo.fit()
    algo.prepare_query(source_signal=b)
    algo.query()
    got = algo.get_result()
    assert got.shape == (120, 2) and got.dtype == np.float64
    extra = algo.get_additional()
    # At benchmark scale compression >> 1; at this test's tiny N it is
    # merely positive and finite.
    assert extra["compression"] > 0
    want = _truth("gaussian", x, y, b)
    assert _rel_err(got, want) < 0.1
    algo.done()


def test_wrapper_density_estimation(clouds):
    x, y, _ = clouds
    algo = NystromProduct(kernel="gaussian", dimension=3, rank=128)
    algo.prepare_data(source_points=y, target_points=x,
                      density_estimation=True)
    algo.fit()
    algo.prepare_query(source_signal=None)
    algo.query()
    got = algo.get_result()
    want = _truth("gaussian", x, y, np.ones((150, 1)))
    assert _rel_err(got, want) < 1e-3


def test_wrapper_same_points_shares_features(clouds):
    _, y, b = clouds
    algo = RandomFeatureProduct(kernel="gaussian", dimension=3,
                                num_features=256)
    algo.prepare_data(source_points=y, target_points=y, same_points=True)
    algo.fit()
    assert algo.phi_x is algo.phi_y
    algo.done()


@pytest.mark.parametrize("kernel", SMOOTH_KERNELS)
@pytest.mark.parametrize("normalize", [False, True])
def test_streamed_features_match_materialized(kernel, normalize, clouds):
    """feature_apply_streamed is the same estimator as feature_apply:
    identical parameters, blockwise schedule — results must agree to
    float32 summation noise (the huge-M path must not change the math)."""
    if normalize and kernel != "exponential":
        pytest.skip("attention normalization pairs with exp(<x,y>)")
    from kmb_tpu.ops.lowrank import (
        feature_apply_streamed, random_feature_params)

    x, y, b = clouds
    f = 64
    phi_x = random_feature_map(jnp.array(x), kernel, f, seed=3)
    phi_y = random_feature_map(jnp.array(y), kernel, f, seed=3)
    want = np.asarray(feature_apply(phi_x, phi_y, jnp.array(b),
                                    normalize_rows=normalize))
    omega, phase = random_feature_params(x.shape[1], kernel, f, seed=3)
    # block=32 forces padding AND multiple scan steps on both clouds.
    got = np.asarray(feature_apply_streamed(
        omega, phase, jnp.array(x), jnp.array(y), jnp.array(b),
        normalize_rows=normalize, block=32))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_streaming_wrapper_matches_materialized(clouds):
    """RandomFeatureProduct flips to streaming past the byte threshold
    and produces the same result as the materialized mode."""
    x, y, b = clouds
    results = {}
    for label, stream_bytes in [("mat", 1 << 40), ("stream", 1)]:
        algo = RandomFeatureProduct(
            kernel="gaussian", dimension=3, num_features=64, seed=7,
            stream_bytes=stream_bytes)
        algo.prepare_data(source_points=y, target_points=x)
        algo.fit()
        algo.prepare_query(source_signal=b)
        algo.query()
        results[label] = algo.get_result()
        assert algo.get_additional()["streaming"] == (label == "stream")
        algo.done()
    np.testing.assert_allclose(results["stream"], results["mat"],
                               rtol=2e-5, atol=2e-5)
