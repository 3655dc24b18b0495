"""Tests for the TPU compute ops (run on CPU: XLA path + Pallas interpret)."""

import numpy as np
import pytest
import jax.numpy as jnp

from kmb_tpu.algorithms.bruteforce_numpy import kernel_matrix
from kmb_tpu.ops.product import kernel_matvec_pallas, kernel_matvec_xla
from kmb_tpu.ops.solve import (
    cg_solve, dense_solve, kernel_matrix_xla,
)

ALL_KERNELS = ["gaussian", "absolute-exponential", "inverse-distance",
               "exponential"]


@pytest.fixture
def problem(rng):
    x = rng.standard_normal((33, 3)).astype(np.float32)
    y = rng.standard_normal((47, 3)).astype(np.float32)
    b = rng.standard_normal((47, 2)).astype(np.float32)
    return x, y, b


def _truth(kernel, x, y, b, normalize=False):
    k = kernel_matrix(kernel=kernel, source_points=y.astype(np.float64),
                      target_points=x.astype(np.float64))
    out = k @ b
    if normalize:
        out = out / k.sum(axis=1, keepdims=True)
    return out


@pytest.mark.parametrize("kernel", ALL_KERNELS)
def test_xla_product_matches_oracle(kernel, problem):
    x, y, b = problem
    want = _truth(kernel, x, y, b)
    got = np.asarray(kernel_matvec_xla(
        jnp.array(x), jnp.array(y), jnp.array(b), kernel_name=kernel,
        block_n=8))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("kernel", ALL_KERNELS)
def test_pallas_interpret_matches_oracle(kernel, problem):
    x, y, b = problem
    want = _truth(kernel, x, y, b)
    got = np.asarray(kernel_matvec_pallas(
        jnp.array(x), jnp.array(y), jnp.array(b), kernel_name=kernel,
        block_n=16, block_m=128, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("kernel", ["gaussian", "exponential",
                                    "inverse-distance"])
def test_normalized_product_both_paths(kernel, problem):
    x, y, b = problem
    want = _truth(kernel, x, y, b, normalize=True)
    got_xla = np.asarray(kernel_matvec_xla(
        jnp.array(x), jnp.array(y), jnp.array(b), kernel_name=kernel,
        normalize_rows=True, block_n=8))
    got_pl = np.asarray(kernel_matvec_pallas(
        jnp.array(x), jnp.array(y), jnp.array(b), kernel_name=kernel,
        normalize_rows=True, block_n=16, block_m=128, interpret=True))
    np.testing.assert_allclose(got_xla, want, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(got_pl, want, rtol=1e-4, atol=1e-5)


def test_flash_stability_large_logits(rng):
    # exp(<x,y>) with logits ~ 60: naive exp overflows f32 sums only at
    # ~88, but the online-softmax path must stay exact well past that.
    x = (10.0 * rng.standard_normal((16, 4))).astype(np.float32)
    y = (10.0 * rng.standard_normal((24, 4))).astype(np.float32)
    b = rng.standard_normal((24, 1)).astype(np.float32)
    logits = x.astype(np.float64) @ y.astype(np.float64).T
    assert logits.max() > 100.0  # would overflow exp in f32
    p = np.exp(logits - logits.max(axis=1, keepdims=True))
    want = (p @ b) / p.sum(axis=1, keepdims=True)
    got = np.asarray(kernel_matvec_pallas(
        jnp.array(x), jnp.array(y), jnp.array(b), kernel_name="exponential",
        normalize_rows=True, block_n=8, block_m=128, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)
    assert np.all(np.isfinite(got))


def test_density_estimation_paths(problem):
    x, y, _ = problem
    k = kernel_matrix(kernel="gaussian", source_points=y.astype(np.float64),
                      target_points=x.astype(np.float64))
    want = k.sum(axis=1, keepdims=True)
    for fn, kwargs in [
        (kernel_matvec_xla, dict(block_n=8)),
        (kernel_matvec_pallas, dict(block_n=16, block_m=128,
                                    interpret=True)),
    ]:
        got = np.asarray(fn(jnp.array(x), jnp.array(y), None,
                            kernel_name="gaussian",
                            density_estimation=True, **kwargs))
        np.testing.assert_allclose(got, want, rtol=1e-4)
        ones = np.asarray(fn(jnp.array(x), jnp.array(y), None,
                             kernel_name="gaussian", normalize_rows=True,
                             density_estimation=True, **kwargs))
        np.testing.assert_allclose(ones, np.ones((33, 1)))


def test_same_points_diagonal_masking(rng):
    y = rng.standard_normal((20, 3)).astype(np.float32)
    b = rng.standard_normal((20, 1)).astype(np.float32)
    k = kernel_matrix(kernel="inverse-distance",
                      source_points=y.astype(np.float64))
    want = k @ b
    got = np.asarray(kernel_matvec_pallas(
        jnp.array(y), jnp.array(y), jnp.array(b),
        kernel_name="inverse-distance", block_n=8, block_m=128,
        interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    assert np.all(np.isfinite(got))


def test_bfloat16_precision_tier(problem):
    x, y, b = problem
    want = _truth("gaussian", x, y, b)
    got = np.asarray(kernel_matvec_pallas(
        jnp.array(x), jnp.array(y), jnp.array(b), kernel_name="gaussian",
        precision="bfloat16", block_n=16, block_m=128, interpret=True))
    # Coarse but not garbage:
    rel = np.abs(got - want).max() / np.abs(want).max()
    assert rel < 0.05


def test_attention_bf16_keeps_f32_flash_state(rng):
    """bf16 attention: inputs/MXU pass are bf16, but the online-softmax
    state (running max, normalizer, accumulator) must stay float32 —
    a bf16 normalizer summing thousands of near-equal terms would
    saturate at ~2^8 (8-bit mantissa) and wreck every row.  Error at
    bf16-INPUT scale proves the f32 state (product.py scratch_shapes)."""
    m = 4096
    x = rng.standard_normal((64, 8)).astype(np.float32) * 0.3
    y = rng.standard_normal((m, 8)).astype(np.float32) * 0.3
    b = rng.standard_normal((m, 1)).astype(np.float32)
    want = _truth("exponential", x, y, b, normalize=True)
    got = np.asarray(kernel_matvec_pallas(
        jnp.array(x), jnp.array(y), jnp.array(b),
        kernel_name="exponential", normalize_rows=True,
        precision="bfloat16", block_n=16, block_m=512, interpret=True))
    rel = np.abs(got - want).max() / np.abs(want).max()
    # bf16-input scale (~1e-2), NOT bf16-accumulator scale (~1e0).
    assert rel < 0.05


def test_float32x3_precision_tier(rng):
    # The hand-built 3-pass bf16 split (MXU-form regime, D=64): error
    # must land well below the bfloat16 tier and within ~2^-16 of f32.
    x = (rng.standard_normal((64, 64)) / 8.0).astype(np.float32)
    y = (rng.standard_normal((96, 64)) / 8.0).astype(np.float32)
    b = rng.standard_normal((96, 2)).astype(np.float32)
    want = _truth("gaussian", x, y, b)

    def run(precision):
        got = np.asarray(kernel_matvec_pallas(
            jnp.array(x), jnp.array(y), jnp.array(b),
            kernel_name="gaussian", precision=precision,
            block_n=16, block_m=128, interpret=True))
        return np.abs(got - want).max() / np.abs(want).max()

    rel_x3 = run("float32x3")
    rel_bf16 = run("bfloat16")
    assert rel_x3 < 3e-4
    assert rel_x3 < rel_bf16


def test_kernel_matrix_xla_matches_oracle(problem):
    x, y, _ = problem
    for kernel in ALL_KERNELS:
        want = kernel_matrix(kernel=kernel,
                             source_points=y.astype(np.float64),
                             target_points=x.astype(np.float64))
        got = np.asarray(kernel_matrix_xla(
            jnp.array(x), jnp.array(y), kernel_name=kernel))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


class TestSolvers:
    def _spd_problem(self, rng, kernel="gaussian", m=64, e=2):
        y = rng.standard_normal((m, 3)).astype(np.float32)
        b = rng.standard_normal((m, e)).astype(np.float32)
        k = kernel_matrix(kernel=kernel, source_points=y.astype(np.float64))
        rhs = (k @ b).astype(np.float32)
        return y, b, rhs

    def test_dense_solve_spd(self, rng):
        y, b, rhs = self._spd_problem(rng)
        got = np.asarray(dense_solve(jnp.array(y), jnp.array(rhs),
                                     kernel_name="gaussian"))
        np.testing.assert_allclose(got, b, atol=5e-2)

    def test_dense_solve_cholesky(self, rng):
        y, b, rhs = self._spd_problem(rng)
        got = np.asarray(dense_solve(jnp.array(y), jnp.array(rhs),
                                     kernel_name="gaussian",
                                     method="cholesky"))
        np.testing.assert_allclose(got, b, atol=5e-2)

    def test_dense_solve_svd_beats_lu_when_singular(self, rng):
        """Truncated-SVD solve degrades gracefully on numerically singular
        smooth kernels where exact LU blows up (the reference's lstsq
        behavior, bruteforce.py:205-207)."""
        from kmb_tpu.datasets import fibonacci_sphere
        m = 500
        y = fibonacci_sphere(m).astype(np.float32)
        b = rng.standard_normal((m, 1))
        k = kernel_matrix(kernel="gaussian",
                          source_points=y.astype(np.float64))
        rhs = (k @ b).astype(np.float32)
        err = {}
        for method in ["lu", "svd"]:
            got = np.asarray(dense_solve(
                jnp.array(y), jnp.array(rhs), kernel_name="gaussian",
                method=method))
            err[method] = np.abs(got - b).max()
        assert err["svd"] < err["lu"]

    def test_dense_solve_indefinite(self, rng):
        y, b, rhs = self._spd_problem(rng, kernel="inverse-distance")
        got = np.asarray(dense_solve(jnp.array(y), jnp.array(rhs),
                                     kernel_name="inverse-distance"))
        np.testing.assert_allclose(got, b, atol=1e-2)

    def test_cg_solve_spd(self, rng):
        y, b, rhs = self._spd_problem(rng, m=48)
        got, iters, residual = cg_solve(
            jnp.array(y), jnp.array(rhs), kernel_name="gaussian",
            tol=1e-6, max_iters=2000)
        assert iters > 0
        assert residual < 1e-5
        np.testing.assert_allclose(np.asarray(got), b, atol=5e-2)

    def test_cg_solve_indefinite_normal_equations(self, rng):
        y, b, rhs = self._spd_problem(rng, kernel="inverse-distance", m=40)
        got, iters, residual = cg_solve(
            jnp.array(y), jnp.array(rhs), kernel_name="inverse-distance",
            tol=1e-7, max_iters=4000, indefinite_method="normal")
        np.testing.assert_allclose(np.asarray(got), b, atol=5e-2)

    def test_minres_solves_indefinite(self, rng):
        # Default path for the symmetric-indefinite inverse-distance
        # matrix: MINRES on K itself, residual measured against K.
        y, b, rhs = self._spd_problem(rng, kernel="inverse-distance", m=80)
        got, iters, residual = cg_solve(
            jnp.array(y), jnp.array(rhs), kernel_name="inverse-distance",
            tol=1e-6, max_iters=4000)
        assert 0 < iters
        assert residual < 1e-5
        np.testing.assert_allclose(np.asarray(got), b, atol=5e-2)

    def test_minres_uses_fewer_matvecs_than_normal_equations(self, rng):
        # kappa vs kappa^2: at matched solution accuracy MINRES (one
        # matvec/iteration) must beat CG on K^2 (two matvecs/iteration).
        y, b, rhs = self._spd_problem(rng, kernel="inverse-distance",
                                      m=200, e=1)
        got_mr, it_mr, _ = cg_solve(
            jnp.array(y), jnp.array(rhs), kernel_name="inverse-distance",
            tol=1e-6, max_iters=4000, indefinite_method="minres")
        got_ne, it_ne, _ = cg_solve(
            jnp.array(y), jnp.array(rhs), kernel_name="inverse-distance",
            tol=1e-6, max_iters=4000, indefinite_method="normal")
        err_mr = np.abs(np.asarray(got_mr) - b).max()
        err_ne = np.abs(np.asarray(got_ne) - b).max()
        assert err_mr <= err_ne * 2.0 + 1e-3
        assert it_mr < 2 * it_ne  # fewer matvecs (1/iter vs 2/iter)

    def test_segment_boundaries_do_not_change_iterates(self, rng,
                                                       monkeypatch):
        # The host-segmented CG (ops/solve._pcg) must produce the exact
        # same iterate sequence regardless of where segments end.
        from kmb_tpu.ops import solve as solve_mod

        y, _, rhs = self._spd_problem(rng, m=48)
        ref, it_ref, res_ref = cg_solve(
            jnp.array(y), jnp.array(rhs), kernel_name="gaussian",
            tol=1e-6, max_iters=2000)
        assert it_ref > 3  # multiple segments below
        monkeypatch.setattr(solve_mod, "CG_SEGMENT_START", 2)
        monkeypatch.setenv("KMB_CG_SEGMENT_SECONDS", "0")
        got, it, res = cg_solve(
            jnp.array(y), jnp.array(rhs), kernel_name="gaussian",
            tol=1e-6, max_iters=2000)
        assert it == it_ref
        assert res == res_ref
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_cg_respects_max_iters(self, rng):
        y, _, rhs = self._spd_problem(rng, m=48)
        _, iters, _ = cg_solve(jnp.array(y), jnp.array(rhs),
                               kernel_name="gaussian", tol=1e-12,
                               max_iters=3)
        assert iters == 3

    @pytest.mark.parametrize(
        "kernel", ["inverse-distance", "absolute-exponential"])
    def test_nystrom_pcg_cuts_iterations(self, rng, kernel):
        """Nyström PCG converges in fewer iterations than plain CG on the
        benchmark sphere geometry, to the same solution."""
        from kmb_tpu.datasets import fibonacci_sphere
        from kmb_tpu.ops.product import kernel_matvec
        from kmb_tpu.ops.solve import (
            apply_nystrom_precond, nystrom_preconditioner)

        m = 500
        y = jnp.asarray(fibonacci_sphere(m), jnp.float32)
        b = jnp.asarray(rng.standard_normal((m, 1)), jnp.float32)
        rhs = kernel_matvec(y, y, b, kernel_name=kernel)

        plain, it_plain, res_plain = cg_solve(
            y, rhs, kernel_name=kernel, tol=1e-6, max_iters=3000)

        def op(v):
            out = kernel_matvec(y, y, v, kernel_name=kernel)
            if kernel == "inverse-distance":
                out = kernel_matvec(y, y, out, kernel_name=kernel)
            return out

        u, lam = nystrom_preconditioner(op, m, 128)
        assert u.shape == (m, 128)
        assert float(lam[0]) >= float(lam[-1]) >= 0.0
        pre, it_pre, res_pre = cg_solve(
            y, rhs, kernel_name=kernel, tol=1e-6, max_iters=3000,
            precond=lambda v: apply_nystrom_precond(u, lam, v))

        assert int(it_pre) < int(it_plain)
        assert float(res_pre) < 1e-5
        # Ill-conditioned systems: different converged iterates can differ
        # at the amplified-rounding scale, so judge by residual quality,
        # not by iterate proximity.
        # (for inverse-distance, CG tolerance applies to the normal
        # equations, so the K-residual is amplified by cond(K))
        resid = kernel_matvec(y, y, pre, kernel_name=kernel) - rhs
        rel = float(jnp.linalg.norm(resid) / jnp.linalg.norm(rhs))
        assert rel < 1e-3

    def test_nystrom_precond_is_spd(self, rng):
        """M^-1 must be symmetric positive definite for PCG validity."""
        from kmb_tpu.ops.solve import (
            apply_nystrom_precond, nystrom_preconditioner)

        y, _, _ = self._spd_problem(rng, m=64)
        k = kernel_matrix(kernel="gaussian",
                          source_points=y.astype(np.float64))

        def op(v):
            return jnp.asarray(k, jnp.float32) @ v

        u, lam = nystrom_preconditioner(op, 64, 16)
        minv = np.asarray(apply_nystrom_precond(u, lam, jnp.eye(64)))
        np.testing.assert_allclose(minv, minv.T, atol=1e-5)
        eigs = np.linalg.eigvalsh(0.5 * (minv + minv.T))
        assert eigs.min() > 0


class TestEngineWrappers:
    """Lifecycle wrappers, exercised through the XLA path on CPU."""

    def test_tpu_product_lifecycle(self, rng):
        from kmb_tpu.algorithms.tpu_engine import TpuProduct
        y = rng.standard_normal((30, 3))
        x = rng.standard_normal((20, 3))
        b = rng.standard_normal((30, 2))
        want = _truth("gaussian", x.astype(np.float32),
                      y.astype(np.float32), b.astype(np.float32))
        algo = TpuProduct(kernel="gaussian", dimension=3)
        algo.prepare_data(source_points=y, target_points=x)
        algo.fit()
        algo.prepare_query(source_signal=b)
        algo.query()
        res = algo.get_result()
        assert res.dtype == np.float64
        np.testing.assert_allclose(res, want, rtol=1e-3, atol=1e-4)

    def test_tpu_solver_direct_lifecycle(self, rng):
        from kmb_tpu.algorithms.tpu_engine import TpuSolverDirect
        y = rng.standard_normal((40, 3))
        b = rng.standard_normal((40, 1))
        k = kernel_matrix(kernel="gaussian", source_points=y)
        a = k @ b
        algo = TpuSolverDirect(kernel="gaussian", dimension=3)
        algo.prepare_data(source_points=y)
        algo.fit()
        algo.prepare_query(target_signal=a)
        algo.query()
        np.testing.assert_allclose(algo.get_result(), b, atol=5e-2)

    def test_tpu_solver_cg_lifecycle_and_additional(self, rng):
        from kmb_tpu.algorithms.tpu_engine import TpuSolverCG
        y = rng.standard_normal((40, 3))
        b = rng.standard_normal((40, 1))
        k = kernel_matrix(kernel="gaussian", source_points=y)
        a = k @ b
        algo = TpuSolverCG(kernel="gaussian", dimension=3)
        algo.prepare_data(source_points=y)
        algo.fit()
        algo.set_query_arguments(tol=1e-7, max_iters=3000)
        algo.prepare_query(target_signal=a)
        algo.query()
        extra = algo.get_additional()
        assert extra["cg_iterations"] > 0
        np.testing.assert_allclose(algo.get_result(), b, atol=5e-2)


    def test_block_jacobi_pcg_cuts_iterations(self, rng):
        """Block-Jacobi PCG beats plain CG on the slowly-decaying
        absolute-exponential spectrum (the regime Nystrom summarizes
        poorly at practical ranks), at matched residual quality."""
        from kmb_tpu.ops.product import kernel_matvec
        from kmb_tpu.ops.solve import block_jacobi_preconditioner

        m, kernel = 800, "absolute-exponential"
        y = jnp.asarray(rng.random((m, 3)), jnp.float32)
        b = jnp.asarray(rng.standard_normal((m, 1)), jnp.float32)
        rhs = kernel_matvec(y, y, b, kernel_name=kernel)

        plain, it_plain, res_plain = cg_solve(
            y, rhs, kernel_name=kernel, tol=1e-5, max_iters=3000)
        precond = block_jacobi_preconditioner(
            np.asarray(y), kernel_name=kernel, leaf=128)
        pre, it_pre, res_pre = cg_solve(
            y, rhs, kernel_name=kernel, tol=1e-5, max_iters=3000,
            precond=precond)

        assert int(it_pre) < int(it_plain)
        assert float(res_pre) <= 1e-4
        resid = kernel_matvec(y, y, pre, kernel_name=kernel) - rhs
        rel = float(jnp.linalg.norm(resid) / jnp.linalg.norm(rhs))
        assert rel < 1e-3

    def test_block_jacobi_is_spd_and_block_exact(self, rng):
        """P^-1 is SPD, and on a single-block problem (leaf >= m) it is
        the exact inverse: PCG converges in O(1) iterations."""
        from kmb_tpu.ops.solve import block_jacobi_preconditioner

        m, kernel = 96, "gaussian"
        y = rng.standard_normal((m, 3)).astype(np.float32)
        precond = block_jacobi_preconditioner(y, kernel_name=kernel,
                                              leaf=128)
        minv = np.asarray(precond(jnp.eye(m, dtype=jnp.float32)))
        assert np.allclose(minv, minv.T, atol=1e-4)
        assert (np.linalg.eigvalsh(0.5 * (minv + minv.T)) > 0).all()

        b = jnp.asarray(rng.standard_normal((m, 2)), jnp.float32)
        from kmb_tpu.ops.product import kernel_matvec
        krhs = kernel_matvec(jnp.asarray(y), jnp.asarray(y), b,
                             kernel_name=kernel)
        got, iters, residual = cg_solve(
            jnp.asarray(y), krhs, kernel_name=kernel, tol=1e-4,
            max_iters=50, precond=precond)
        assert int(iters) <= 5
        assert float(residual) < 1e-3

    def test_block_abs_preconditioned_minres(self, rng):
        """Preconditioned MINRES with the block spectral-absolute-value
        preconditioner beats plain MINRES on a CLUSTERED indefinite
        inverse-distance system — the geometry block preconditioning
        targets (near-field coupling dominates; on a uniform sphere the
        coupling is global and block-abs measurably hurts, so it stays
        an opt-in method, not a default)."""
        from kmb_tpu.ops.product import kernel_matvec
        from kmb_tpu.ops.solve import block_jacobi_preconditioner

        m, kernel = 1024, "inverse-distance"
        centers = 10.0 * rng.standard_normal((16, 3))
        y = (centers[rng.integers(0, 16, m)]
             + 0.05 * rng.standard_normal((m, 3))).astype(np.float32)
        yj = jnp.asarray(y)
        b = jnp.asarray(rng.standard_normal((m, 1)), jnp.float32)
        rhs = kernel_matvec(yj, yj, b, kernel_name=kernel)

        plain, it_plain, res_plain = cg_solve(
            yj, rhs, kernel_name=kernel, tol=1e-5, max_iters=3000)
        precond = block_jacobi_preconditioner(
            y, kernel_name=kernel, leaf=64)
        pre, it_pre, res_pre = cg_solve(
            yj, rhs, kernel_name=kernel, tol=1e-5, max_iters=3000,
            precond=precond, indefinite_method="minres")

        assert int(it_pre) < int(it_plain)
        assert float(res_pre) <= max(float(res_plain), 1e-4)

    def test_block_abs_precond_is_spd(self, rng):
        from kmb_tpu.ops.solve import block_jacobi_preconditioner

        m = 96
        y = rng.standard_normal((m, 3)).astype(np.float32)
        precond = block_jacobi_preconditioner(
            y, kernel_name="inverse-distance", leaf=64)
        minv = np.asarray(precond(jnp.eye(m, dtype=jnp.float32)))
        assert np.allclose(minv, minv.T, atol=1e-4 * np.abs(minv).max())
        w = np.linalg.eigvalsh(0.5 * (minv + minv.T))
        assert (w > 0).all()


class TestIterativeRefinement:
    """Mixed-precision iterative refinement (ops/solve.py ir_solve):
    float64 host residual + float32 Krylov corrections, targeting the
    reference's float64 LAPACK accuracy (bruteforce.py:205-207)."""

    def _system(self, rng, kernel, m=384, e=2):
        y = rng.standard_normal((m, 3)).astype(np.float32)
        b = rng.standard_normal((m, e)).astype(np.float64)
        k = kernel_matrix(kernel=kernel, source_points=y.astype(np.float64))
        return y, b, k, k @ b

    @pytest.mark.parametrize("kernel", ["absolute-exponential",
                                        "inverse-distance"])
    def test_ir_beats_plain_f32_residual(self, rng, kernel):
        # Moderately-conditioned kernels: refinement contracts by
        # ~kappa * eps_f32 per outer pass.  (The numerically singular
        # small-D gaussian matrix has kappa * eps_f32 >= 1, where NO
        # refinement scheme can contract — ir_solve then stops early and
        # returns the best iterate, covered by the precond test below.)
        from kmb_tpu.ops.solve import ir_solve

        y, b, k, rhs = self._system(rng, kernel)
        yj = jnp.asarray(y)
        plain, _, _ = cg_solve(
            yj, jnp.asarray(rhs, jnp.float32), kernel_name=kernel,
            tol=1e-12, max_iters=3000)
        res_plain = np.linalg.norm(rhs - k @ np.asarray(plain, np.float64)
                                   ) / np.linalg.norm(rhs)

        got, info = ir_solve(yj, rhs, kernel_name=kernel, tol=1e-10,
                             inner_tol=1e-5, refine_iters=4,
                             max_iters=3000)
        res_ir = np.linalg.norm(rhs - k @ got) / np.linalg.norm(rhs)
        assert got.dtype == np.float64
        assert info["outer_iterations"] >= 2
        # The refined float64 residual must land well below the plain
        # float32 Krylov floor.
        assert res_ir < res_plain / 10
        assert res_ir < 1e-6
        # info reports the same true residual it achieved (at the f64
        # noise floor the two measurements only agree in order).
        assert info["relative_residual"] < max(10 * res_ir, 1e-12)

    def test_ir_with_nystrom_precond(self, rng):
        import functools
        from kmb_tpu.ops.product import kernel_matvec
        from kmb_tpu.ops.solve import (apply_nystrom_precond, ir_solve,
                                       nystrom_preconditioner)

        kernel = "absolute-exponential"
        y, b, k, rhs = self._system(rng, kernel, m=256, e=1)
        yj = jnp.asarray(y)

        def matvec(v):
            return kernel_matvec(yj, yj, v, kernel_name=kernel)

        u, lam = nystrom_preconditioner(matvec, 256, 64)
        precond = functools.partial(apply_nystrom_precond, u, lam)
        got, info = ir_solve(yj, rhs, kernel_name=kernel, tol=1e-10,
                             inner_tol=1e-4, refine_iters=4,
                             max_iters=3000, matvec=matvec,
                             precond=precond)
        res_ir = np.linalg.norm(rhs - k @ got) / np.linalg.norm(rhs)
        assert res_ir < 1e-6

    def test_tpu_solver_cg_refine_lifecycle(self, rng):
        from kmb_tpu.algorithms.tpu_engine import TpuSolverCG

        y, b, k, rhs = self._system(rng, "absolute-exponential", m=256, e=1)
        algo = TpuSolverCG(kernel="absolute-exponential", dimension=3,
                           tol=1e-9, max_iters=2000, refine_iters=3,
                           inner_tol=1e-5)
        algo.prepare_data(source_points=y.astype(np.float64))
        algo.fit()
        algo.prepare_query(target_signal=rhs)
        algo.query()
        got = algo.get_result()
        extra = algo.get_additional()
        assert extra["ir_outer_iterations"] >= 2
        assert extra["cg_relative_residual"] < 1e-6
        res = np.linalg.norm(rhs - k @ got) / np.linalg.norm(rhs)
        assert res < 1e-5
