"""Block-low-rank engine tests (ops/blr.py + the BlrProduct wrapper)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kmb_tpu.algorithms.bruteforce_numpy import kernel_matrix
from kmb_tpu.algorithms.tpu_approx import BlrProduct
from kmb_tpu.ops.blr import BlrOperator, build_plan


def _truth(kernel, x, y, b, normalize=False):
    k = kernel_matrix(kernel=kernel, source_points=y.astype(np.float64),
                      target_points=x.astype(np.float64))
    out = k @ b
    if normalize:
        out = out / k.sum(axis=1, keepdims=True)
    return out


def _rel_err(got, want):
    return np.linalg.norm(got - want) / np.linalg.norm(want)


@pytest.fixture
def clouds(rng):
    x = rng.uniform(-1, 1, (201, 3)).astype(np.float32)
    y = rng.uniform(-1, 1, (167, 3)).astype(np.float32)
    b = rng.standard_normal((167, 2)).astype(np.float32)
    return x, y, b


def test_plan_partitions_all_pairs(clouds):
    x, y, _ = clouds
    plan = build_plan(x, y, leaf=32, eta=2.0)
    total = plan.num_x_blocks * plan.num_y_blocks
    assert plan.near_pairs.shape[0] + plan.far_pairs.shape[0] == total
    # Every original point appears exactly once among the real slots.
    assert sorted(plan.gid_x[plan.gid_x >= 0].tolist()) == list(range(201))
    assert sorted(plan.gid_y[plan.gid_y >= 0].tolist()) == list(range(167))


def test_full_rank_blr_is_exact(clouds):
    # rank == leaf makes the randomized range-finder exact (up to f32 QR).
    x, y, b = clouds
    op = BlrOperator(x, y, kernel_name="gaussian", leaf=32, rank=32, eta=1.0)
    got = np.asarray(op.matvec(b))
    want = _truth("gaussian", x, y, b)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("kernel", ["gaussian", "absolute-exponential"])
def test_lowrank_blr_is_accurate(kernel, clouds):
    x, y, b = clouds
    op = BlrOperator(x, y, kernel_name=kernel, leaf=32, rank=12, eta=2.0)
    got = np.asarray(op.matvec(b))
    assert _rel_err(got, _truth(kernel, x, y, b)) < 1e-2
    assert op.compression > 0.0  # ratio only meaningful at scale


def test_inverse_distance_same_points_masks_diagonal(rng):
    y = rng.uniform(-1, 1, (150, 3)).astype(np.float32)
    b = rng.standard_normal((150, 1)).astype(np.float32)
    op = BlrOperator(y, y, kernel_name="inverse-distance", leaf=32, rank=32,
                     eta=1.0, same_points=True)
    got = np.asarray(op.matvec(b))
    want = _truth("inverse-distance", y, y, b)  # oracle zeroes the diagonal
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_blr_rejects_dot_kernel(clouds):
    x, y, _ = clouds
    with pytest.raises(NotImplementedError):
        BlrOperator(x, y, kernel_name="exponential", leaf=32, rank=8)
    with pytest.raises(NotImplementedError):
        BlrProduct(kernel="exponential", dimension=3)


def _run_lifecycle(algo, x, y, b, same_points=False,
                   density_estimation=False):
    algo.prepare_data(source_points=y, target_points=x,
                      same_points=same_points,
                      density_estimation=density_estimation)
    algo.fit()
    algo.prepare_query(source_signal=b)
    algo.query()
    res = algo.get_result()
    extra = algo.get_additional()
    algo.done()
    return res, extra


def test_blr_product_wrapper(clouds):
    x, y, b = clouds
    algo = BlrProduct(kernel="gaussian", dimension=3, leaf=32, rank=32,
                      eta=1.5)
    res, extra = _run_lifecycle(algo, x, y, b)
    assert res.dtype == np.float64
    np.testing.assert_allclose(res, _truth("gaussian", x, y, b),
                               rtol=2e-4, atol=2e-5)
    # 201 and 167 points at leaf=32 both pad up to 8 blocks.
    assert extra["near_pairs"] + extra["far_pairs"] == 8 * 8
    assert extra["compression"] > 0


def test_blr_attention_wrapper(clouds):
    x, y, b = clouds
    algo = BlrProduct(kernel="gaussian", dimension=3, normalize_rows=True,
                      leaf=32, rank=12, eta=2.0)
    res, _ = _run_lifecycle(algo, x, y, b)
    want = _truth("gaussian", x, y, b, normalize=True)
    assert _rel_err(res, want) < 1e-2


def test_adaptive_epsilon_error_tracks_knob(clouds):
    # Htool's epsilon semantics: tighter epsilon => lower error, larger
    # stored factors (reference htool.py:18-74).
    x, y, b = clouds
    want = _truth("gaussian", x, y, b)
    errs, mean_ranks = [], []
    for eps in (3e-1, 1e-2, 1e-5):
        op = BlrOperator(x, y, kernel_name="gaussian", leaf=32, rank=32,
                         eta=2.0, epsilon=eps)
        errs.append(_rel_err(np.asarray(op.matvec(b)), want))
        assert op.block_ranks.shape[0] == op.plan.far_pairs.shape[0]
        mean_ranks.append(op.block_ranks.mean())
    assert errs[0] > errs[1] > errs[2]
    assert mean_ranks[0] < mean_ranks[2]
    assert errs[2] < 1e-3  # tight epsilon: near range-finder-exact


def test_adaptive_epsilon_matches_requested_tolerance(clouds):
    x, y, b = clouds
    want = _truth("gaussian", x, y, b)
    op = BlrOperator(x, y, kernel_name="gaussian", leaf=32, rank=32,
                     eta=2.0, epsilon=1e-3)
    # Blockwise Frobenius control implies the matvec error lands within
    # a small factor of epsilon (near-field is exact).
    assert _rel_err(np.asarray(op.matvec(b)), want) < 5e-3


def test_adaptive_tiers_have_static_shapes(clouds):
    x, y, b = clouds
    op = BlrOperator(x, y, kernel_name="gaussian", leaf=32, rank=32,
                     eta=2.0, epsilon=1e-2)
    assert len(op.far_groups) >= 1
    seen = set()
    for u, v, fj, fseg in op.far_groups:
        tier = u.shape[2]
        assert tier & (tier - 1) == 0 or tier == 32  # power of two or cap
        assert v.shape[1] == tier
        assert u.shape[0] == v.shape[0] == fj.shape[0] == fseg.shape[0]
        assert tier not in seen
        seen.add(tier)
    # Tiers partition the real far pairs exactly (rank-0 blocks dropped).
    kept = sum(g[2].shape[0] for g in op.far_groups)
    assert kept == int((op.block_ranks >= 1).sum())


def test_adaptive_wrapper_lifecycle(clouds):
    x, y, b = clouds
    algo = BlrProduct(kernel="gaussian", dimension=3, leaf=32, rank=32,
                      eta=2.0, epsilon=1e-3)
    res, extra = _run_lifecycle(algo, x, y, b)
    assert _rel_err(res, _truth("gaussian", x, y, b)) < 5e-3
    assert 0 < extra["mean_block_rank"] <= 32
    assert "eps=0.001" in algo.name


def test_symmetric_plan_stores_one_triangle(rng):
    # same_points plans keep only i<j far/near-sym pairs; together with
    # the forward-only diagonal list they must cover the full block grid.
    y = rng.uniform(-1, 1, (300, 3)).astype(np.float32)
    plan = build_plan(y, y, leaf=32, eta=2.0, same_points=True)
    b = plan.num_x_blocks
    assert plan.far_pairs.size and (
        plan.far_pairs[:, 0] < plan.far_pairs[:, 1]).all()
    assert (plan.near_sym_pairs[:, 0] < plan.near_sym_pairs[:, 1]).all()
    assert (plan.near_pairs[:, 0] == plan.near_pairs[:, 1]).all()
    covered = (plan.near_pairs.shape[0] + 2 * plan.near_sym_pairs.shape[0]
               + 2 * plan.far_pairs.shape[0])
    assert covered == b * b


@pytest.mark.parametrize("kernel", ["gaussian", "absolute-exponential"])
def test_symmetric_matvec_matches_oracle(kernel, rng):
    # The mirrored far factors + both-ways near tiles must reproduce the
    # full operator, not just its stored triangle.
    y = rng.uniform(-1, 1, (300, 3)).astype(np.float32)
    b = rng.standard_normal((300, 2)).astype(np.float32)
    op = BlrOperator(y, y, kernel_name=kernel, leaf=32, rank=32, eta=1.0,
                     same_points=True)
    got = np.asarray(op.matvec(b))
    np.testing.assert_allclose(got, _truth(kernel, y, y, b),
                               rtol=5e-4, atol=5e-4)
    assert len(op.mirror_groups) == len(op.far_groups)


def test_symmetric_adaptive_epsilon_matches_oracle(rng):
    y = rng.uniform(-1, 1, (300, 3)).astype(np.float32)
    b = rng.standard_normal((300, 1)).astype(np.float32)
    op = BlrOperator(y, y, kernel_name="gaussian", leaf=32, rank=32,
                     eta=2.0, epsilon=1e-3, same_points=True)
    assert _rel_err(np.asarray(op.matvec(b)), _truth("gaussian", y, y, b)) \
        < 5e-3


def test_symmetry_halves_stored_factors(rng):
    # Same geometry, same knobs: the symmetric build must store half the
    # far factors the two-cloud build would (Htool htool.py:44-52 parity).
    y = rng.uniform(-1, 1, (300, 3)).astype(np.float32)
    # rank == leaf makes the range-finder exact, so both builds must agree
    # with the oracle (at lower rank their truncations differ block-wise:
    # the mirror reuses the i<j sketch transposed rather than re-sketching).
    sym = BlrOperator(y, y, kernel_name="gaussian", leaf=32, rank=32,
                      eta=2.0, same_points=True)
    full = BlrOperator(y, y.copy(), kernel_name="gaussian", leaf=32, rank=32,
                       eta=2.0, same_points=False)
    stored_sym = sum(u.shape[0] for u, _, _, _ in sym.far_groups)
    stored_full = sum(u.shape[0] for u, _, _, _ in full.far_groups)
    # Padded to _CHUNK multiples, so compare the plan's real pair counts.
    assert sym.plan.far_pairs.shape[0] * 2 == full.plan.far_pairs.shape[0]
    assert stored_sym <= stored_full
    b = rng.standard_normal((300, 1)).astype(np.float32)
    want = _truth("gaussian", y, y, b)
    np.testing.assert_allclose(np.asarray(sym.matvec(b)), want,
                               rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(full.matvec(b)), want,
                               rtol=5e-4, atol=5e-4)


def test_blr_density_estimation(rng):
    y = rng.uniform(-1, 1, (130, 3)).astype(np.float32)
    algo = BlrProduct(kernel="gaussian", dimension=3, leaf=32, rank=32,
                      eta=1.0)
    res, _ = _run_lifecycle(algo, y, y, None, same_points=True,
                            density_estimation=True)
    want = _truth("gaussian", y, y, np.ones((130, 1)))
    np.testing.assert_allclose(res, want, rtol=2e-4, atol=2e-5)


class TestBlrSolver:
    """BLR-accelerated Krylov solver (tpu_approx.BlrSolver): MINRES on the
    compressed operator, optional exact-residual refinement."""

    def _system(self, rng, m=512, kernel="inverse-distance"):
        from kmb_tpu.algorithms.bruteforce_numpy import kernel_matrix
        y = rng.random((m, 3)).astype(np.float32)
        b = rng.standard_normal((m, 1)).astype(np.float64)
        k = kernel_matrix(kernel=kernel, source_points=y.astype(np.float64))
        return y, b, k, k @ b

    def test_matvec_device_matches_matvec(self, rng):
        y = rng.random((300, 3)).astype(np.float32)
        b = rng.standard_normal((300, 2)).astype(np.float32)
        op = BlrOperator(y, y, kernel_name="gaussian", leaf=32, rank=32,
                         eta=1.0, same_points=True)
        host = np.asarray(op.matvec(b))
        dev = np.asarray(jax.jit(op.matvec_device)(jnp.asarray(b)))
        np.testing.assert_allclose(dev, host, rtol=1e-5, atol=1e-5)

    def test_blr_solver_direct_floors_at_compression(self, rng):
        from kmb_tpu.algorithms.tpu_approx import BlrSolver

        y, b, k, rhs = self._system(rng)
        algo = BlrSolver(kernel="inverse-distance", dimension=3, leaf=64,
                         rank=64, eta=1.0, tol=1e-6, max_iters=2000)
        algo.prepare_data(source_points=y.astype(np.float64))
        algo.fit()
        algo.prepare_query(target_signal=rhs)
        algo.query()
        got = algo.get_result()
        extra = algo.get_additional()
        # rank == leaf: the compressed operator is near-exact, so the
        # MINRES solution solves the true system too.
        res = np.linalg.norm(rhs - k @ got) / np.linalg.norm(rhs)
        assert extra["cg_iterations"] > 0
        assert res < 1e-3
        assert extra["true_relative_residual"] == pytest.approx(res,
                                                                rel=0.5)

    def test_blr_solver_refinement_beats_direct(self, rng):
        from kmb_tpu.algorithms.tpu_approx import BlrSolver

        y, b, k, rhs = self._system(rng)

        def run(refine_iters):
            algo = BlrSolver(kernel="inverse-distance", dimension=3,
                             leaf=64, rank=32, eta=1.0, tol=1e-10,
                             max_iters=2000, refine_iters=refine_iters,
                             inner_tol=1e-4)
            algo.prepare_data(source_points=y.astype(np.float64))
            algo.fit()
            algo.prepare_query(target_signal=rhs)
            algo.query()
            got = algo.get_result()
            return (np.linalg.norm(rhs - k @ got) / np.linalg.norm(rhs),
                    algo.get_additional())

        res_direct, _ = run(0)
        res_ir, extra = run(4)
        # Exact-residual refinement contracts past the rank-32
        # compression floor of the direct BLR solve.
        assert extra["ir_outer_iterations"] >= 2
        assert res_ir < res_direct / 5
        assert res_ir < 1e-4
