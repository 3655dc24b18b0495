"""Block-low-rank engine tests (ops/blr.py + the BlrProduct wrapper)."""

import numpy as np
import pytest

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


def test_blr_density_estimation(rng):
    y = rng.uniform(-1, 1, (130, 3)).astype(np.float32)
    algo = BlrProduct(kernel="gaussian", dimension=3, leaf=32, rank=32,
                      eta=1.0)
    res, _ = _run_lifecycle(algo, y, y, None, same_points=True,
                            density_estimation=True)
    want = _truth("gaussian", y, y, np.ones((130, 1)))
    np.testing.assert_allclose(res, want, rtol=2e-4, atol=2e-5)
