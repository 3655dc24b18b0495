"""Lifecycle tests for the sharded TPU algorithm wrappers on the
virtual 8-device CPU mesh."""

import numpy as np
import pytest

from kmb_tpu.algorithms.bruteforce_numpy import blocked_kernel_product
from kmb_tpu.algorithms.tpu_sharded import ShardedProduct, ShardedSolverCG


@pytest.mark.parametrize("schedule", ["ring", "allpairs"])
def test_sharded_product_lifecycle(rng, schedule):
    y = rng.standard_normal((53, 3))
    x = rng.standard_normal((37, 3))
    b = rng.standard_normal((53, 2))
    algo = ShardedProduct(kernel="gaussian", dimension=3,
                          schedule=schedule)
    algo.prepare_data(source_points=y, target_points=x, same_points=False)
    algo.fit()
    algo.prepare_query(source_signal=b)
    algo.query()
    res = algo.get_result()
    extra = algo.get_additional()
    assert extra["n_chips"] == 8
    ref = blocked_kernel_product(
        kernel="gaussian", source_points=y, target_points=x,
        source_signal=b)
    np.testing.assert_allclose(res, ref, rtol=1e-4, atol=1e-5)


def test_sharded_attention_lifecycle(rng):
    y = rng.standard_normal((40, 4))
    b = rng.standard_normal((40, 1))
    algo = ShardedProduct(kernel="exponential", dimension=4,
                          normalize_rows=True)
    algo.prepare_data(source_points=y, target_points=y, same_points=True)
    algo.fit()
    algo.prepare_query(source_signal=b)
    algo.query()
    ref = blocked_kernel_product(
        kernel="exponential", source_points=y, source_signal=b,
        normalize_rows=True)
    np.testing.assert_allclose(algo.get_result(), ref, rtol=1e-4,
                               atol=1e-5)


def test_sharded_solver_cg_lifecycle(rng):
    m = 64
    y = rng.standard_normal((m, 3))
    b = rng.standard_normal((m, 1))
    rhs = blocked_kernel_product(
        kernel="gaussian", source_points=y, source_signal=b)
    algo = ShardedSolverCG(kernel="gaussian", dimension=3, tol=1e-6,
                           max_iters=2000)
    algo.prepare_data(source_points=y)
    algo.fit()
    algo.set_query_arguments(tol=1e-7)
    algo.prepare_query(target_signal=rhs)
    algo.query()
    res = algo.get_result()
    extra = algo.get_additional()
    assert extra["n_chips"] == 8
    assert extra["cg_iterations"] > 0
    np.testing.assert_allclose(res, b, atol=5e-2)


def test_mesh_shape_override(rng):
    y = rng.standard_normal((24, 3))
    b = rng.standard_normal((24, 1))
    algo = ShardedProduct(kernel="gaussian", dimension=3,
                          schedule="allpairs", mesh_shape=[4, 2])
    algo.prepare_data(source_points=y, target_points=y, same_points=True)
    algo.fit()
    algo.prepare_query(source_signal=b)
    algo.query()
    ref = blocked_kernel_product(
        kernel="gaussian", source_points=y, source_signal=b)
    np.testing.assert_allclose(algo.get_result(), ref, rtol=1e-4,
                               atol=1e-5)
