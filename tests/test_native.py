"""Tests for the native C++ oracle and its benchmark wrapper."""

import numpy as np
import pytest

from kmb_tpu import native
from kmb_tpu.algorithms.bruteforce_numpy import blocked_kernel_product

pytestmark = pytest.mark.skipif(
    not native.is_available(),
    reason="native library not built (run `python install.py`)")


@pytest.mark.parametrize("kernel", sorted(native.KERNEL_IDS))
@pytest.mark.parametrize("normalize", [False, True])
def test_matches_numpy_oracle(rng, kernel, normalize):
    y = rng.standard_normal((257, 5))
    x = rng.standard_normal((123, 5))
    b = rng.standard_normal((257, 3))
    ref = blocked_kernel_product(
        kernel=kernel, source_points=y, target_points=x, source_signal=b,
        normalize_rows=normalize, block_rows=64)
    out = native.native_kernel_product(
        kernel=kernel, source_points=y, target_points=x, source_signal=b,
        normalize_rows=normalize)
    np.testing.assert_allclose(out, ref, rtol=1e-12, atol=1e-12)


def test_same_points_singular_diagonal(rng):
    y = rng.standard_normal((64, 3))
    b = rng.standard_normal((64, 1))
    ref = blocked_kernel_product(
        kernel="inverse-distance", source_points=y, source_signal=b,
        block_rows=16)
    out = native.native_kernel_product(
        kernel="inverse-distance", source_points=y, source_signal=b)
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out, ref, rtol=1e-12)


def test_row_offset_slab(rng):
    """Evaluating a slab of target rows with row_offset masks the same
    global diagonal entries as the full evaluation."""
    y = rng.standard_normal((40, 3))
    b = rng.standard_normal((40, 1))
    full = native.native_kernel_product(
        kernel="inverse-distance", source_points=y, source_signal=b)
    slab = native.native_kernel_product(
        kernel="inverse-distance", source_points=y, target_points=y[10:30],
        source_signal=b, row_offset=10)
    np.testing.assert_allclose(slab, full[10:30], rtol=1e-12)


def test_density_rowsums(rng):
    y = rng.standard_normal((50, 4))
    out, rowsums = native.native_kernel_product(
        kernel="gaussian", source_points=y, return_rowsums=True)
    # b defaults to ones: out column == rowsums.
    np.testing.assert_allclose(out[:, 0], rowsums, rtol=1e-12)


class TestNativeProductWrapper:
    def _lifecycle(self, rng, **kwargs):
        from kmb_tpu.algorithms.native_oracle import NativeProduct
        y = rng.standard_normal((100, 3))
        x = rng.standard_normal((80, 3))
        b = rng.standard_normal((100, 2))
        algo = NativeProduct(kernel="gaussian", dimension=3, **kwargs)
        algo.prepare_data(source_points=y, target_points=x,
                          same_points=False,
                          density_estimation=kwargs.pop("density", False))
        algo.fit()
        algo.prepare_query(source_signal=b)
        algo.query()
        return algo.get_result(), (y, x, b)

    def test_product(self, rng):
        res, (y, x, b) = self._lifecycle(rng)
        ref = blocked_kernel_product(
            kernel="gaussian", source_points=y, target_points=x,
            source_signal=b)
        np.testing.assert_allclose(res, ref, rtol=1e-12)

    def test_attention(self, rng):
        res, (y, x, b) = self._lifecycle(rng, normalize_rows=True)
        ref = blocked_kernel_product(
            kernel="gaussian", source_points=y, target_points=x,
            source_signal=b, normalize_rows=True)
        np.testing.assert_allclose(res, ref, rtol=1e-12)

    def test_in_harness(self, rng, tmp_path, monkeypatch):
        from kmb_tpu.definitions import Definition
        from kmb_tpu.runner import run
        from kmb_tpu.results import load_all_results

        monkeypatch.setenv("KMB_RESULTS_DIR", str(tmp_path / "results"))
        definition = Definition(
            algorithm="native-product",
            module="kmb_tpu.algorithms.native_oracle",
            constructor="NativeProduct",
            arguments={"kernel": "inverse-distance", "dimension": 3},
            query_argument_groups=[{}],
        )
        dataset = "product-sphere-D3-E1-M1000-N1000-inverse-distance"
        run(definition=definition, dataset=dataset, runs=1)
        count = 0
        for props, f in load_all_results(dataset):
            count += 1
            assert props["native_threads"] >= 1
            # float64 streaming oracle: error vs truth ~ machine eps.
            assert np.abs(np.asarray(f["error"])).max() < 1e-8
        assert count == 1
