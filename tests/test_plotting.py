"""Tests for the metrics registry, Pareto extraction, and plot rendering."""

import os

import numpy as np
import pytest

from kmb_tpu.plotting.metrics import all_metrics, get_error_statistics
from kmb_tpu.plotting.utils import (
    compute_all_metrics, compute_metrics, create_linestyles,
    create_pointset, generate_n_colors, get_plot_label,
)


class FakeGroup(dict):
    """Mapping+attrs stand-in for an h5py group (SURVEY.md §4 fixture idea:
    metrics only need `.attrs`/`create_group`, so no file is required)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.attrs = {}

    def create_group(self, name):
        self[name] = FakeGroup()
        return self[name]


def fake_result_file(error):
    f = FakeGroup()
    f["error"] = np.asarray(error)
    return f


class TestErrorStatistics:
    def test_l2_row_norms(self):
        # Two points with (E=2) error rows (3,4) and (0,0): norms 5, 0.
        f = fake_result_file([[3.0, 4.0], [0.0, 0.0]])
        cache = FakeGroup()
        stats = get_error_statistics(f, cache)
        assert stats["max"] == 5.0
        assert stats["mean"] == 2.5
        assert stats["median"] == 2.5
        assert stats["rmse"] == pytest.approx(np.sqrt(12.5))

    def test_cached_not_recomputed(self):
        f = fake_result_file([[1.0]])
        cache = FakeGroup()
        get_error_statistics(f, cache)
        f["error"] = np.asarray([[100.0]])  # cache must shadow this
        assert get_error_statistics(f, cache)["max"] == 1.0


class TestMetricFunctions:
    def test_passthrough_and_total(self):
        props = {"build_time": 2.0, "query_time": 3.0,
                 "memory_footprint": 7.0}
        assert all_metrics["build-time"]["function"](
            None, None, props, None) == 2.0
        assert all_metrics["query-time"]["function"](
            None, None, props, None) == 3.0
        assert all_metrics["total-time"]["function"](
            None, None, props, None) == 5.0
        assert all_metrics["memory-footprint"]["function"](
            None, None, props, None) == 7.0

    def test_throughput_metrics(self):
        dataset = {
            "source_points": np.zeros((20, 3)),
            "target_signal": np.zeros((10, 2)),
        }
        props = {"query_time": 2.0}
        pps = all_metrics["pairs-per-second"]["function"](
            dataset, None, props, None)
        assert pps == 10 * 20 / 2.0
        tf = all_metrics["tflops-per-chip"]["function"](
            dataset, None, props, None)
        assert tf == pytest.approx(2 * 10 * 20 * (3 + 2) / 2.0 / 1e12)
        props["n_chips"] = 4
        assert all_metrics["tflops-per-chip"]["function"](
            dataset, None, props, None) == pytest.approx(tf / 4)

    def test_direction_signs(self):
        assert all_metrics["rmse-error"]["worst"] == float("inf")
        assert all_metrics["pairs-per-second"]["worst"] == float("-inf")


class TestPareto:
    def test_smaller_better_front(self):
        # (time, error) points; front = the staircase of mutual optima.
        data = [
            ("a", "p1", 1.0, 10.0),
            ("a", "p2", 2.0, 5.0),    # slower but more accurate: on front
            ("a", "p3", 3.0, 7.0),    # dominated by p2
            ("a", "p4", 0.5, 20.0),   # fastest: on front
        ]
        xs, ys, ls, axs, ays, als = create_pointset(
            data, "total-time", "rmse-error")
        assert ls == ["p2", "p1", "p4"]
        assert xs == [2.0, 1.0, 0.5]
        assert len(als) == 4

    def test_bigger_better_x(self):
        # x = throughput (bigger better), y = error (smaller better).
        data = [
            ("a", "p1", 100.0, 10.0),
            ("a", "p2", 50.0, 5.0),   # slower but more accurate: on front
            ("a", "p3", 80.0, 10.0),  # dominated by p1
        ]
        xs, ys, ls, *_ = create_pointset(
            data, "pairs-per-second", "rmse-error")
        assert ls == ["p2", "p1"]

    def test_keeps_zero_drops_missing(self):
        # Exact methods can report a 0.0 error statistic and streaming
        # engines a ~0 build time — zeros are real data and must survive;
        # only missing (None) and non-finite values are dropped.
        data = [("a", "p1", 0.0, 1.0), ("a", "p2", 1.0, 0.0),
                ("a", "p3", None, 1.0), ("a", "p4", float("nan"), 1.0),
                ("a", "p5", 2.0, 3.0)]
        xs, ys, ls, axs, ays, als = create_pointset(
            data, "total-time", "rmse-error")
        assert set(als) == {"p1", "p2", "p5"}
        assert "p2" in ls and "p1" in ls


class TestStyles:
    def test_n_colors_unique(self):
        colors = generate_n_colors(8)
        assert len(colors) == 8
        assert len(set(colors)) == 8
        assert all(len(c) == 4 for c in colors)

    def test_linestyles_keys(self):
        styles = create_linestyles(["a", "b", "c"])
        assert set(styles) == {"a", "b", "c"}
        color, faded, linestyle, marker = styles["a"]
        assert faded[3] == 0.3

    def test_plot_label_directions(self):
        label = get_plot_label(all_metrics["pairs-per-second"],
                               all_metrics["rmse-error"])
        assert "down" in label and "right" in label


class TestScalingEfficiency:
    """scaling-efficiency = pairs/s vs linear scaling from the smallest-
    chip sibling run of the same (dataset, algorithm)."""

    @pytest.fixture(autouse=True)
    def fresh_cache(self):
        from kmb_tpu.plotting import metrics as metrics_mod
        metrics_mod._scaling_baseline_cache.clear()
        yield
        metrics_mod._scaling_baseline_cache.clear()

    def test_vs_min_chip_sibling(self, tmp_path, monkeypatch):
        import h5py

        monkeypatch.setenv("KMB_RESULTS_DIR", str(tmp_path / "results"))
        dataset = {"source_points": np.zeros((100, 3)),
                   "target_signal": np.zeros((100, 1))}
        root = tmp_path / "results" / "ds" / "tpu-sharded-product"
        root.mkdir(parents=True)
        # 1 chip: 8 s; 4 chips: 2.5 s -> efficiency 8 / (4 * 2.5) = 0.8.
        for chips, qt in [(1, 8.0), (4, 2.5)]:
            with h5py.File(root / f"run{chips}.hdf5", "w") as f:
                f.attrs["dataset"] = "ds"
                f.attrs["algo"] = "tpu-sharded-product"
                f.attrs["n_chips"] = chips
                f.attrs["query_time"] = qt
        fn = all_metrics["scaling-efficiency"]["function"]
        props4 = {"dataset": "ds", "algo": "tpu-sharded-product",
                  "n_chips": 4, "query_time": 2.5}
        assert fn(dataset, None, props4, None) == pytest.approx(0.8)
        props1 = {"dataset": "ds", "algo": "tpu-sharded-product",
                  "n_chips": 1, "query_time": 8.0}
        assert fn(dataset, None, props1, None) == pytest.approx(1.0)

    def test_skipped_without_n_chips(self):
        fn = all_metrics["scaling-efficiency"]["function"]
        with pytest.raises(KeyError):
            fn(None, None,
               {"dataset": "d", "algo": "a", "query_time": 1.0}, None)

    def test_single_run_is_unity(self, tmp_path, monkeypatch):
        # No stored siblings: the run's own attrs are the baseline.
        monkeypatch.setenv("KMB_RESULTS_DIR", str(tmp_path / "results"))
        dataset = {"source_points": np.zeros((10, 3)),
                   "target_signal": np.zeros((10, 1))}
        props = {"dataset": "lonely", "algo": "x", "n_chips": 2,
                 "query_time": 3.0}
        fn = all_metrics["scaling-efficiency"]["function"]
        assert fn(dataset, None, props, None) == pytest.approx(1.0)


class TestEndToEnd:
    """Run the real harness on a tiny dataset, then compute real metrics."""

    @pytest.fixture
    def stored_results(self, tmp_path, monkeypatch):
        from kmb_tpu.definitions import Definition
        from kmb_tpu.runner import run

        monkeypatch.setenv("KMB_RESULTS_DIR", str(tmp_path / "results"))
        dataset = "product-sphere-D3-E1-M1000-N1000-inverse-distance"
        for precision in ["float32", "float64"]:
            definition = Definition(
                algorithm="bruteforce-product-blas",
                module="kmb_tpu.algorithms.bruteforce_numpy",
                constructor="BruteForceProductBLAS",
                arguments={"kernel": "inverse-distance", "dimension": 3,
                           "precision": precision},
                query_argument_groups=[{}],
            )
            run(definition=definition, dataset=dataset, runs=1)
        return dataset

    def test_compute_metrics_and_plot(self, stored_results, tmp_path):
        from kmb_tpu.datasets import get_dataset
        from kmb_tpu.results import get_unique_algorithms, load_all_results

        dataset_f, _ = get_dataset(stored_results)
        runs = compute_metrics(
            dataset_f, load_all_results(stored_results),
            "total-time", "rmse-error")
        assert "bruteforce-product-blas" in runs
        points = runs["bruteforce-product-blas"]
        assert len(points) == 2
        # float64 run must be (near-)exact, float32 must not be.
        errors = sorted(p[3] for p in points)
        assert errors[0] < 1e-12
        assert errors[1] > 1e-12

        # compute_all_metrics covers every registered metric except
        # scaling-efficiency, which only applies to runs with n_chips.
        for props, f in load_all_results(stored_results):
            algo, name, values = compute_all_metrics(dataset_f, f, props)
            assert set(all_metrics) - set(values) == {"scaling-efficiency"}

        import plot as plot_cli
        out = str(tmp_path / "out.png")
        plot_cli.main(["--dataset", stored_results, "--output", out,
                       "--raw"])
        assert os.path.getsize(out) > 0
        dataset_f.close()
