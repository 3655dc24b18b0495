"""Tests for the harness spine: definitions, results, runner, orchestrator."""

import json
import os

import numpy as np
import pytest

from kmb_tpu.definitions import (
    Definition, InstantiationStatus, algorithm_status, get_definitions,
    instantiate_algorithm,
)
from kmb_tpu.results import (
    get_result_filename, load_all_results, store_result,
)
from kmb_tpu.runner import run


ALGOS_YAML = os.path.join(os.path.dirname(__file__), "..", "algos.yaml")


def _dummy_definition(constructor="DummyProduct", **arguments):
    arguments = {"kernel": "gaussian", "dimension": 3, **arguments}
    return Definition(
        algorithm="dummy",
        module="kmb_tpu.algorithms.dummy",
        constructor=constructor,
        arguments=arguments,
        query_argument_groups=[{}],
    )


class TestDefinitions:
    def test_expand_cpu_product(self):
        defs = get_definitions(
            definition_file=ALGOS_YAML,
            dataset="product-cube-D3-E1-M1000-N1000-gaussian",
            task="product", hardware="CPU", kernel="gaussian")
        names = {d.algorithm for d in defs}
        assert "bruteforce-product-blas" in names
        assert "bruteforce-solver-blas" not in names  # wrong task
        assert "dummy-product" not in names           # disabled
        # precision sweep expands to 6 variants:
        bf = [d for d in defs if d.algorithm == "bruteforce-product-blas"]
        assert len(bf) == 6
        assert all(d.arguments["kernel"] == "gaussian" for d in bf)

    def test_run_disabled_includes_dummy(self):
        defs = get_definitions(
            definition_file=ALGOS_YAML,
            dataset="product-cube-D3-E1-M1000-N1000-gaussian",
            task="product", hardware="CPU", run_disabled=True)
        assert "dummy-product" in {d.algorithm for d in defs}

    def test_tpu_tier(self):
        defs = get_definitions(
            definition_file=ALGOS_YAML,
            dataset="product-cube-D3-E1-M1000-N1000-gaussian",
            task="product", hardware="TPU", kernel="gaussian")
        algos = {d.algorithm for d in defs}
        # TPU-tier entries are selected...
        assert {"tpu-product", "tpu-sharded-product", "tpu-blr-product",
                "tpu-nystrom-product", "tpu-rff-product"} <= algos
        # ...and CPU entries ride along (tier is a capability: the TPU
        # host's CPU runs them, giving the CPU-vs-TPU Pareto in one
        # sweep).  GPU-only entries would still be excluded.
        assert "bruteforce-product-blas" in algos
        assert "native-product" in algos

    def test_attention_task_filter(self):
        defs = get_definitions(
            definition_file=ALGOS_YAML,
            dataset="attention-sphere-D3-E1-M1000-N1000-exponential",
            task="attention", hardware="CPU", kernel="exponential",
            normalize_rows=True)
        assert "bruteforce-product-blas" in {d.algorithm for d in defs}
        assert all(d.arguments["normalize_rows"] for d in defs)

    def test_dataset_glob_filtering(self):
        # tpu-solver-direct only matches small solver datasets:
        defs = get_definitions(
            definition_file=ALGOS_YAML,
            dataset="solver-cube-D3-E1-M50000-N50000-gaussian",
            task="solver", hardware="TPU", kernel="gaussian")
        names = {d.algorithm for d in defs}
        assert "tpu-solver-cg" in names
        assert "tpu-solver-direct" not in names

    def test_instantiate_and_status(self):
        d = _dummy_definition()
        assert algorithm_status(d) == InstantiationStatus.AVAILABLE
        algo = instantiate_algorithm(d)
        assert algo.task == "product"
        missing = d.replace(module="kmb_tpu.algorithms.nonexistent")
        assert algorithm_status(missing) == InstantiationStatus.NO_MODULE
        bad = d.replace(constructor="NoSuchClass")
        assert algorithm_status(bad) == InstantiationStatus.NO_CONSTRUCTOR


class TestResults:
    def test_filename_scheme_is_stable(self):
        d = _dummy_definition(precision="float32")
        fn = get_result_filename("ds", d, {"tol": 0.1})
        assert fn.startswith(os.path.join("results", "ds", "dummy"))
        assert fn.endswith(".hdf5")
        # Deterministic (sorted params):
        assert fn == get_result_filename("ds", d, {"tol": 0.1})

    def test_store_and_load_roundtrip(self):
        d = _dummy_definition()
        result = np.random.randn(10, 1)
        error = result - 1.0
        store_result(
            dataset="ds", definition=d, query_arguments={},
            attrs={"dataset": "ds", "algo": "dummy", "name": "Dummy()",
                   "kernel": "gaussian", "run_count": 2,
                   "build_time": 0.1, "query_time": 0.2,
                   "memory_footprint": 10.0},
            result=result, error=error)
        loaded = list(load_all_results("ds"))
        assert len(loaded) == 1
        props, f = loaded[0]
        # NB: file is closed after iteration advances; check props only.
        assert props["algo"] == "dummy"
        assert props["build_time"] == pytest.approx(0.1)

    def test_numpy_bool_in_params(self):
        d = _dummy_definition(flag=np.True_)
        fn = get_result_filename("ds", d, {})
        assert "true" in fn


class TestRunner:
    def test_end_to_end_oracle_run(self):
        dataset = "product-cube-D3-E1-M1000-N1000-gaussian"
        definition = Definition(
            algorithm="bruteforce-product-blas",
            module="kmb_tpu.algorithms.bruteforce_numpy",
            constructor="BruteForceProductBLAS",
            arguments={"kernel": "gaussian", "dimension": 3,
                       "precision": "float32"},
            query_argument_groups=[{}],
        )
        run(definition=definition, dataset=dataset, runs=2)

        results = list(load_all_results(dataset))
        assert len(results) == 1
        props, _ = results[0]
        assert props["run_count"] == 2
        assert props["build_time"] > 0
        assert props["query_time"] > 0
        # float32 oracle should be accurate to ~1e-5 on this dataset:
        fn = get_result_filename(dataset, definition, {})
        import h5py
        with h5py.File(fn, "r") as f:
            err = f["error"][:]
            assert np.sqrt(np.mean(err ** 2)) < 1e-3

    def test_profiler_trace_hook(self, tmp_path, monkeypatch):
        # SURVEY.md §5: KMB_PROFILE_DIR dumps a jax.profiler trace of the
        # final (warmed) query repetition and records its path in attrs.
        monkeypatch.setenv("KMB_PROFILE_DIR", str(tmp_path / "traces"))
        dataset = "product-cube-D3-E1-M1000-N1000-gaussian"
        definition = _dummy_definition()
        run(definition=definition, dataset=dataset, runs=2)

        props, _ = next(iter(load_all_results(dataset)))
        trace_dir = props["profile_trace"]
        assert trace_dir.startswith(str(tmp_path / "traces"))
        traced_files = [
            os.path.join(root, name)
            for root, _, names in os.walk(trace_dir) for name in names
        ]
        assert traced_files, "profiler trace directory is empty"

    def test_solver_run_uses_source_signal_truth(self):
        dataset = "solver-cube-D3-E1-M1000-N1000-gaussian"
        definition = Definition(
            algorithm="bruteforce-solver-blas",
            module="kmb_tpu.algorithms.bruteforce_numpy",
            constructor="BruteForceSolverLAPACK",
            arguments={"kernel": "gaussian", "dimension": 3,
                       "precision": "float64"},
            query_argument_groups=[{}],
        )
        run(definition=definition, dataset=dataset, runs=1)
        props, _ = next(iter(load_all_results(dataset)))
        assert props["algo"] == "bruteforce-solver-blas"


class TestMain:
    def test_plan_skips_existing_results(self):
        from kmb_tpu.main import make_parser, plan_experiments
        dataset = "product-cube-D3-E1-M1000-N1000-gaussian"
        args = make_parser().parse_args(
            ["--dataset", dataset, "--definitions", ALGOS_YAML, "--local"])
        plan = plan_experiments(args)
        # bruteforce-product-blas precision sweep (6) + native-product (1)
        assert len(plan) == 7
        # Write a fake result for one experiment and re-plan:
        done = plan[0]
        fn = get_result_filename(dataset, done,
                                 done.query_argument_groups[0])
        os.makedirs(os.path.dirname(fn), exist_ok=True)
        with open(fn, "w") as f:
            f.write("")
        plan2 = plan_experiments(args)
        assert len(plan2) == len(plan) - 1


class TestFailureAccounting:
    """Child deaths must be counted, recorded, and surfaced (the reference
    only logs red and keeps exit code 0, reference runner.py:319-338)."""

    DATASET = "product-cube-D3-E1-M1000-N1000-gaussian"

    def test_subprocess_timeout_returns_reason(self, monkeypatch):
        from kmb_tpu.runner import run_subprocess
        monkeypatch.setenv("KMB_PLATFORM", "cpu")
        definition = Definition(
            algorithm="dummy-sleepy",
            module="kmb_tpu.algorithms.dummy",
            constructor="SleepyProduct",
            arguments={"kernel": "gaussian", "dimension": 3, "seconds": 120},
            query_argument_groups=[{}],
        )
        reason = run_subprocess(definition=definition, dataset=self.DATASET,
                                runs=1, timeout=5)
        assert reason == "timeout after 5s"

    def test_main_counts_child_failures(self, monkeypatch):
        from kmb_tpu.main import main
        from kmb_tpu.results import get_result_filename
        monkeypatch.setenv("KMB_PLATFORM", "cpu")
        with pytest.raises(SystemExit) as exc:
            main(["--dataset", self.DATASET, "--definitions", ALGOS_YAML,
                  "--algorithm", "dummy-crashy", "--run-disabled",
                  "--runs", "1", "--timeout", "120"])
        assert exc.value.code == 1
        marker = get_result_filename(
            self.DATASET,
            Definition(algorithm="dummy-crashy",
                       module="kmb_tpu.algorithms.dummy",
                       constructor="CrashyProduct",
                       arguments={"kernel": "gaussian", "dimension": 3,
                                  "normalize_rows": False},
                       query_argument_groups=[{}]),
            {}) + ".failed"
        assert os.path.exists(marker)
        with open(marker) as f:
            assert "exit code" in f.read()

    def test_local_success_exits_cleanly(self, monkeypatch):
        # Control: a healthy local dummy sweep must NOT raise SystemExit.
        from kmb_tpu.main import main
        monkeypatch.setenv("KMB_PLATFORM", "cpu")
        main(["--dataset", self.DATASET, "--definitions", ALGOS_YAML,
              "--algorithm", "dummy-product", "--run-disabled", "--local",
              "--runs", "1"])


def test_build_loop_keeps_one_fitted_state(tmp_path, monkeypatch):
    """The best-of-N build loop must never hold two fitted algorithm
    states at once (two 8 GB factor sets exceed a 16 GB chip at M=2^20):
    each candidate is released before the next one fits, and the warm
    last candidate serves the query phase."""
    from kmb_tpu.algorithms.dummy import TrackingProduct
    from kmb_tpu.definitions import Definition
    from kmb_tpu.runner import run

    monkeypatch.setenv("KMB_RESULTS_DIR", str(tmp_path / "results"))
    TrackingProduct.reset_counters()
    definition = Definition(
        algorithm="tracking-product",
        module="kmb_tpu.algorithms.dummy",
        constructor="TrackingProduct",
        arguments={"kernel": "inverse-distance", "dimension": 3},
        query_argument_groups=[{}],
    )
    run(definition=definition,
        dataset="product-sphere-D3-E1-M1000-N1000-inverse-distance",
        runs=3)
    assert TrackingProduct.max_live_fitted == 1
    # The runner's finally-block released the winning candidate too.
    assert TrackingProduct.live_fitted == 0
