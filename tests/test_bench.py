"""Smoke test for the headline benchmark script."""

import json

import pytest


def _reload_bench(monkeypatch, tmp_path):
    monkeypatch.setenv("KMB_BENCH_N", "2048")
    monkeypatch.setenv("KMB_BENCH_BASELINE_N", "1024")
    monkeypatch.setenv("KMB_BENCH_RUNS", "1")
    monkeypatch.setenv("KMB_BENCH_OUT", str(tmp_path / "suite.json"))
    # Isolate the baselines sidecar: tests must never write tiny-N
    # entries into the committed BENCH_BASELINES.json.
    monkeypatch.setenv("KMB_BENCH_BASELINES",
                       str(tmp_path / "baselines.json"))
    import bench
    importlib = __import__("importlib")
    importlib.reload(bench)  # D_BASE_N etc. are read at import time
    return bench


def test_bench_prints_json_line(monkeypatch, capsys, tmp_path):
    # Tiny sizes so the CPU fallback engine finishes quickly; headline
    # config only (the full suite is for the real chip).
    monkeypatch.setenv("KMB_BENCH_SUITE", "0")
    bench = _reload_bench(monkeypatch, tmp_path)
    bench.main()
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1  # exactly ONE stdout JSON line (driver contract)
    payload = json.loads(out[-1])
    # COMPACT payload (the driver captures a bounded output tail; the
    # round-4 full-suite line overflowed it and parsed as null).
    assert set(payload) == {"metric", "value", "unit", "vs_baseline",
                            "suite_measured", "suite_skipped",
                            "wall_seconds"}
    assert len(out[-1]) < 400
    assert payload["value"] > 0
    assert payload["vs_baseline"] > 0
    assert "pairs" in payload["unit"]
    assert payload["suite_measured"] == 1
    # Per-entry numbers live in the incremental suite record on disk.
    suite = json.load(open(tmp_path / "suite.json"))
    assert "product-gaussian-D3-E1-f32" in suite["suite"]
    assert suite["skipped"] == []
    # The measured CPU baseline was persisted to the isolated sidecar.
    sidecar = json.load(open(tmp_path / "baselines.json"))
    assert any(k.endswith("N1024") for k in sidecar["product"])


def test_bench_budget_skips_tail_loudly(monkeypatch, capsys, tmp_path):
    """With a zero budget, only the headline runs; the rest land in
    "skipped" with reasons, and the JSON line still prints (the round-3
    failure mode — rc 124, parsed null — must be impossible)."""
    monkeypatch.setenv("KMB_BENCH_SUITE", "1")
    monkeypatch.setenv("KMB_BENCH_BUDGET", "0")
    bench = _reload_bench(monkeypatch, tmp_path)
    bench.main()
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1
    payload = json.loads(out[-1])
    assert payload["value"] > 0  # headline always runs
    assert payload["suite_measured"] == 1
    suite = json.load(open(tmp_path / "suite.json"))
    assert list(suite["suite"]) == ["product-gaussian-D3-E1-f32"]
    # The full_only entries are excluded by default, not "skipped".
    default_suite = [c for c in bench.SUITE if not c.get("full_only")]
    assert len(suite["skipped"]) == len(default_suite) - 1
    assert payload["suite_skipped"] == len(default_suite) - 1
    assert all("budget" in s["reason"] for s in suite["skipped"])


def test_bench_only_unknown_name_fails_loudly(monkeypatch, tmp_path):
    """A typo'd KMB_BENCH_ONLY filter must abort, not silently run the
    full suite on an 800s budget."""
    monkeypatch.setenv("KMB_BENCH_ONLY", "no-such-entry")
    bench = _reload_bench(monkeypatch, tmp_path)
    with pytest.raises(SystemExit) as exc_info:
        bench.main()
    assert exc_info.value.code == 2


def test_hard_fence_passthrough():
    import jax.numpy as jnp
    import numpy as np
    from kmb_tpu.utils import hard_fence

    tree = {"a": jnp.arange(6.0).reshape(2, 3), "b": None,
            "c": (jnp.zeros(()), 3)}
    out = hard_fence(tree)
    np.testing.assert_array_equal(np.asarray(out["a"]),
                                  np.arange(6.0).reshape(2, 3))
    assert out["c"][1] == 3
