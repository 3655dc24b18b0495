"""Smoke test for the headline benchmark script."""

import json

import pytest


def test_bench_prints_json_line(monkeypatch, capsys, tmp_path):
    # Tiny sizes so the CPU fallback engine finishes quickly; headline
    # config only (the full suite is for the real chip).
    monkeypatch.setenv("KMB_BENCH_N", "2048")
    monkeypatch.setenv("KMB_BENCH_BASELINE_N", "1024")
    monkeypatch.setenv("KMB_BENCH_RUNS", "1")
    monkeypatch.setenv("KMB_BENCH_SUITE", "0")
    monkeypatch.setenv("KMB_BENCH_OUT", str(tmp_path / "suite.json"))
    import bench
    importlib = __import__("importlib")
    importlib.reload(bench)  # D_BASE_N is read at import time
    bench.main()
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1  # exactly ONE stdout JSON line (driver contract)
    payload = json.loads(out[-1])
    assert set(payload) == {"metric", "value", "unit", "vs_baseline",
                            "suite", "skipped"}
    assert payload["value"] > 0
    assert payload["vs_baseline"] > 0
    assert "pairs" in payload["unit"]
    assert "product-gaussian-D3-E1-f32" in payload["suite"]
    assert payload["skipped"] == []


def test_bench_budget_skips_tail_loudly(monkeypatch, capsys, tmp_path):
    """With a zero budget, only the headline runs; the rest land in
    "skipped" with reasons, and the JSON line still prints (the round-3
    failure mode — rc 124, parsed null — must be impossible)."""
    monkeypatch.setenv("KMB_BENCH_N", "2048")
    monkeypatch.setenv("KMB_BENCH_BASELINE_N", "1024")
    monkeypatch.setenv("KMB_BENCH_RUNS", "1")
    monkeypatch.setenv("KMB_BENCH_SUITE", "1")
    monkeypatch.setenv("KMB_BENCH_BUDGET", "0")
    monkeypatch.setenv("KMB_BENCH_OUT", str(tmp_path / "suite.json"))
    import bench
    importlib = __import__("importlib")
    importlib.reload(bench)
    bench.main()
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1
    payload = json.loads(out[-1])
    assert payload["value"] > 0  # headline always runs
    assert list(payload["suite"]) == ["product-gaussian-D3-E1-f32"]
    assert len(payload["skipped"]) == len(bench.SUITE) - 1
    assert all("budget" in s["reason"] for s in payload["skipped"])
    # The incremental suite record also exists on disk.
    suite = json.load(open(tmp_path / "suite.json"))
    assert suite["skipped"] == payload["skipped"]


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
