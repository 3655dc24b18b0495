"""Smoke test for the headline benchmark script."""

import json

import pytest


def test_bench_prints_json_line(monkeypatch, capsys):
    # Tiny sizes so the CPU fallback engine finishes quickly.
    monkeypatch.setenv("KMB_BENCH_N", "2048")
    monkeypatch.setenv("KMB_BENCH_BASELINE_N", "1024")
    monkeypatch.setenv("KMB_BENCH_RUNS", "1")
    import bench
    bench.main()
    out = capsys.readouterr().out.strip().splitlines()
    payload = json.loads(out[-1])
    assert set(payload) == {"metric", "value", "unit", "vs_baseline"}
    assert payload["value"] > 0
    assert payload["vs_baseline"] > 0
    assert "pairs" in payload["unit"]


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
