"""Headline benchmark: streaming Gaussian kernel matvec on TPU vs BLAS.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The benchmarked operation is the reference's headline computation
(bruteforce.py:113-153): the exact Gaussian kernel product
a_i = sum_j exp(-|x_i-y_j|^2) b_j.

- baseline: the reference's own engine semantics — float32 NumPy/BLAS
  bruteforce (materialize K, then GEMM) — timed on this host's CPU at the
  largest scale the reference benchmarks (N = M = 10^4, D=3, E=1,
  reference datasets.py:383-427), expressed as kernel-pair evaluations
  per second of query time.
- value: the TPU-native streaming Pallas engine (never materializes K)
  at TPU scale (N = M = 2^17 by default), same float32 query semantics,
  on one chip, best-of-N timing with device fencing.

vs_baseline = our pairs/s ÷ baseline pairs/s  (higher is better).

Environment knobs: KMB_BENCH_N (TPU-side N=M, default 1048576),
KMB_BENCH_RUNS (default 3), KMB_BENCH_PRECISION (default float32),
KMB_BENCH_BASELINE_N (default 10000).

Measured 2026-08-18 on one TPU v5e chip (axon tunnel, ~31 ms fixed
round-trip included in every timing), after the exp2/negated-form/
ones-column-elision/block-retune pass over the Pallas engine:
    N=M=262144:  0.216 s  (3.2e11 pairs/s)
    N=M=524288:  0.683 s  (4.0e11 pairs/s, 3.2 TFLOP/s)  — exact f32
    N=M=2^20:    2.551 s  (4.3e11 pairs/s, 3.45 TFLOP/s) — 1.1e12 pairs
(previous engine: 1.096 s at N=M=524288, i.e. +60%).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def _best_of(fn, runs):
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def baseline_pairs_per_second(n, runs):
    """Reference-semantics float32 BLAS bruteforce on the host CPU."""
    from kmb_tpu.algorithms.bruteforce_numpy import BruteForceProductBLAS

    rng = np.random.default_rng(0)
    pts = rng.standard_normal((n, 3))
    sig = rng.standard_normal((n, 1))
    algo = BruteForceProductBLAS(
        kernel="gaussian", dimension=3, precision="float32")
    algo.prepare_data(source_points=pts, target_points=pts,
                      same_points=True)
    algo.fit()
    algo.prepare_query(source_signal=sig)
    t = _best_of(algo.query, runs)
    algo.done()
    return n * n / t, t


def tpu_pairs_per_second(n, runs, precision):
    import jax
    import jax.numpy as jnp

    from kmb_tpu.ops.product import kernel_matvec

    from kmb_tpu.utils import hard_fence

    rng = np.random.default_rng(0)
    x = jax.device_put(
        jnp.asarray(rng.standard_normal((n, 3)), jnp.float32))
    b = jax.device_put(
        jnp.asarray(rng.standard_normal((n, 1)), jnp.float32))
    hard_fence((x, b))

    def step():
        hard_fence(kernel_matvec(
            x, x, b, kernel_name="gaussian", precision=precision))

    step()  # compile (excluded, matching best-of-N protocol)
    t = _best_of(step, runs)
    return n * n / t, t


def main():
    runs = int(os.environ.get("KMB_BENCH_RUNS", "3"))
    n_tpu = int(os.environ.get("KMB_BENCH_N", str(2**20)))
    n_base = int(os.environ.get("KMB_BENCH_BASELINE_N", "10000"))
    precision = os.environ.get("KMB_BENCH_PRECISION", "float32")

    import jax
    backend = jax.default_backend()

    base_pps, base_t = baseline_pairs_per_second(n_base, runs)
    print(f"# baseline: BLAS f32 N=M={n_base}: {base_t:.4f}s "
          f"({base_pps:.3e} pairs/s)", file=sys.stderr)

    pps, t = tpu_pairs_per_second(n_tpu, runs, precision)
    d_plus_e = 3 + 1
    tflops = 2.0 * n_tpu * n_tpu * d_plus_e / t / 1e12
    print(f"# engine [{backend}] {precision} N=M={n_tpu}: {t:.4f}s "
          f"({pps:.3e} pairs/s, {tflops:.2f} TFLOP/s)", file=sys.stderr)

    print(json.dumps({
        "metric": f"gaussian-matvec-pairs-per-second-{backend}",
        "value": pps,
        "unit": "kernel pairs/s",
        "vs_baseline": pps / base_pps,
    }))


if __name__ == "__main__":
    main()
