"""Headline benchmark suite: the TPU engine vs host BLAS on all 3 tasks.

Prints exactly ONE JSON line on stdout:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "suite": {...}}

The headline metric (value/vs_baseline) is the reference's headline
computation (reference bruteforce.py:113-153): the exact float32 Gaussian
kernel product a_i = sum_j exp(-|x_i-y_j|^2) b_j at N = M = 2^20 on one
chip — 1.1e12 exact kernel pairs, never materializing the 4 TB matrix K.

`suite` carries one entry per benchmarked configuration, spanning the
reference's three tasks (reference README.md:9-75) and both TPU compute
regimes of the Pallas engine:

- product, D=3 (VPU-form regime), f32 and bf16;
- product, D=64 and D=784 (MXU-form regime, MNIST-scale), f32 and bf16;
- attention (`exponential` kernel + row normalization) via the online-
  softmax flash path, at N = M = 2^19;
- solver: Nystrom-preconditioned matrix-free CG at M = 131072, reported
  against plain (unpreconditioned) CG as its baseline.

Baselines are the reference's own engine semantics — float32 NumPy/BLAS
bruteforce (materialize K, then GEMM) — timed on this host's CPU at the
largest scale the reference benchmarks (N = M = 10^4, reference
datasets.py:383-427), expressed as kernel-pair evaluations per second.
vs_baseline = our pairs/s / baseline pairs/s (higher is better); bf16
entries share the f32 CPU baseline (the reference treats low precision as
first-class Pareto entries, algos.yaml:157-162).

The full suite dict is also written to BENCH_SUITE.json next to this
file, and each entry is echoed as a human-readable stderr line.

Environment knobs: KMB_BENCH_RUNS (default 3), KMB_BENCH_SUITE=0 to run
only the headline config, KMB_BENCH_N to override the headline N=M.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

D_BASE_N = int(os.environ.get("KMB_BENCH_BASELINE_N", "10000"))
# ^ reference's largest benchmarked scale (CPU baseline), datasets.py:383-427


def _best_of(fn, runs):
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def _pairs(n, m):
    return float(n) * float(m)


def _flops(n, m, d, e):
    # 2NM(D+E): D MACs for the bilinear form + E MACs for the signal
    # accumulation per kernel pair (transcendentals not counted).
    return 2.0 * n * m * (d + e)


# -- CPU baselines (reference BLAS semantics) --------------------------------

def baseline_product(*, kernel, d, e, normalize_rows, runs):
    """Reference-semantics float32 BLAS bruteforce on the host CPU."""
    from kmb_tpu.algorithms.bruteforce_numpy import BruteForceProductBLAS

    n = D_BASE_N
    rng = np.random.default_rng(0)
    pts = rng.standard_normal((n, d)) / np.sqrt(d)
    sig = rng.standard_normal((n, e))
    algo = BruteForceProductBLAS(
        kernel=kernel, dimension=d, precision="float32",
        normalize_rows=normalize_rows, fast_sqdists=True)
    algo.prepare_data(source_points=pts, target_points=pts,
                      same_points=True)
    algo.fit()
    algo.prepare_query(source_signal=sig)
    t = _best_of(algo.query, runs)
    algo.done()
    return _pairs(n, n) / t, t


# -- TPU engine configurations ------------------------------------------------

def run_product(cfg, runs):
    import jax
    import jax.numpy as jnp

    from kmb_tpu.ops.product import kernel_matvec
    from kmb_tpu.utils import hard_fence

    n, d, e = cfg["n"], cfg["d"], cfg["e"]
    rng = np.random.default_rng(0)
    x = jax.device_put(jnp.asarray(
        rng.standard_normal((n, d)) / np.sqrt(d), jnp.float32))
    b = jax.device_put(jnp.asarray(
        rng.standard_normal((n, e)), jnp.float32))
    hard_fence((x, b))

    if cfg.get("schedule") == "ring":
        # 1-device ring: measures the ring schedule's overhead floor over
        # the direct engine (the multi-chip context-parallel path,
        # kmb_tpu.parallel.sharded.ring_kernel_matvec).
        from kmb_tpu.parallel.sharded import make_mesh, ring_kernel_matvec
        mesh = make_mesh(devices=jax.devices()[:1])

        def step():
            hard_fence(ring_kernel_matvec(
                x, x, b, mesh=mesh, kernel_name=cfg["kernel"],
                normalize_rows=cfg.get("normalize_rows", False),
                precision=cfg["precision"]))
    else:
        def step():
            hard_fence(kernel_matvec(
                x, x, b, kernel_name=cfg["kernel"],
                normalize_rows=cfg.get("normalize_rows", False),
                precision=cfg["precision"]))

    step()  # compile (excluded, matching the best-of-N protocol)
    t = _best_of(step, runs)
    return {
        "seconds": t,
        "pairs_per_second": _pairs(n, n) / t,
        "tflops": _flops(n, n, d, e) / t / 1e12,
    }


def run_blr(cfg, runs):
    """BLR (H-matrix slot) vs the exact streaming engine on the same data.

    vs_baseline = exact engine query time / BLR query time (the Htool
    value proposition: compressed matvec beats dense once built,
    reference htool.py:15-165); rmse_vs_exact reports the accuracy cost.
    """
    import jax
    import jax.numpy as jnp

    from kmb_tpu.ops.blr import BlrOperator
    from kmb_tpu.ops.product import kernel_matvec
    from kmb_tpu.utils import hard_fence

    m, d = cfg["m"], cfg["d"]
    rng = np.random.default_rng(0)
    if cfg.get("geometry", "sphere") == "sphere":
        # BEM home turf (reference htool.py:9-12): a 2-D SURFACE in 3-D.
        # Surface point clouds are what H-matrix compression is built
        # for — far-field admissible pairs dominate; a volume cloud
        # (uniform cube) compresses measurably worse.
        from kmb_tpu.datasets import fibonacci_sphere
        y = fibonacci_sphere(m).astype(np.float32)
    else:
        y = rng.random((m, d)).astype(np.float32)
    b = rng.standard_normal((m, 1)).astype(np.float32)
    yj = jax.device_put(jnp.asarray(y))
    bj = jax.device_put(jnp.asarray(b))
    hard_fence((yj, bj))

    def exact_step():
        return hard_fence(kernel_matvec(
            yj, yj, bj, kernel_name=cfg["kernel"], precision="float32"))

    exact_out = np.asarray(exact_step())
    t_exact = _best_of(exact_step, runs)

    kwargs = dict(kernel_name=cfg["kernel"], leaf=cfg["leaf"],
                  rank=cfg["rank"], eta=cfg["eta"],
                  epsilon=cfg.get("epsilon"), same_points=True)
    op = BlrOperator(y, y, **kwargs)          # compile pass
    t0 = time.perf_counter()
    op = BlrOperator(y, y, **kwargs)
    t_build = time.perf_counter() - t0
    bb = hard_fence(op.block_signal(b))

    def blr_step():
        return hard_fence(op.unblock(op.matvec_blocked(bb)))

    got = np.asarray(blr_step())
    t_query = _best_of(blr_step, runs)
    rmse = float(np.sqrt(np.mean((got - exact_out) ** 2)))
    return {
        "seconds": t_build + t_query,
        "build_seconds": t_build,
        "query_seconds": t_query,
        "exact_query_seconds": t_exact,
        "rmse_vs_exact": rmse,
        "compression": op.compression,
        "pairs_per_second": _pairs(m, m) / t_query,
        "vs_baseline": t_exact / t_query,
        "baseline": "exact Pallas streaming engine, same data and chip",
    }


def run_solver(cfg, runs):
    """Matrix-free CG at TPU scale; with precond_rank > 0, Nystrom-PCG
    against plain CG as its baseline (vs_baseline = plain/pcg time).

    Solves are timed once after a warm compile run (not best-of-N: a
    single 600-iteration CG solve is tens of seconds, and run-to-run
    variance is far below the preconditioner effect being measured).
    """
    import jax
    import jax.numpy as jnp

    from kmb_tpu.ops.product import kernel_matvec
    from kmb_tpu.ops.solve import (NormalEquationsOp, SPD_KERNELS,
                                   apply_nystrom_precond, cg_solve,
                                   nystrom_preconditioner)
    from kmb_tpu.utils import hard_fence
    import functools

    m, d, e = cfg["m"], cfg["d"], cfg["e"]
    tol, rank = cfg["tol"], cfg["precond_rank"]
    rng = np.random.default_rng(0)
    y = jax.device_put(jnp.asarray(rng.random((m, d)), jnp.float32))
    b_true = jax.device_put(jnp.asarray(
        rng.standard_normal((m, e)), jnp.float32))
    hard_fence((y, b_true))

    def matvec(v):
        return kernel_matvec(y, y, v, kernel_name=cfg["kernel"],
                             precision=cfg["precision"])

    rhs = hard_fence(matvec(b_true))  # consistent K b = rhs system

    def solve(precond):
        return hard_fence(cg_solve(
            y, rhs, kernel_name=cfg["kernel"], precision=cfg["precision"],
            tol=tol, max_iters=cfg["max_iters"], matvec=matvec,
            precond=precond))

    def timed_solve(precond):
        solve(precond)  # compile + warm (best-of-N protocol, runs=1)
        t0 = time.perf_counter()
        _, iters, res = solve(precond)
        return time.perf_counter() - t0, int(iters), float(res)

    t_plain, plain_iters, plain_res = timed_solve(None)
    entry = {
        "plain_cg_seconds": t_plain,
        "plain_cg_iterations": plain_iters,
        "plain_cg_relative_residual": plain_res,
    }
    if cfg.get("precond") == "jacobi":
        from kmb_tpu.ops.solve import block_jacobi_preconditioner

        def build():
            p = block_jacobi_preconditioner(
                np.asarray(y), kernel_name=cfg["kernel"],
                leaf=cfg.get("leaf", 512))
            hard_fence(p.args[0])
            return p

        precond = build()
        t0 = time.perf_counter()
        precond = build()
        t_build = time.perf_counter() - t0
        t_pcg, pcg_iters, pcg_res = timed_solve(precond)
        return {
            **entry,
            "seconds": t_build + t_pcg,
            "build_seconds": t_build,
            "solve_seconds": t_pcg,
            "iterations": pcg_iters,
            "relative_residual": pcg_res,
            "vs_baseline": t_plain / (t_build + t_pcg),
            "baseline": "plain (unpreconditioned) CG, same engine and chip",
        }
    if rank == 0:
        return {**entry, "seconds": t_plain, "iterations": plain_iters,
                "relative_residual": plain_res}

    # Nystrom preconditioner over the operator CG iterates on (K, or K^2
    # via the normal equations for the indefinite inverse-distance
    # kernel).  The build is the solver's `fit`, timed after a compile.
    op = (matvec if cfg["kernel"] in SPD_KERNELS
          else NormalEquationsOp(matvec))

    def build():
        return hard_fence(nystrom_preconditioner(op, m, rank))

    u, lam = build()
    t0 = time.perf_counter()
    u, lam = build()
    t_build = time.perf_counter() - t0
    precond = functools.partial(apply_nystrom_precond, u, lam)

    t_pcg, pcg_iters, pcg_res = timed_solve(precond)
    return {
        **entry,
        "seconds": t_build + t_pcg,
        "build_seconds": t_build,
        "solve_seconds": t_pcg,
        "iterations": pcg_iters,
        "relative_residual": pcg_res,
        "vs_baseline": t_plain / (t_build + t_pcg),
        "baseline": "plain (unpreconditioned) CG, same engine and chip",
    }


SUITE = [
    # VPU-form regime (small D): the headline config first.
    dict(name="product-gaussian-D3-E1-f32", task="product",
         kernel="gaussian", n=2**20, d=3, e=1, precision="float32"),
    dict(name="product-gaussian-D3-E1-bf16", task="product",
         kernel="gaussian", n=2**20, d=3, e=1, precision="bfloat16"),
    # MXU-form regime (large D).
    # Ring-schedule overhead floor (1 device): tracks the multi-chip
    # context-parallel path against the direct engine above.
    dict(name="product-gaussian-D3-E1-f32-ring", task="product",
         kernel="gaussian", n=2**20, d=3, e=1, precision="float32",
         schedule="ring"),
    # Mid-D regime (the GloVe dimension, datasets.py glove25): between
    # the VPU form (D<=8) and the well-filled MXU form (D>=64).
    dict(name="product-gaussian-D25-E1-f32", task="product",
         kernel="gaussian", n=2**19, d=25, e=1, precision="float32"),
    dict(name="product-gaussian-D25-E1-f32x3", task="product",
         kernel="gaussian", n=2**19, d=25, e=1, precision="float32x3"),
    dict(name="product-gaussian-D64-E1-f32x3", task="product",
         kernel="gaussian", n=2**19, d=64, e=1, precision="float32x3"),
    dict(name="attention-exponential-D25-E1-f32", task="attention",
         kernel="exponential", n=2**19, d=25, e=1, precision="float32",
         normalize_rows=True),
    dict(name="product-gaussian-D64-E8-f32", task="product",
         kernel="gaussian", n=2**19, d=64, e=8, precision="float32"),
    dict(name="product-gaussian-D64-E8-f32x3", task="product",
         kernel="gaussian", n=2**19, d=64, e=8, precision="float32x3"),
    dict(name="product-gaussian-D64-E8-bf16", task="product",
         kernel="gaussian", n=2**19, d=64, e=8, precision="bfloat16"),
    dict(name="product-gaussian-D784-E1-f32", task="product",
         kernel="gaussian", n=2**17, d=784, e=1, precision="float32"),
    dict(name="product-gaussian-D784-E1-f32x3", task="product",
         kernel="gaussian", n=2**17, d=784, e=1, precision="float32x3"),
    dict(name="product-gaussian-D784-E1-bf16", task="product",
         kernel="gaussian", n=2**17, d=784, e=1, precision="bfloat16"),
    # Attention: online-softmax flash path (normalize_rows).
    dict(name="attention-exponential-D3-E1-f32", task="attention",
         kernel="exponential", n=2**19, d=3, e=1, precision="float32",
         normalize_rows=True),
    dict(name="attention-exponential-D64-E8-f32", task="attention",
         kernel="exponential", n=2**19, d=64, e=8, precision="float32",
         normalize_rows=True),
    dict(name="attention-exponential-D64-E8-f32x3", task="attention",
         kernel="exponential", n=2**19, d=64, e=8, precision="float32x3",
         normalize_rows=True),
    # Solvers: matrix-free CG at TPU scale.  Nystrom rank is a real
    # tuning knob: on the wide D=3 Gaussian system rank 512 is pure
    # overhead (plain CG converges in ~50 iterations and the rank-512
    # PCG stalls at a worse residual) while rank 256 wins ~2x (harness
    # runs at M=131072: 43 -> 10 iterations at tol 1e-4).  The
    # slow-spectral-decay kernels are where preconditioning earns its
    # keep: plain CG stalls above tolerance while PCG converges, faster.
    dict(name="solver-cg-nystrom-gaussian-D3-M131072-f32", task="solver",
         kernel="gaussian", m=131072, d=3, e=1, precision="float32",
         tol=1e-5, max_iters=600, precond_rank=256),
    dict(name="solver-cg-nystrom-absexp-D3-M131072-f32", task="solver",
         kernel="absolute-exponential", m=131072, d=3, e=1,
         precision="float32", tol=1e-5, max_iters=600, precond_rank=512),
    # Block-Jacobi preconditioning on the same system: the local-coupling
    # complement to Nystrom for the slowly-decaying absolute-exponential
    # spectrum (ops/solve.py block_jacobi_preconditioner).
    dict(name="solver-cg-jacobi-absexp-D3-M131072-f32", task="solver",
         kernel="absolute-exponential", m=131072, d=3, e=1,
         precision="float32", tol=1e-5, max_iters=600, precond_rank=0,
         precond="jacobi", leaf=1024),
    dict(name="solver-cg-nystrom-invdist-D3-M65536-f32", task="solver",
         kernel="inverse-distance", m=65536, d=3, e=1,
         precision="float32", tol=1e-4, max_iters=600, precond_rank=512),
    # BLR — the H-matrix (Htool) slot on its home turf: the singular
    # inverse-distance kernel, adaptive-epsilon compression.
    dict(name="blr-invdist-sphere-D3-M131072-eps1e-3", task="blr",
         kernel="inverse-distance", m=131072, d=3, leaf=256, rank=64,
         eta=2.0, epsilon=1e-3, geometry="sphere"),
]


def main():
    runs = int(os.environ.get("KMB_BENCH_RUNS", "3"))
    full_suite = os.environ.get("KMB_BENCH_SUITE", "1") != "0"
    n_override = os.environ.get("KMB_BENCH_N")

    import jax
    backend = jax.default_backend()

    suite_cfgs = SUITE if full_suite else SUITE[:1]
    if n_override:
        suite_cfgs = [dict(suite_cfgs[0], n=int(n_override))
                      ] + list(suite_cfgs[1:])

    # CPU baselines, one per distinct (kernel, d, e, normalize) among the
    # product/attention entries.
    baselines = {}
    for cfg in suite_cfgs:
        if cfg["task"] in ("solver", "blr"):
            continue
        key = (cfg["kernel"], cfg["d"], cfg["e"],
               cfg.get("normalize_rows", False))
        if key in baselines:
            continue
        # Baselines are ~10ms CPU measurements with high run-to-run
        # variance; best-of-max(runs, 8) keeps the ratios stable.
        pps, t = baseline_product(
            kernel=cfg["kernel"], d=cfg["d"], e=cfg["e"],
            normalize_rows=cfg.get("normalize_rows", False),
            runs=max(runs, 8))
        baselines[key] = pps
        print(f"# baseline: BLAS f32 {cfg['kernel']} D={cfg['d']} "
              f"E={cfg['e']} N=M={D_BASE_N}: {t:.4f}s ({pps:.3e} pairs/s)",
              file=sys.stderr)

    suite = {}
    for cfg in suite_cfgs:
        if cfg["task"] == "blr":
            entry = run_blr(cfg, runs)
            print(f"# {cfg['name']} [{backend}]: build "
                  f"{entry['build_seconds']:.3f}s + query "
                  f"{entry['query_seconds']:.4f}s (exact "
                  f"{entry['exact_query_seconds']:.4f}s -> "
                  f"{entry['vs_baseline']:.1f}x; rmse "
                  f"{entry['rmse_vs_exact']:.2e}, compression "
                  f"{entry['compression']:.1f}x)", file=sys.stderr)
        elif cfg["task"] == "solver":
            entry = run_solver(cfg, runs)
            note = ("" if "vs_baseline" not in entry else
                    f"; plain CG {entry['plain_cg_seconds']:.4f}s/"
                    f"{entry['plain_cg_iterations']} iters at res "
                    f"{entry['plain_cg_relative_residual']:.2e} -> "
                    f"{entry['vs_baseline']:.2f}x")
            print(f"# {cfg['name']} [{backend}]: {entry['seconds']:.4f}s "
                  f"({entry['iterations']} iters, res "
                  f"{entry['relative_residual']:.2e}{note})",
                  file=sys.stderr)
        else:
            entry = run_product(cfg, runs)
            key = (cfg["kernel"], cfg["d"], cfg["e"],
                   cfg.get("normalize_rows", False))
            entry["vs_baseline"] = entry["pairs_per_second"] / baselines[key]
            entry["baseline"] = (f"host BLAS f32 bruteforce at N=M={D_BASE_N}"
                                 f" (pairs/s ratio)")
            print(f"# {cfg['name']} [{backend}]: {entry['seconds']:.4f}s "
                  f"({entry['pairs_per_second']:.3e} pairs/s, "
                  f"{entry['tflops']:.2f} TFLOP/s, "
                  f"{entry['vs_baseline']:.1f}x baseline)", file=sys.stderr)
        suite[cfg["name"]] = {**{k: v for k, v in cfg.items()
                                 if k != "name"}, **entry}

    out_path = os.environ.get("KMB_BENCH_OUT") or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_SUITE.json")
    with open(out_path, "w") as f:
        json.dump({"backend": backend, "runs": runs, "suite": suite}, f,
                  indent=2)

    head = suite[suite_cfgs[0]["name"]]
    print(json.dumps({
        "metric": f"gaussian-matvec-pairs-per-second-{backend}",
        "value": head["pairs_per_second"],
        "unit": "kernel pairs/s",
        "vs_baseline": head["vs_baseline"],
        "suite": {name: {k: entry[k] for k in
                         ("seconds", "vs_baseline") if k in entry}
                  for name, entry in suite.items()},
    }))


if __name__ == "__main__":
    main()
