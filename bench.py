"""Headline benchmark suite: the TPU engine vs host BLAS on all 3 tasks.

Prints exactly ONE JSON line on stdout:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N,
     "suite": {...}, "skipped": [...]}

The headline metric (value/vs_baseline) is the reference's headline
computation (reference bruteforce.py:113-153): the exact float32 Gaussian
kernel product a_i = sum_j exp(-|x_i-y_j|^2) b_j at N = M = 2^20 on one
chip — 1.1e12 exact kernel pairs, never materializing the 4 TB matrix K.

`suite` carries one entry per benchmarked configuration, spanning the
reference's three tasks (reference README.md:9-75), both TPU compute
regimes of the Pallas engine (VPU form at small D, MXU form at large D),
the bf16 / f32x3 / f32 precision tiers for product AND attention, the
ring schedule's single-chip overhead floor, the preconditioned solver
family (Nyström PCG, block-Jacobi, block-abs MINRES on the indefinite
kernel), mixed-precision iterative refinement, and the BLR (H-matrix
slot) product + solver.

Baselines are the reference's own engine semantics — float32 NumPy/BLAS
bruteforce (materialize K, then GEMM) — timed on this host's CPU at the
largest scale the reference benchmarks (N = M = 10^4, reference
datasets.py:383-427), expressed as kernel-pair evaluations per second.
vs_baseline = our pairs/s / baseline pairs/s (higher is better); bf16 and
f32x3 entries share the f32 CPU baseline (the reference treats low
precision as first-class Pareto entries, algos.yaml:157-162).  Solver and
BLR entries carry their own baselines (plain CG / exact engine), named in
each entry's "baseline" field.

BUDGET PROTOCOL (why this file never times out): entries run in priority
order — headline first, then the measurements unique to this round, then
breadth.  Before each entry, its estimated cost (calibrated by the
running measured/estimated ratio of the entries already completed) is
checked against a RESERVE fraction of KMB_BENCH_BUDGET seconds of total
wall clock; entries that don't fit are skipped LOUDLY into the "skipped"
list of BENCH_SUITE.json.  Expensive reusable baselines (the CPU BLAS
rows, the plain-Krylov solver baselines) are persisted to a committed
sidecar, BENCH_BASELINES.json, and recomputed only when absent — a
driver-budget run spends its seconds on the entries themselves.  A
SIGTERM/SIGINT handler emits the final JSON with whatever completed
before the process dies, so even a hard external timeout leaves a
parseable record.

The stdout JSON line is deliberately COMPACT (the driver captures a
bounded output tail; round 4's full-suite line overflowed it and parsed
as null) — per-entry numbers live in BENCH_SUITE.json, written
incrementally after every entry.

Environment knobs: KMB_BENCH_RUNS (default 2, the reference's best-of-N
protocol, main.py:121-129), KMB_BENCH_BUDGET (seconds), KMB_BENCH_SUITE=0
to run only the headline config, KMB_BENCH_ONLY=name1,name2 to run the
headline plus the named entries (unknown names abort loudly),
KMB_BENCH_N to override the headline N=M, KMB_BENCH_FULL=1 to include
the adaptive-epsilon BLR entries (their builds are minutes-long even
after the round-5 host-eigh rework — never inside a driver budget;
measured numbers live in artifacts/scale/BENCH_FULL_r04.json and the
round-5 calibration log artifacts/r05_bench_cal.err),
KMB_BENCH_REFRESH_BASELINES=1 to ignore the sidecar and re-measure
every baseline, KMB_COMPILE_CACHE=0 to disable the default persistent
compilation cache.
"""

from __future__ import annotations

import json
import os
import signal
import sys
import time

import numpy as np

D_BASE_N = int(os.environ.get("KMB_BENCH_BASELINE_N", "10000"))
# ^ reference's largest benchmarked scale (CPU baseline), datasets.py:383-427

START = time.perf_counter()
BUDGET = float(os.environ.get("KMB_BENCH_BUDGET", "960"))
# Entries only START while elapsed + calibrated estimate stays under
# RESERVE * BUDGET, so one optimistic estimate cannot push the total
# wall past the budget (the round-4 856s > 800s overrun).
RESERVE = 0.88

# Mutable run state shared with the signal handler so a hard external
# timeout still yields a parseable JSON record.
STATE = {"suite": {}, "skipped": [], "baselines": {}, "backend": "unknown",
         "runs": 0, "emitted": False, "est_ratio": 1.0}

BASELINES_PATH = os.environ.get("KMB_BENCH_BASELINES") or os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "BENCH_BASELINES.json")


def _load_baseline_sidecar():
    """Committed cache of expensive reusable baselines.

    {"product": {key: {...}}, "plain_solves": {key: [t, iters, res]}}.
    Keys embed every parameter that affects the measurement (incl. the
    backend for on-chip solver baselines), so a stale entry can only
    come from hardware drift — KMB_BENCH_REFRESH_BASELINES=1 re-measures.
    """
    if os.environ.get("KMB_BENCH_REFRESH_BASELINES") == "1":
        return {"product": {}, "plain_solves": {}}
    try:
        with open(BASELINES_PATH) as f:
            data = json.load(f)
        return {"product": dict(data.get("product", {})),
                "plain_solves": dict(data.get("plain_solves", {}))}
    except (OSError, ValueError):
        return {"product": {}, "plain_solves": {}}


SIDECAR = _load_baseline_sidecar()


def _save_baseline_sidecar():
    tmp = BASELINES_PATH + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"product": SIDECAR["product"],
                   "plain_solves": SIDECAR["plain_solves"]}, f, indent=2,
                  sort_keys=True)
    os.replace(tmp, BASELINES_PATH)


def elapsed() -> float:
    return time.perf_counter() - START


def emit_json():
    """Print the single headline JSON line (idempotent).

    COMPACT by design: the driver that invokes bench.py keeps only a
    bounded tail of the output, and round 4's line — which inlined the
    whole suite — overflowed it and was recorded as unparseable.  The
    per-entry record lives in BENCH_SUITE.json.
    """
    if STATE["emitted"]:
        return
    STATE["emitted"] = True
    suite = STATE["suite"]
    head_name = SUITE[0]["name"]
    head = suite.get(head_name)

    def _r(x):
        return None if x is None else float(f"{x:.6g}")

    out = {
        "metric": f"gaussian-matvec-pairs-per-second-{STATE['backend']}",
        "value": _r(head["pairs_per_second"]) if head else None,
        "unit": "kernel pairs/s",
        "vs_baseline": _r(head.get("vs_baseline")) if head else None,
        "suite_measured": len(suite),
        "suite_skipped": len(STATE["skipped"]),
        "wall_seconds": _r(elapsed()),
    }
    print(json.dumps(out), flush=True)


def _sig_handler(signum, frame):
    print(f"# bench: caught signal {signum} at {elapsed():.0f}s — "
          f"emitting partial record", file=sys.stderr, flush=True)
    STATE["skipped"].append({"name": "<interrupted>",
                             "reason": f"signal {signum}"})
    write_suite_json()
    emit_json()
    os._exit(1)


def write_suite_json():
    out_path = os.environ.get("KMB_BENCH_OUT") or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_SUITE.json")
    with open(out_path, "w") as f:
        json.dump({"backend": STATE["backend"], "runs": STATE["runs"],
                   "budget_seconds": BUDGET, "wall_seconds": elapsed(),
                   "suite": STATE["suite"], "skipped": STATE["skipped"]},
                  f, indent=2)


def _fast_normal(rng, shape):
    """Box-Muller standard normals from uniform draws, float32.

    This host's ziggurat `standard_normal` runs at ~3M draws/s (measured
    — ~60x below its `random` uniform rate), turning the D=784 point
    cloud (1e8 draws) into a hidden 30-90s per-entry cost.  Box-Muller
    over vectorized uniforms generates the same distribution at
    ~50M draws/s.
    """
    count = int(np.prod(shape))
    half = (count + 1) // 2
    u1 = rng.random(half, dtype=np.float32)
    u2 = rng.random(half, dtype=np.float32)
    r = np.sqrt(-2.0 * np.log(np.maximum(u1, np.float32(1e-30))))
    theta = np.float32(2.0 * np.pi) * u2
    out = np.concatenate([r * np.cos(theta), r * np.sin(theta)])[:count]
    return out.reshape(shape)


def _staged_arrays(n, d, e):
    """Device-resident (x, b) for an entry, reused across entries.

    Staging is the other hidden per-entry cost: the D=784 cloud is
    411 MB, ~25s over the tunneled chip, and the bf16/f32x3/f32 tier
    entries of one shape re-staged identical data.  One-slot cache:
    entries are ordered so equal shapes are adjacent.
    """
    import jax
    import jax.numpy as jnp
    from kmb_tpu.utils import hard_fence

    key = (n, d, e)
    cached = STATE.get("staged")
    if cached is not None and cached[0] == key:
        return cached[1], cached[2]
    STATE["staged"] = None  # drop the old buffers before staging new ones
    # Generated ON DEVICE: the D=784 cloud is 411 MB, ~50-130s to push
    # over the tunneled chip (measured, artifacts/r05_xfer_probe.py) and
    # milliseconds to generate there.  Rates are data-independent, so
    # the provenance of the standard-normal cloud does not matter.
    kx, kb = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(kx, (n, d), jnp.float32) / np.sqrt(d)
    b = jax.random.normal(kb, (n, e), jnp.float32)
    hard_fence((x, b))
    STATE["staged"] = (key, x, b)
    return x, b


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
    """Reference-semantics float32 BLAS bruteforce on the host CPU.

    Computed lazily, once per (kernel, d, e, normalize) key, shared by
    every product/attention entry with that key — and persisted to the
    committed BENCH_BASELINES.json sidecar, so driver-budget runs spend
    no wall clock re-measuring the host (the round-4 overrun spent
    ~60-100s here).
    """
    key = (kernel, d, e, normalize_rows)
    if key in STATE["baselines"]:
        return STATE["baselines"][key]
    skey = f"{kernel}|D{d}|E{e}|norm{int(normalize_rows)}|N{D_BASE_N}"
    cached = SIDECAR["product"].get(skey)
    if cached is not None:
        STATE["baselines"][key] = cached["pairs_per_second"]
        print(f"# baseline (sidecar): BLAS f32 {kernel} D={d} E={e} "
              f"N=M={D_BASE_N}: {cached['pairs_per_second']:.3e} pairs/s",
              file=sys.stderr, flush=True)
        return cached["pairs_per_second"]
    from kmb_tpu.algorithms.bruteforce_numpy import BruteForceProductBLAS

    n = D_BASE_N
    rng = np.random.default_rng(0)
    pts = _fast_normal(rng, (n, d)).astype(np.float64) / np.sqrt(d)
    sig = _fast_normal(rng, (n, e)).astype(np.float64)
    algo = BruteForceProductBLAS(
        kernel=kernel, dimension=d, precision="float32",
        normalize_rows=normalize_rows, fast_sqdists=True)
    algo.prepare_data(source_points=pts, target_points=pts,
                      same_points=True)
    algo.fit()
    algo.prepare_query(source_signal=sig)
    # Baselines are ~10ms CPU measurements with high run-to-run variance;
    # best-of-max(runs, 8) keeps the ratios stable.
    t = _best_of(algo.query, max(runs, 8))
    algo.done()
    pps = _pairs(n, n) / t
    STATE["baselines"][key] = pps
    SIDECAR["product"][skey] = {"pairs_per_second": pps, "seconds": t}
    _save_baseline_sidecar()
    print(f"# baseline: BLAS f32 {kernel} D={d} E={e} N=M={D_BASE_N}: "
          f"{t:.4f}s ({pps:.3e} pairs/s)", file=sys.stderr, flush=True)
    return pps


# -- TPU engine configurations ------------------------------------------------

def run_product(cfg, runs):
    import jax
    import jax.numpy as jnp

    from kmb_tpu.ops.product import kernel_matvec
    from kmb_tpu.utils import hard_fence

    n, d, e = cfg["n"], cfg["d"], cfg["e"]
    x, b = _staged_arrays(n, d, e)

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
    pps = _pairs(n, n) / t
    base = baseline_product(
        kernel=cfg["kernel"], d=d, e=e,
        normalize_rows=cfg.get("normalize_rows", False), runs=runs)
    return {
        "seconds": t,
        "pairs_per_second": pps,
        "tflops": _flops(n, n, d, e) / t / 1e12,
        "vs_baseline": pps / base,
        "baseline": (f"host BLAS f32 bruteforce at N=M={D_BASE_N} "
                     f"(pairs/s ratio)"),
    }


def run_blr(cfg, runs):
    """BLR (H-matrix slot) vs the exact streaming engine on the same data.

    vs_baseline = exact engine query time / BLR query time (the Htool
    value proposition: compressed matvec beats dense once built,
    reference htool.py:15-165); rmse_vs_exact reports the accuracy cost.
    The build is timed on its first (and only) construction, so
    build_seconds includes one-time compilation — the best-of-N protocol
    elsewhere already shows warm numbers, and a second full build just
    for timing starved the round-3 budget.
    """
    import jax
    import jax.numpy as jnp

    from kmb_tpu.ops.blr import BlrOperator
    from kmb_tpu.ops.product import kernel_matvec
    from kmb_tpu.utils import hard_fence

    m, d = cfg["m"], cfg["d"]
    rng = np.random.default_rng(0)
    if cfg.get("geometry", "cube") == "sphere":
        # BEM home turf (reference htool.py:9-12): a 2-D SURFACE in 3-D.
        # Surface point clouds are what H-matrix compression is built
        # for — far-field admissible pairs dominate; a volume cloud
        # (uniform cube) compresses measurably worse.
        assert d == 3, "fibonacci_sphere generates 3-D points"
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

    t0 = time.perf_counter()
    op = BlrOperator(y, y, kernel_name=cfg["kernel"], leaf=cfg["leaf"],
                     rank=cfg["rank"], eta=cfg["eta"],
                     epsilon=cfg.get("epsilon"), same_points=True)
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
        "build_includes_compile": True,
        "query_seconds": t_query,
        "exact_query_seconds": t_exact,
        "rmse_vs_exact": rmse,
        "compression": op.compression,
        "pairs_per_second": _pairs(m, m) / t_query,
        "vs_baseline": t_exact / t_query,
        "baseline": "exact Pallas streaming engine, same data and chip",
    }


def _solver_points(cfg):
    import jax
    import jax.numpy as jnp
    from kmb_tpu.utils import hard_fence

    m, d, e = cfg["m"], cfg["d"], cfg["e"]
    rng = np.random.default_rng(0)
    if cfg.get("geometry") == "sphere":
        # Surface geometry (the harness's at-scale invdist system).
        assert d == 3, "fibonacci_sphere generates 3-D points"
        from kmb_tpu.datasets import fibonacci_sphere
        y = jax.device_put(jnp.asarray(
            fibonacci_sphere(m).astype(np.float32)))
    else:
        y = jax.device_put(jnp.asarray(rng.random((m, d)), jnp.float32))
    b_true = jax.device_put(jnp.asarray(
        rng.standard_normal((m, e)), jnp.float32))
    hard_fence((y, b_true))
    return y, b_true


def _plain_solve_baseline(cfg, matvec, rhs):
    """Warm + timed plain Krylov solve, cached per system.

    Round 3 re-timed this from scratch for every preconditioned entry on
    the same system (~94 s wasted); the in-process cache shares it and
    the BENCH_BASELINES.json sidecar persists it across invocations
    (keyed by backend: it is a chip measurement) — the round-4 driver
    run spent ~56 s here alone.
    """
    from kmb_tpu.ops.solve import cg_solve
    from kmb_tpu.utils import hard_fence

    key = (cfg["kernel"], cfg["m"], cfg["d"], cfg["e"], cfg["tol"],
           cfg["precision"], cfg.get("geometry", "cube"))
    cache = STATE.setdefault("plain_solves", {})
    if key in cache:
        return cache[key]
    skey = (f"{cfg['kernel']}|M{cfg['m']}|D{cfg['d']}|E{cfg['e']}|"
            f"tol{cfg['tol']:g}|{cfg['precision']}|"
            f"{cfg.get('geometry', 'cube')}|{STATE['backend']}")
    cached = SIDECAR["plain_solves"].get(skey)
    if cached is not None:
        out = (float(cached[0]), int(cached[1]), float(cached[2]))
        cache[key] = out
        print(f"# plain-solve baseline (sidecar): {skey}: {out[0]:.2f}s, "
              f"{out[1]} iters, res {out[2]:.2e}",
              file=sys.stderr, flush=True)
        return out

    def solve():
        return hard_fence(cg_solve(
            None, rhs, kernel_name=cfg["kernel"],
            precision=cfg["precision"], tol=cfg["tol"],
            max_iters=cfg["max_iters"], matvec=matvec))

    solve()  # compile + warm (best-of-N protocol, runs=1)
    t0 = time.perf_counter()
    _, iters, res = solve()
    out = (time.perf_counter() - t0, int(iters), float(res))
    cache[key] = out
    SIDECAR["plain_solves"][skey] = list(out)
    _save_baseline_sidecar()
    return out


def run_solver(cfg, runs):
    """Matrix-free Krylov solves at TPU scale.

    Preconditioned variants report vs_baseline = plain-solve seconds /
    (build + solve) seconds on the same system; iterative-refinement
    variants report vs_baseline = plain relative residual / refined
    relative residual (an ACCURACY multiple — the row exists to show the
    float32 floor being broken, reference accuracy bar
    bruteforce.py:205-207).

    Solves are timed once after a warm compile run (not best-of-N: a
    single solve is tens of seconds and run-to-run variance is far below
    the effects measured).  Preconditioner builds (Nyström, block-
    Jacobi) are timed WARM — one compile build, one timed build, a few
    seconds each, matching the harness best-of-N protocol; only the BLR
    compression build is timed cold with its compile included
    (build_includes_compile), because a second ~20 s full build is pure
    budget waste (the round-3 lesson) and its vs_baseline compares
    solve times, not builds.
    """
    import functools

    from kmb_tpu.ops.product import kernel_matvec
    from kmb_tpu.ops.solve import (NormalEquationsOp, SPD_KERNELS,
                                   apply_nystrom_precond, cg_solve,
                                   ir_solve, nystrom_preconditioner)
    from kmb_tpu.utils import hard_fence

    y, b_true = _solver_points(cfg)
    m = cfg["m"]
    tol, rank = cfg["tol"], cfg.get("precond_rank", 0)

    def matvec(v):
        return kernel_matvec(y, y, v, kernel_name=cfg["kernel"],
                             precision=cfg["precision"])

    rhs = hard_fence(matvec(b_true))  # consistent K b = rhs system

    t_plain, plain_iters, plain_res = _plain_solve_baseline(cfg, matvec, rhs)
    entry = {
        "plain_seconds": t_plain,
        "plain_iterations": plain_iters,
        "plain_relative_residual": plain_res,
    }

    mode = cfg.get("mode", "nystrom" if rank else "plain")
    if mode == "plain":
        return {**entry, "seconds": t_plain, "iterations": plain_iters,
                "relative_residual": plain_res}

    if mode == "ir":
        # Mixed-precision iterative refinement: f64 host residuals
        # around f32 preconditioned correction solves (ops/solve.py
        # ir_solve).  rhs is lifted to f64 THROUGH the same f32 values
        # so the refined system is the one the plain solve saw.
        precond = None
        t_build = 0.0
        if rank:
            op = (matvec if cfg["kernel"] in SPD_KERNELS
                  else NormalEquationsOp(matvec))
            hard_fence(nystrom_preconditioner(op, m, rank))  # compile
            t0 = time.perf_counter()
            u, lam = hard_fence(nystrom_preconditioner(op, m, rank))
            t_build = time.perf_counter() - t0
            precond = functools.partial(apply_nystrom_precond, u, lam)
        rhs64 = np.asarray(rhs, dtype=np.float64)
        t0 = time.perf_counter()
        _, info = ir_solve(
            y, rhs64, kernel_name=cfg["kernel"],
            precision=cfg["precision"], tol=tol,
            max_iters=cfg["max_iters"],
            inner_tol=cfg.get("inner_tol", 1e-5),
            refine_iters=cfg.get("refine_iters", 3),
            matvec=matvec, precond=precond)
        t_ir = time.perf_counter() - t0
        res = info["relative_residual"]
        return {
            **entry,
            "seconds": t_build + t_ir,
            "build_seconds": t_build,
            "solve_seconds": t_ir,
            "iterations": info["inner_iterations"],
            "outer_iterations": info["outer_iterations"],
            "relative_residual": res,
            "vs_baseline": plain_res / max(res, 1e-30),
            "baseline": ("plain f32 CG relative residual on the same "
                         "system (ACCURACY multiple, not a speedup)"),
        }

    if mode == "jacobi":
        from kmb_tpu.ops.solve import block_jacobi_preconditioner

        def build():
            p = block_jacobi_preconditioner(
                np.asarray(y), kernel_name=cfg["kernel"],
                leaf=cfg.get("leaf", 512))
            hard_fence(p.args[0])
            return p

        build()  # compile (the batched-eigh jit dwarfs the build itself)
        t0 = time.perf_counter()
        precond = build()
        t_build = time.perf_counter() - t0
        # The block-abs factors precondition K itself: SPD kernels run
        # PCG, the indefinite inverse-distance kernel runs
        # preconditioned MINRES (NOT the K^2 normal equations).
        method = ("auto" if cfg["kernel"] in SPD_KERNELS else "minres")

        def solve():
            return hard_fence(cg_solve(
                y, rhs, kernel_name=cfg["kernel"],
                precision=cfg["precision"], tol=tol,
                max_iters=cfg["max_iters"], matvec=matvec,
                precond=precond, indefinite_method=method))

        solve()  # compile + warm
        t0 = time.perf_counter()
        _, iters, res = solve()
        t_pcg = time.perf_counter() - t0
        # Honestly framed as an ACCURACY point (round-3 verdict): on the
        # slowly-decaying absolute-exponential spectrum, plain f32 CG
        # STALLS an order of magnitude above tolerance; block-Jacobi
        # buys residual, not wall-clock (time_ratio reports the speed
        # side separately).
        return {
            **entry,
            "seconds": t_build + t_pcg,
            "build_seconds": t_build,
            "solve_seconds": t_pcg,
            "iterations": int(iters),
            "relative_residual": float(res),
            "vs_baseline": plain_res / max(float(res), 1e-30),
            "time_ratio": t_plain / (t_build + t_pcg),
            "baseline": ("plain f32 Krylov relative residual on the same "
                         "system (ACCURACY multiple; time_ratio is the "
                         "wall-clock side)"),
        }

    if mode == "blr":
        # H-matrix-accelerated solve: MINRES rides the compressed BLR
        # matvec (ops/blr.py matvec_device).  vs_baseline compares the
        # SOLVE times at the same tolerance; the compression build is
        # reported separately (and honestly) as the fit cost.
        from kmb_tpu.ops.blr import BlrOperator
        from kmb_tpu.ops.solve import _minres, _split_static

        t0 = time.perf_counter()
        op = BlrOperator(np.asarray(y), np.asarray(y),
                         kernel_name=cfg["kernel"], leaf=cfg["leaf"],
                         rank=cfg["rank"], eta=cfg["eta"],
                         epsilon=cfg.get("epsilon"), same_points=True)
        for u, _v, _j, _seg in op.far_groups:
            hard_fence(u)
        t_build = time.perf_counter() - t0

        # matvec_partial: factors as runtime args, not module constants
        # (the remote-compile payload cap, ops/solve.py _split_static).
        matvec_fn, matvec_args = _split_static(op.matvec_partial())

        def solve():
            return _minres(matvec_fn, rhs, tol, cfg["max_iters"],
                           matvec_args=matvec_args)

        solve()  # compile + warm
        t0 = time.perf_counter()
        sol, iters, res_blr = solve()
        t_solve = time.perf_counter() - t0
        # True residual of the BLR solution against the exact K.
        kb = np.asarray(hard_fence(matvec(sol)), dtype=np.float64)
        rhs64 = np.asarray(rhs, dtype=np.float64)
        true_res = float(np.linalg.norm(rhs64 - kb)
                         / np.linalg.norm(rhs64))
        return {
            **entry,
            "seconds": t_build + t_solve,
            "build_seconds": t_build,
            "build_includes_compile": True,
            "solve_seconds": t_solve,
            "iterations": int(iters),
            "relative_residual": float(res_blr),
            "true_relative_residual": true_res,
            "compression": op.compression,
            "vs_baseline": t_plain / t_solve,
            "baseline": ("plain exact-matvec Krylov SOLVE time at the "
                         "same tolerance (build reported separately)"),
        }

    # mode == "nystrom": spectral preconditioner over the operator CG
    # iterates on (K, or K^2 via the normal equations for the indefinite
    # inverse-distance kernel).
    op = (matvec if cfg["kernel"] in SPD_KERNELS
          else NormalEquationsOp(matvec))
    hard_fence(nystrom_preconditioner(op, m, rank))  # compile (QDWH-heavy)
    t0 = time.perf_counter()
    u, lam = hard_fence(nystrom_preconditioner(op, m, rank))
    t_build = time.perf_counter() - t0
    precond = functools.partial(apply_nystrom_precond, u, lam)

    def solve():
        return hard_fence(cg_solve(
            y, rhs, kernel_name=cfg["kernel"], precision=cfg["precision"],
            tol=tol, max_iters=cfg["max_iters"], matvec=matvec,
            precond=precond))

    solve()  # compile + warm
    t0 = time.perf_counter()
    _, iters, res = solve()
    t_pcg = time.perf_counter() - t0
    return {
        **entry,
        "seconds": t_build + t_pcg,
        "build_seconds": t_build,
        "solve_seconds": t_pcg,
        "iterations": int(iters),
        "relative_residual": float(res),
        "vs_baseline": t_plain / (t_build + t_pcg),
        "baseline": ("plain (unpreconditioned) Krylov solve, same engine "
                     "and chip"),
    }


# Priority-ordered suite: the headline trio first, then the rows the
# round's record must carry (IR at scale, the BLR slot, the MXU-regime
# flagship), then breadth ordered cheap-first (f32x3 follow-ups reuse
# the tier's compiled form), then the heavy preconditioned-solver tail.
# "est" is the per-entry wall-clock estimate (compile + runs), seeded
# from round-4 measured walls net of the now-sidecar'd baselines; the
# budget gate scales it by the running measured/estimate ratio.
SUITE = [
    # -- headline + VPU-form regime (small D) --------------------------------
    dict(name="product-gaussian-D3-E1-f32", task="product",
         kernel="gaussian", n=2**20, d=3, e=1, precision="float32",
         est=40),
    dict(name="product-gaussian-D3-E1-bf16", task="product",
         kernel="gaussian", n=2**20, d=3, e=1, precision="bfloat16",
         est=12),
    # Ring-schedule overhead floor (1 device): tracks the multi-chip
    # context-parallel path against the direct engine above.
    dict(name="product-gaussian-D3-E1-f32-ring", task="product",
         kernel="gaussian", n=2**20, d=3, e=1, precision="float32",
         schedule="ring", est=18),
    # -- required record rows ------------------------------------------------
    # Indefinite-system mixed-precision IR: f64 host residuals over
    # plain-MINRES inner solves — the measured accuracy winner on the
    # inverse-distance system (the harness M=131072 row reaches RMSE
    # 0.025 vs the 0.073 plain-MINRES recovery floor).
    dict(name="solver-ir-minres-invdist-sphere-D3-M32768-f32",
         task="solver", kernel="inverse-distance", m=32768, d=3, e=1,
         precision="float32", tol=1e-9, max_iters=600, mode="ir",
         precond_rank=0, refine_iters=4, inner_tol=1e-4,
         geometry="sphere", est=70),
    # Mixed-precision iterative refinement AT SCALE (M=65536): float64
    # host residuals around Nyström-preconditioned f32 correction
    # solves break the f32 Krylov floor by orders of magnitude (the
    # plain-CG-inner variant only reaches ~6x — its inner solves stall
    # at the absexp f32 floor each outer pass; with the spectral
    # preconditioner the inner actually hits inner_tol and each pass
    # contracts by ~1e-5).  vs_baseline is an ACCURACY multiple, not a
    # speedup.  The build compiles fast under the default compile cache.
    dict(name="solver-ir-nystrom-absexp-D3-M65536-f32", task="solver",
         kernel="absolute-exponential", m=65536, d=3, e=1,
         precision="float32", tol=1e-9, max_iters=600, mode="ir",
         precond_rank=512, refine_iters=4, inner_tol=1e-5, est=150),
    # Fixed-rank BLR (randomized range-finder, no QDWH): compiles in
    # seconds, so the H-matrix slot appears in driver-budget runs too
    # (the adaptive-epsilon rows need KMB_BENCH_FULL=1).
    # rank capped at 16: fixed-rank keeps FULL-rank factors for every
    # far pair (no epsilon truncation) — rank 64 at this M is ~13 GB of
    # factors, past the 16 GB HBM (measured RESOURCE_EXHAUSTED).
    dict(name="blr-invdist-sphere-D3-M131072-rank16", task="blr",
         kernel="inverse-distance", m=131072, d=3, leaf=256, rank=16,
         eta=2.0, geometry="sphere", est=45),
    # -- breadth, grouped by STAGED SHAPE (n, d, e): entries sharing a
    # shape reuse the device-resident points (_staged_arrays one-slot
    # cache) — the D=784 cloud alone is 411 MB / ~25s over the tunnel,
    # and host normal generation is the other per-shape fixed cost.
    # MXU-regime flagship first within its group.
    dict(name="product-gaussian-D784-E1-bf16", task="product",
         kernel="gaussian", n=2**17, d=784, e=1, precision="bfloat16",
         est=15),
    dict(name="product-gaussian-D784-E1-f32x3", task="product",
         kernel="gaussian", n=2**17, d=784, e=1, precision="float32x3",
         est=8),
    dict(name="product-gaussian-D784-E1-f32", task="product",
         kernel="gaussian", n=2**17, d=784, e=1, precision="float32",
         est=10),
    dict(name="attention-exponential-D25-E1-bf16", task="attention",
         kernel="exponential", n=2**19, d=25, e=1, precision="bfloat16",
         normalize_rows=True, est=15),
    dict(name="attention-exponential-D25-E1-f32x3", task="attention",
         kernel="exponential", n=2**19, d=25, e=1, precision="float32x3",
         normalize_rows=True, est=30),
    dict(name="attention-exponential-D25-E1-f32", task="attention",
         kernel="exponential", n=2**19, d=25, e=1, precision="float32",
         normalize_rows=True, est=16),
    dict(name="product-gaussian-D25-E1-f32x3", task="product",
         kernel="gaussian", n=2**19, d=25, e=1, precision="float32x3",
         est=10),
    dict(name="product-gaussian-D25-E1-f32", task="product",
         kernel="gaussian", n=2**19, d=25, e=1, precision="float32",
         est=14),
    dict(name="attention-exponential-D3-E1-f32", task="attention",
         kernel="exponential", n=2**19, d=3, e=1, precision="float32",
         normalize_rows=True, est=14),
    dict(name="product-gaussian-D64-E1-f32x3", task="product",
         kernel="gaussian", n=2**19, d=64, e=1, precision="float32x3",
         est=14),
    dict(name="product-gaussian-D64-E8-f32x3", task="product",
         kernel="gaussian", n=2**19, d=64, e=8, precision="float32x3",
         est=28),
    dict(name="product-gaussian-D64-E8-f32", task="product",
         kernel="gaussian", n=2**19, d=64, e=8, precision="float32",
         est=22),
    dict(name="product-gaussian-D64-E8-bf16", task="product",
         kernel="gaussian", n=2**19, d=64, e=8, precision="bfloat16",
         est=8),
    dict(name="attention-exponential-D64-E8-f32x3", task="attention",
         kernel="exponential", n=2**19, d=64, e=8, precision="float32x3",
         normalize_rows=True, est=14),
    dict(name="attention-exponential-D64-E8-f32", task="attention",
         kernel="exponential", n=2**19, d=64, e=8, precision="float32",
         normalize_rows=True, est=22),
    dict(name="attention-exponential-D64-E8-bf16", task="attention",
         kernel="exponential", n=2**19, d=64, e=8, precision="bfloat16",
         normalize_rows=True, est=20),
    # -- heavy preconditioned-solver tail ------------------------------------
    dict(name="solver-cg-nystrom-absexp-D3-M131072-f32", task="solver",
         kernel="absolute-exponential", m=131072, d=3, e=1,
         precision="float32", tol=1e-5, max_iters=600, precond_rank=512,
         est=190),
    # Block-Jacobi on the same system (shares the plain baseline above).
    # leaf=1024 is the tuned config (512 halves the block coupling and
    # costs 2.4x the iterations); vs_baseline is an ACCURACY multiple —
    # plain f32 CG stalls at 2.6e-4 while block-Jacobi converges 10x
    # lower at ~1x the wall-clock (time_ratio).
    dict(name="solver-cg-jacobi-absexp-D3-M131072-f32", task="solver",
         kernel="absolute-exponential", m=131072, d=3, e=1,
         precision="float32", tol=1e-5, max_iters=600, mode="jacobi",
         leaf=1024, est=125),
    # Nystrom rank is a real tuning knob: on the wide D=3 Gaussian system
    # rank 256 wins ~2x while rank 512 is pure overhead; the
    # slow-spectral-decay kernels are where preconditioning earns its
    # keep: plain CG stalls above tolerance while PCG converges, faster.
    dict(name="solver-cg-nystrom-gaussian-D3-M131072-f32", task="solver",
         kernel="gaussian", m=131072, d=3, e=1, precision="float32",
         tol=1e-5, max_iters=600, precond_rank=256, est=80),
    # Preconditioned MINRES on the indefinite system, sphere geometry —
    # kept as an honest NEGATIVE record: on a uniform surface the
    # diagonal kernel blocks do not dominate and block-abs MINRES
    # converges worse than plain (the preconditioner pays on clustered
    # geometries, tests/test_ops.py).
    dict(name="solver-minres-jacobi-invdist-sphere-D3-M65536-f32",
         task="solver", kernel="inverse-distance", m=65536, d=3, e=1,
         precision="float32", tol=1e-4, max_iters=600, mode="jacobi",
         leaf=512, geometry="sphere", est=100),
    # -- KMB_BENCH_FULL only -------------------------------------------------
    # The adaptive-epsilon compression build compiles its QDWH-heavy
    # batched SVD for ~14 minutes cold — far past any driver budget, so
    # these run only under KMB_BENCH_FULL=1 with a raised
    # KMB_BENCH_BUDGET (the committed artifacts/scale/BENCH_FULL_r04.json
    # carries their measured numbers).
    dict(name="blr-invdist-sphere-D3-M131072-eps1e-3", task="blr",
         kernel="inverse-distance", m=131072, d=3, leaf=256, rank=64,
         eta=2.0, epsilon=1e-3, geometry="sphere", est=900, full_only=True),
    dict(name="solver-blr-invdist-D3-M65536-eps1e-4", task="solver",
         kernel="inverse-distance", m=65536, d=3, e=1,
         precision="float32", tol=1e-4, max_iters=600, mode="blr",
         leaf=256, rank=64, eta=2.0, epsilon=1e-4, est=999,
         full_only=True),
]


def _echo(cfg, entry, backend):
    name = f"{cfg['name']} [wall {entry.get('wall_seconds', 0):.0f}s]"
    if cfg["task"] == "blr":
        print(f"# {name} [{backend}]: build {entry['build_seconds']:.3f}s"
              f" + query {entry['query_seconds']:.4f}s (exact "
              f"{entry['exact_query_seconds']:.4f}s -> "
              f"{entry['vs_baseline']:.1f}x; rmse "
              f"{entry['rmse_vs_exact']:.2e}, compression "
              f"{entry['compression']:.1f}x)", file=sys.stderr, flush=True)
    elif cfg["task"] == "solver":
        note = ("" if "vs_baseline" not in entry else
                f"; plain {entry['plain_seconds']:.4f}s/"
                f"{entry['plain_iterations']} iters at res "
                f"{entry['plain_relative_residual']:.2e} -> "
                f"{entry['vs_baseline']:.2f}x")
        print(f"# {name} [{backend}]: {entry['seconds']:.4f}s "
              f"({entry['iterations']} iters, res "
              f"{entry['relative_residual']:.2e}{note})",
              file=sys.stderr, flush=True)
    else:
        print(f"# {name} [{backend}]: {entry['seconds']:.4f}s "
              f"({entry['pairs_per_second']:.3e} pairs/s, "
              f"{entry['tflops']:.2f} TFLOP/s, "
              f"{entry['vs_baseline']:.1f}x baseline)",
              file=sys.stderr, flush=True)


def main():
    runs = int(os.environ.get("KMB_BENCH_RUNS", "2"))
    full_suite = os.environ.get("KMB_BENCH_SUITE", "1") != "0"
    n_override = os.environ.get("KMB_BENCH_N")
    STATE["runs"] = runs

    signal.signal(signal.SIGTERM, _sig_handler)
    signal.signal(signal.SIGINT, _sig_handler)

    # Persistent compilation cache, on by default for bench runs (set
    # KMB_COMPILE_CACHE=0 to disable): round-5 probes validated
    # populate AND fresh-process load on the tunneled chip (load 0.3s
    # vs 1.5-140s compiles), so a calibration run's cache makes every
    # later run's compiles near-free.
    if os.environ.get("KMB_COMPILE_CACHE", "") == "":
        os.environ["KMB_COMPILE_CACHE"] = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    elif os.environ["KMB_COMPILE_CACHE"] == "0":
        del os.environ["KMB_COMPILE_CACHE"]

    import kmb_tpu  # noqa: F401  (honors KMB_PLATFORM before backend init)
    import jax
    backend = jax.default_backend()
    STATE["backend"] = backend

    suite_cfgs = SUITE if full_suite else SUITE[:1]
    if os.environ.get("KMB_BENCH_FULL") != "1":
        suite_cfgs = [c for c in suite_cfgs if not c.get("full_only")]
    only = os.environ.get("KMB_BENCH_ONLY")
    if only:
        keep = {s.strip() for s in only.split(",") if s.strip()}
        known = {c["name"] for c in SUITE}
        unknown = sorted(keep - known)
        if unknown:
            # A typo'd filter must not silently become a full-budget
            # sweep: abort loudly with the valid names.
            print(f"# KMB_BENCH_ONLY names not in the suite: {unknown}\n"
                  f"# valid names: {sorted(known)}",
                  file=sys.stderr, flush=True)
            sys.exit(2)
        picked = [c for c in SUITE if c["name"] in keep]
        # The headline entry always leads (emit_json needs it).
        if picked and picked[0]["name"] != SUITE[0]["name"]:
            picked = [SUITE[0]] + picked
        suite_cfgs = picked
    if n_override:
        suite_cfgs = [dict(suite_cfgs[0], n=int(n_override))
                      ] + list(suite_cfgs[1:])

    # Budget gate calibration: the running ratio of measured wall to the
    # a-priori estimate, applied to every later estimate (never below
    # 1.0 — optimism is the failure mode the reserve exists to absorb).
    ratios = []
    for i, cfg in enumerate(suite_cfgs):
        est = cfg.get("est", 60)
        ratio = STATE["est_ratio"]
        est_cal = est * ratio
        # The headline entry always runs; later entries must fit within
        # the RESERVE fraction of the budget (checked BEFORE starting —
        # nothing can preempt an entry once its chip work is dispatched).
        if i > 0 and elapsed() + est_cal > RESERVE * BUDGET:
            STATE["skipped"].append({
                "name": cfg["name"],
                "reason": (f"budget: {elapsed():.0f}s elapsed + "
                           f"{est_cal:.0f}s est > "
                           f"{RESERVE * BUDGET:.0f}s reserve")})
            print(f"# SKIP {cfg['name']}: budget ({elapsed():.0f}s + "
                  f"~{est_cal:.0f}s > {RESERVE * BUDGET:.0f}s reserve)",
                  file=sys.stderr, flush=True)
            continue
        t_entry = time.perf_counter()
        try:
            if cfg["task"] == "blr":
                entry = run_blr(cfg, runs)
            elif cfg["task"] == "solver":
                entry = run_solver(cfg, runs)
            else:
                entry = run_product(cfg, runs)
        except Exception as exc:  # keep the record alive past one bad row
            STATE["skipped"].append({"name": cfg["name"],
                                     "reason": f"error: {exc!r}"})
            print(f"# FAIL {cfg['name']}: {exc!r}", file=sys.stderr,
                  flush=True)
            if i == 0:
                raise  # a dead headline is a dead bench
            continue
        entry["wall_seconds"] = time.perf_counter() - t_entry
        # Feed the measured cost back into the gate (entries under ~15s
        # are mostly noise around process overheads — skip those).
        # Ratios below 1 are real too: with a warm compile cache and
        # populated baseline sidecar, measured walls run well under the
        # cold estimates, and the gate should admit the tail instead of
        # skipping entries that would fit.
        if est >= 15:
            ratios.append(entry["wall_seconds"] / est)
            med = sorted(ratios)[len(ratios) // 2]
            STATE["est_ratio"] = min(2.5, max(0.4, med))
        _echo(cfg, entry, backend)
        STATE["suite"][cfg["name"]] = {
            **{k: v for k, v in cfg.items() if k not in ("name", "est")},
            **entry}
        write_suite_json()  # persist incrementally: a kill loses nothing

    write_suite_json()
    emit_json()


if __name__ == "__main__":
    main()
