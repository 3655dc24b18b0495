"""kmb_tpu — a TPU-native kernel-matrix computation engine and benchmark harness.

A from-scratch rebuild of the capabilities of
`kernel-matrix-benchmarks/kernel-matrix-benchmarks` (reference mounted at
/root/reference), designed TPU-first:

- The three benchmark tasks (reference README.md:9-75):
    * product:   a_i = sum_j k(x_i, y_j) * b_j
    * attention: row-normalized product (normalize_rows=True)
    * solver:    b = K^-1 a  (N == M)
- A kernel zoo (gaussian / absolute-exponential / inverse-distance /
  exponential) matching reference bruteforce.py:8-22 semantics exactly.
- An HDF5 dataset layer with float64 ground truth (reference datasets.py).
- A lifecycle algorithm API + YAML experiment definitions + best-of-N
  timing runner + HDF5 result store + Pareto metrics/plots/website
  (reference base.py / definitions.py / runner.py / results.py / plotting/).

The new TPU compute path lives in `kmb_tpu.ops` (Pallas tiled kernels,
online-softmax attention, matrix-free CG) and `kmb_tpu.parallel`
(jax.sharding mesh + shard_map + psum/ppermute collectives), and plugs into
the harness as first-class algorithms in `kmb_tpu.algorithms.tpu_engine`.
"""

__version__ = "0.1.0"

import os as _os

# Backend override honored at import time: some jax builds pin
# `jax_platforms` in site customization and ignore the JAX_PLATFORMS env
# var, so KMB_PLATFORM=cpu is the portable way to force the CPU backend
# for smoke runs / CI (see smoke.sh, tests/conftest.py).
_platform = _os.environ.get("KMB_PLATFORM")
if _platform:
    import jax as _jax

    _jax.config.update("jax_platforms", _platform)

# Persistent XLA compilation cache, shared across the runner's
# per-experiment subprocesses (runner.py isolates every definition in a
# fresh process, so without this each one re-pays the full compile).
# Opt IN with KMB_COMPILE_CACHE=<dir> (or "1" for the default
# location); "0" disables.  Validated on the tunneled-TPU backend
# (round 5): populate and fresh-process load both work — loads take
# ~0.3s against 1.5s-2min compiles.  bench.py turns it on by default
# for benchmark runs; the harness leaves it opt-in.
_cache = _os.environ.get("KMB_COMPILE_CACHE", "")
if _cache and _cache != "0":
    import jax as _jax

    _jax.config.update(
        "jax_compilation_cache_dir",
        _cache if _cache != "1" else _os.path.join(
            _os.path.expanduser("~"), ".cache", "kmb_tpu_xla"))
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
