"""Careful probe of the jax persistent compilation cache on this backend.

One prior attempt to LOAD a cached executable hung the tunneled chip
(~40 min recovery), so the cache has been opt-in and unused.  If loads
work, every benchmark compile (~25-45s each, the dominant cost of the
bench suite) drops to ~1s and the full suite fits any driver budget.

Protocol (run each stage as its OWN process, serially, with a generous
outer timeout so the process is never killed mid-RPC):

    python artifacts/r05_cache_probe.py populate   # compile + store
    python artifacts/r05_cache_probe.py load       # fresh-process load

Each stage prints one JSON line with timings.  A "load" wall time well
under the populate compile time means the cache works end-to-end.
"""

import json
import os
import sys
import time

os.environ.setdefault("KMB_COMPILE_CACHE", "/root/repo/.jax_cache")

import numpy as np

import kmb_tpu  # noqa: F401  (applies the cache config + KMB_PLATFORM)
import jax
import jax.numpy as jnp

from kmb_tpu.ops.product import kernel_matvec
from kmb_tpu.utils import hard_fence


def main(stage):
    n, d = 2**15, 25
    rng = np.random.default_rng(0)
    x = jax.device_put(jnp.asarray(
        rng.standard_normal((n, d)) / np.sqrt(d), jnp.float32))
    b = jax.device_put(jnp.asarray(rng.standard_normal((n, 1)), jnp.float32))
    hard_fence((x, b))

    t0 = time.perf_counter()
    hard_fence(kernel_matvec(x, x, b, kernel_name="gaussian",
                             precision="float32"))
    first = time.perf_counter() - t0
    t0 = time.perf_counter()
    hard_fence(kernel_matvec(x, x, b, kernel_name="gaussian",
                             precision="float32"))
    warm = time.perf_counter() - t0
    print(json.dumps({"stage": stage, "backend": jax.default_backend(),
                      "first_call_seconds": first,
                      "warm_call_seconds": warm,
                      "cache_dir": os.environ["KMB_COMPILE_CACHE"],
                      "cache_files": len(os.listdir(
                          os.environ["KMB_COMPILE_CACHE"]))
                      if os.path.isdir(os.environ["KMB_COMPILE_CACHE"])
                      else 0}), flush=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "populate")
