"""MXU-regime block-shape sweep: D=784 bf16 (and f32x3) kernel product.

Round-4 measured 107 TFLOP/s (54% of v5e bf16 peak) at the default
(512, 512) blocks.  The default_blocks VMEM model assumes 4-byte tiles,
but bf16 point/signal tiles are 2 bytes — larger blocks should fit, and
block_n is the lever that cuts the dominant HBM stream (the y-factor
re-read, (N/block_n) * M * d_pad * 2 bytes).  This script measures a
candidate grid on the real chip and prints one JSON line per config.

Run standalone on the chip (serial queue, generous timeout):
    python artifacts/r05_mxu_sweep.py
"""

import json
import sys
import time

import numpy as np

import kmb_tpu  # noqa: F401  (honors KMB_PLATFORM)
import jax
import jax.numpy as jnp

from kmb_tpu.ops.product import kernel_matvec
from kmb_tpu.utils import hard_fence

N = 2**17
D = 784
E = 1
RUNS = 3

CANDIDATES = [
    (512, 512),     # current default
    (1024, 512),
    (512, 1024),
    (1024, 1024),
    (2048, 512),
    (1024, 256),
    (2048, 256),
]


def main():
    rng = np.random.default_rng(0)
    x = jax.device_put(jnp.asarray(
        rng.standard_normal((N, D)) / np.sqrt(D), jnp.float32))
    b = jax.device_put(jnp.asarray(rng.standard_normal((N, E)), jnp.float32))
    hard_fence((x, b))
    flops = 2.0 * N * N * (D + E)

    for precision in (sys.argv[1:] or ["bfloat16"]):
        for bn, bm in CANDIDATES:
            def step():
                hard_fence(kernel_matvec(
                    x, x, b, kernel_name="gaussian", precision=precision,
                    block_n=bn, block_m=bm))
            try:
                t0 = time.perf_counter()
                step()  # compile
                compile_s = time.perf_counter() - t0
                best = float("inf")
                for _ in range(RUNS):
                    t0 = time.perf_counter()
                    step()
                    best = min(best, time.perf_counter() - t0)
                print(json.dumps({
                    "precision": precision, "block_n": bn, "block_m": bm,
                    "seconds": best, "tflops": flops / best / 1e12,
                    "compile_seconds": compile_s}), flush=True)
            except Exception as exc:
                print(json.dumps({
                    "precision": precision, "block_n": bn, "block_m": bm,
                    "error": repr(exc)[:200]}), flush=True)


if __name__ == "__main__":
    main()
