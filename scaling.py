"""Scaling-efficiency report: sharded kernel matvec at 1..P devices.

Measures the ring-scheduled streaming product at increasing device counts
on the available mesh (real chips on a pod slice, virtual CPU devices in
tests/CI) and reports throughput, per-device throughput, and efficiency
relative to perfect linear scaling from 1 device:

    efficiency(p) = pairs_per_second(p) / (p * pairs_per_second(1))

Prints a table plus one JSON line per device count for machine
consumption.  This is the BASELINE.md "scaling efficiency of points/s at
1 chip / 1 host / >=2 hosts" measurement (run once per host count; the
multi-host variant uses the same code under `jax.distributed`).
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def measure(n, d, e, kernel, device_counts, runs):
    import kmb_tpu  # noqa: F401  (honors KMB_PLATFORM before backend init)
    import jax
    import jax.numpy as jnp

    from kmb_tpu.parallel.sharded import make_mesh, ring_kernel_matvec
    from kmb_tpu.utils import hard_fence

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((n, e)), jnp.float32)

    rows = []
    for p in device_counts:
        mesh = make_mesh((p,), ("shard",), devices=jax.devices()[:p])

        def step():
            hard_fence(ring_kernel_matvec(
                x, x, b, mesh=mesh, kernel_name=kernel))

        step()  # compile
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            step()
            best = min(best, time.perf_counter() - t0)
        rows.append({"devices": p, "seconds": best,
                     "pairs_per_second": n * n / best})
    base = rows[0]["pairs_per_second"] / rows[0]["devices"]
    for row in rows:
        row["efficiency"] = (
            row["pairs_per_second"] / (row["devices"] * base))
    return rows


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-n", type=int, default=2**15,
                        help="N = M problem size")
    parser.add_argument("-d", type=int, default=3)
    parser.add_argument("-e", type=int, default=1)
    parser.add_argument("--kernel", default="gaussian")
    parser.add_argument("--runs", type=int, default=3)
    parser.add_argument("--devices", type=int, nargs="*",
                        help="device counts to test (default 1,2,4,..,P)")
    args = parser.parse_args(argv)

    # Import kmb_tpu BEFORE jax touches the backend: this environment
    # pins jax_platforms and ignores JAX_PLATFORMS, so a bare
    # `import jax` here would silently select the hardware backend even
    # under KMB_PLATFORM=cpu (kmb_tpu's import hook applies it).
    import kmb_tpu  # noqa: F401
    import jax
    available = len(jax.devices())
    counts = args.devices or [
        p for p in [1, 2, 4, 8, 16, 32, 64] if p <= available]

    rows = measure(args.n, args.d, args.e, args.kernel, counts, args.runs)
    print(f"{'devices':>8} {'seconds':>10} {'pairs/s':>12} "
          f"{'per-device':>12} {'efficiency':>11}")
    for row in rows:
        print(f"{row['devices']:>8} {row['seconds']:>10.4f} "
              f"{row['pairs_per_second']:>12.3e} "
              f"{row['pairs_per_second'] / row['devices']:>12.3e} "
              f"{row['efficiency']:>10.1%}")
    for row in rows:
        print(json.dumps(row))
    return rows


if __name__ == "__main__":
    main()
