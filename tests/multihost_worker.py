"""Worker executed by test_multihost_integration.py in N separate processes.

Each process brings up `jax.distributed` on CPU (2 virtual devices per
process), then exercises the real multi-host contract (SURVEY.md §2.5
multi-host row):

1. `multihost.initialize` / process topology,
2. `barrier()` across processes,
3. `max_across_hosts` fleet-max timing reduction,
4. a ring-scheduled sharded matvec over the GLOBAL (cross-process) mesh,
   checked against the float64 NumPy oracle,
5. one full harness run (`runner.run` with ShardedProduct): timings are
   fleet-maxed and only the coordinator writes the result HDF5 — the
   parent test asserts exactly one result file exists.

Usage: python multihost_worker.py <coordinator_port> <process_id> <n_procs>
"""

import os
import sys

# Two virtual CPU devices per process; must be set before backend init.
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import numpy as np  # noqa: E402


def main():
    port, pid, nproc = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

    import jax
    jax.config.update("jax_platforms", "cpu")

    from kmb_tpu.parallel import multihost

    assert multihost.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == 2 * nproc
    assert multihost.is_coordinator() == (pid == 0)

    # -- barrier + fleet-max reduction ----------------------------------
    multihost.barrier()
    got = multihost.max_across_hosts(1.0 + pid)
    assert got == float(nproc), got
    got = multihost.max_across_hosts(1.0 + pid)  # cached-sharding path
    assert got == float(nproc), got

    # -- sharded matvec over the global mesh vs the f64 oracle ----------
    from kmb_tpu.algorithms.bruteforce_numpy import blocked_kernel_product
    from kmb_tpu.parallel.sharded import make_mesh, ring_kernel_matvec

    rng = np.random.default_rng(0)  # same seed: same global data per host
    n, d, e = 257, 3, 2
    x = rng.standard_normal((n, d)).astype(np.float32)
    b = rng.standard_normal((n, e)).astype(np.float32)
    mesh = make_mesh()  # 1-D mesh over all 2*nproc global devices
    out = np.asarray(ring_kernel_matvec(
        x, x, b, mesh=mesh, kernel_name="gaussian"))
    truth = blocked_kernel_product(
        kernel="gaussian", source_points=np.float64(x), target_points=None,
        source_signal=np.float64(b), normalize_rows=False)
    rmse = float(np.sqrt(np.mean((out - truth) ** 2)))
    assert rmse < 1e-5, rmse

    # -- full harness run: coordinator-only result writing --------------
    from kmb_tpu.definitions import Definition
    from kmb_tpu.runner import run

    definition = Definition(
        algorithm="tpu-sharded-product",
        module="kmb_tpu.algorithms.tpu_sharded",
        constructor="ShardedProduct",
        arguments={"kernel": "inverse-distance", "dimension": 3,
                   "precision": "float32", "schedule": "ring"},
        query_argument_groups=[{}],
    )
    run(definition=definition,
        dataset="product-sphere-D3-E1-M1000-N1000-inverse-distance",
        runs=1)

    multihost.barrier()
    print(f"WORKER_OK pid={pid}")


if __name__ == "__main__":
    main()
