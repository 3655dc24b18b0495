"""Multi-host runtime: bring-up, barriers, and host-0 result ownership.

The reference is strictly single-node (SURVEY.md §2.5); this module is the
new capability that lets the same benchmark drive a multi-host TPU pod
slice:

- `initialize()` wraps `jax.distributed.initialize` (one call per host,
  before any backend use).  On a single host it is a no-op, so all entry
  points can call it unconditionally.
- `is_coordinator()` gates filesystem side effects (result HDF5s, plots)
  to process 0 — every host computes, one host records.
- `barrier()` synchronizes hosts with a tiny all-device psum.
- `max_across_hosts(x)` reduces a host-local scalar (e.g. a wall-clock
  measurement) to the fleet maximum: multi-host timings must report the
  slowest host, not host 0's local view (SURVEY.md §7 "multi-host result
  collection").
"""

from __future__ import annotations

import os

import numpy as np

import jax
import jax.numpy as jnp


def initialize(coordinator_address=None, num_processes=None,
               process_id=None):
    """Bring up the multi-host runtime; no-op for single-process runs.

    Arguments default from the standard env vars
    (KMB_COORDINATOR_ADDRESS, KMB_NUM_PROCESSES, KMB_PROCESS_ID), and the
    call is skipped entirely when neither arguments nor env vars request
    a multi-process setup (so local runs never pay for it).
    """
    coordinator_address = coordinator_address or os.environ.get(
        "KMB_COORDINATOR_ADDRESS")
    if coordinator_address is None and num_processes is None:
        return False
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is None:
        num_processes = int(os.environ.get("KMB_NUM_PROCESSES", "0")) or None
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is None:
        env = os.environ.get("KMB_PROCESS_ID")
        process_id = int(env) if env is not None else None
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    return True


def is_coordinator() -> bool:
    """True on the process that owns filesystem side effects."""
    return jax.process_index() == 0


def num_hosts() -> int:
    return jax.process_count()


def barrier():
    """Synchronize all hosts: a 1-element psum over every global device."""
    devices = jax.devices()
    if len(devices) <= 1:
        return
    from jax.sharding import Mesh, PartitionSpec as P

    mesh = Mesh(np.asarray(devices), ("all",))
    token = jnp.ones((len(devices),), jnp.float32)
    out = jax.jit(
        jax.shard_map(lambda t: jax.lax.psum(t, "all"), mesh=mesh,
                      in_specs=P("all"), out_specs=P("all"),
                      check_vma=False),
    )(token)
    jax.block_until_ready(out)


_MAX_SHARDING = None  # cached fleet-wide NamedSharding (devices are static)


def max_across_hosts(value: float) -> float:
    """Fleet-wide maximum of a host-local scalar (e.g. a timing)."""
    if jax.process_count() <= 1:
        return float(value)
    global _MAX_SHARDING
    if _MAX_SHARDING is None:
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        mesh = Mesh(np.asarray(jax.devices()), ("all",))
        _MAX_SHARDING = NamedSharding(mesh, P("all"))
    local = np.full((jax.local_device_count(),), value, np.float32)
    arr = jax.make_array_from_process_local_data(_MAX_SHARDING, local)
    return float(jax.jit(jnp.max)(arr))
