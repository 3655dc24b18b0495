"""True multi-process (2-host) integration test on CPU.

Spawns two Python processes that bring up `jax.distributed` against a
local coordinator and run `tests/multihost_worker.py`: barrier,
fleet-max timing reduction, a cross-process ring matvec checked against
the float64 oracle, and one full harness run where only the coordinator
writes the result file (VERDICT round-1 item 4; SURVEY.md §2.5
multi-host row).
"""

import os
import socket
import subprocess
import sys

WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed(tmp_path):
    n_procs = 2
    port = _free_port()

    # Pre-generate the dataset so the children don't race to write it.
    from kmb_tpu.datasets import get_dataset
    get_dataset("product-sphere-D3-E1-M1000-N1000-inverse-distance")[0].close()

    env = dict(
        os.environ,
        PYTHONPATH=REPO_ROOT,
        KMB_RESULTS_DIR=str(tmp_path / "results"),
    )
    env.pop("XLA_FLAGS", None)        # worker sets its own device count
    env.pop("KMB_COORDINATOR_ADDRESS", None)

    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(port), str(pid), str(n_procs)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for pid in range(n_procs)
    ]
    outputs = []
    try:
        for proc in procs:
            out, _ = proc.communicate(timeout=240)
            outputs.append(out)
    finally:
        for proc in procs:
            if proc.poll() is None:
                proc.kill()

    for pid, (proc, out) in enumerate(zip(procs, outputs)):
        assert proc.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"WORKER_OK pid={pid}" in out

    # Coordinator-only writes: exactly ONE result file across both hosts.
    results = [
        os.path.join(root, fn)
        for root, _, files in os.walk(tmp_path / "results")
        for fn in files if fn.endswith(".hdf5")
    ]
    assert len(results) == 1, results
