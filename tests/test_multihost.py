"""Single-process semantics of the multi-host runtime helpers.

True multi-process behavior can't run in one test process; these tests pin
down the single-host contract (no-ops, identity reductions, coordinator
truth) that the multi-host code paths must degrade to.
"""

import jax

from kmb_tpu.parallel import multihost


def test_initialize_noop_without_config(monkeypatch):
    monkeypatch.delenv("KMB_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("KMB_NUM_PROCESSES", raising=False)
    assert multihost.initialize() is False


def test_coordinator_is_process_zero():
    assert multihost.is_coordinator() is (jax.process_index() == 0)
    assert multihost.num_hosts() == jax.process_count()


def test_barrier_runs():
    multihost.barrier()  # 8 virtual devices: a real psum executes


def test_max_across_hosts_identity_single_process():
    assert multihost.max_across_hosts(1.25) == 1.25


def test_runner_still_stores_single_host(rng, tmp_path, monkeypatch):
    from kmb_tpu.definitions import Definition
    from kmb_tpu.results import load_all_results
    from kmb_tpu.runner import run

    monkeypatch.setenv("KMB_RESULTS_DIR", str(tmp_path / "results"))
    definition = Definition(
        algorithm="dummy",
        module="kmb_tpu.algorithms.dummy",
        constructor="DummyProduct",
        arguments={"kernel": "gaussian", "dimension": 3},
        query_argument_groups=[{}],
    )
    run(definition=definition,
        dataset="product-sphere-D3-E1-M1000-N1000-inverse-distance",
        runs=1)
    assert len(list(load_all_results())) == 1
