"""Machinery test for the scaling-efficiency report (virtual CPU mesh:
the efficiency values are not meaningful, the plumbing is)."""

import scaling


def test_measure_rows_well_formed():
    rows = scaling.measure(
        n=512, d=3, e=1, kernel="gaussian", device_counts=[1, 2], runs=1)
    assert [row["devices"] for row in rows] == [1, 2]
    assert rows[0]["efficiency"] == 1.0
    for row in rows:
        assert row["seconds"] > 0
        assert row["pairs_per_second"] == 512 * 512 / row["seconds"]


def test_comm_probe_ring_collectives():
    """The compiled ring program's collectives match the analytic model:
    exactly two collective-permutes per step (the (y, b) rotation), each
    forming a full ring over the mesh, with per-step bytes (M/p)(D+E)*4."""
    import comm

    p, n, d, e = 4, 4096, 3, 1
    hlo = comm.probe("ring", p, n, d, e)
    perms = [c for c in hlo["collectives"]
             if c["op"] == "collective-permute"]
    assert len(perms) == 2
    assert sum(c["bytes"] for c in perms) == (n // p) * (d + e) * 4
    assert hlo["ring_pairs"], "ring source_target_pairs missing from HLO"
    row = comm.analyze("ring", p, n, d, e, 1e11, hlo)
    assert row["total_bytes_per_device"] == (p - 1) * (n // p) * (d + e) * 4
    assert 0 < row["predicted_efficiency"] <= 1


def test_comm_probe_allpairs_collectives():
    """The all-pairs program reduces partial rows with one all-reduce of
    the (N/pt, E) block (plain product: den=None, no second payload)."""
    import comm

    p, n, d, e = 4, 4096, 3, 1
    hlo = comm.probe("allpairs", p, n, d, e)
    ars = [c for c in hlo["collectives"] if c["op"] == "all-reduce"]
    assert ars, "no all-reduce in compiled all-pairs program"
    pt, ps = hlo["mesh"]
    assert sum(c["bytes"] for c in ars) == (n // pt) * e * 4
    row = comm.analyze("allpairs", p, n, d, e, 1e11, hlo)
    assert row["comm_compute_ratio"] < 1
