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
