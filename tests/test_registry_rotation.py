"""Registry rotation invariants: both sweep groups stay under the
driver's 50-query cap, and every query has an oracle pairing."""

from __future__ import annotations


def test_groups_fit_the_sweep_cap():
    from xxt_cdc_spark.queries import _GROUP_A, _GROUP_B, ORACLE, QUERIES

    a = sum(len(m.QUERIES) for m in _GROUP_A)
    b = sum(len(m.QUERIES) for m in _GROUP_B)
    assert a <= 50, f"group A = {a} > 50: the leading group would be truncated"
    assert b <= 50, f"group B = {b} > 50: the leading group would be truncated"
    assert a + b == len(QUERIES)  # no module outside the rotation
    assert set(QUERIES) == set(ORACLE)  # every query oracle-paired
