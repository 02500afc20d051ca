"""Mirror of the driver's correctness gate: every registered query must
hash-match its DuckDB oracle at the smoke scale factor.

(The driver runs the same comparison at sf0.01; tests use sf0.001 for
speed — set XXT_SF_SMOKE=/root/testdata/sf0.01 to reproduce the gate.)
"""

from __future__ import annotations

import pytest

from xxt_cdc_spark.oracle import compare, duckdb_con
from xxt_cdc_spark.queries import ORACLE, QUERIES


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_con(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(ORACLE.keys()))
def test_query_matches_oracle(name, spark, sf_dir, con):
    df = QUERIES[name](spark, sf_dir)
    res = compare(name, df, con, ORACLE[name])
    assert res.ok, (
        f"{name}: rows {res.spark_rows} vs {res.oracle_rows}, "
        f"cols_match={res.cols_match}, hash_match={res.hash_match} — {res.detail}"
    )


def test_every_query_has_callable():
    for name in QUERIES:
        assert callable(QUERIES[name])


def test_oracle_keys_subset_of_queries():
    missing = set(ORACLE) - set(QUERIES)
    assert not missing, f"oracle entries without queries: {missing}"
