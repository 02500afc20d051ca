"""Local replica of the driver's DuckDB-oracle correctness gate.

For each (query, oracle_sql) pair: run the Spark query and the DuckDB
SQL over the same parquet corpus, then compare row count, column names,
and an order-insensitive value hash (columns sorted by name, rows
sorted, values canonicalized). Used by tests/test_oracle_parity.py so
every registered operator is verified the same way the driver will
verify it.
"""

from __future__ import annotations

import hashlib
import math
import os
from dataclasses import dataclass

import duckdb
import pandas as pd

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _canon(v) -> str:
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "∅"
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return f"{v:.6f}"
        return repr(v)
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, (list, tuple)) or hasattr(v, "tolist"):
        seq = v.tolist() if hasattr(v, "tolist") else v
        return "[" + ",".join(_canon(x) for x in seq) + "]"
    if isinstance(v, bool):
        return str(bool(v))
    return str(v)


def frame_fingerprint(pdf: pd.DataFrame) -> tuple[int, list[str], str]:
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = sorted("|".join(_canon(v) for v in row) for row in pdf.itertuples(index=False, name=None))
    h = hashlib.sha256("\n".join(rows).encode()).hexdigest()
    return len(pdf), cols, h


@dataclass
class CompareResult:
    name: str
    rows_match: bool
    cols_match: bool
    hash_match: bool
    spark_rows: int
    oracle_rows: int
    detail: str = ""

    @property
    def ok(self) -> bool:
        return self.rows_match and self.cols_match and self.hash_match


def compare(name: str, spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> CompareResult:
    spark_pdf = spark_df.toPandas()
    oracle_pdf = con.execute(sql).fetchdf()
    sn, sc, sh = frame_fingerprint(spark_pdf)
    on, oc, oh = frame_fingerprint(oracle_pdf)
    detail = ""
    if sc != oc:
        detail = f"cols spark={sc} oracle={oc}"
    elif sh != oh:
        merged = _first_diff(spark_pdf, oracle_pdf)
        detail = f"hash mismatch; first diff: {merged}"
    return CompareResult(name, sn == on, sc == oc, sh == oh, sn, on, detail)


def _first_diff(a: pd.DataFrame, b: pd.DataFrame) -> str:
    cols = sorted(a.columns)
    ra = sorted("|".join(_canon(v) for v in row) for row in a[cols].itertuples(index=False, name=None))
    rb = sorted("|".join(_canon(v) for v in row) for row in b[cols].itertuples(index=False, name=None))
    for i, (x, y) in enumerate(zip(ra, rb)):
        if x != y:
            return f"row {i}: spark={x!r} oracle={y!r}"
    return f"row-count {len(ra)} vs {len(rb)}"
