"""Key-collapse / ordering operators.

Parity targets:

- R5 key-collapse/dedup (reference: implicit in idempotent PK-upsert,
  README.md:526-548): within a micro-batch, only the LAST change per
  key (by total-ordered binlog position) must reach the sink —
  expressed as ``row_number() over (partition by key order by pos
  desc) = 1``.
- R4 per-partition serial apply (pipeline/CDCStreamPipeline.scala:100,
  ``mapAsync(1)``): per-key ordering in Spark is achieved by the LWW
  collapse + idempotent sink, not serial execution.

Scale: one hash shuffle on the key columns — the same shuffle the
sink repartition needs, so Catalyst reuses the exchange. Skewed keys
are handled by AQE skew-join/partition splitting (enabled in
session.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_RN = "__xxt_rn"


def order_exprs(order_cols: list[str], descending: bool = False):
    """Ordering expressions for binlog-position columns, file-rotation
    safe: the ``pos_file`` column orders by (length, value) — equal to
    plain lexicographic while suffix width is constant, and equal to
    NUMERIC file order when MySQL widens the rotation suffix
    ('binlog.1000000' > 'binlog.999999' numerically but < as a plain
    string; binlog_source.py:66 documents the hazard and
    model/positions.FilePosition already compares numerically — this is
    the COLUMN-level counterpart). Other columns order as themselves."""
    out = []
    for c in order_cols:
        cols = [F.length(F.col(c)), F.col(c)] if c == "pos_file" else [F.col(c)]
        out.extend(x.desc() if descending else x for x in cols)
    return out


def order_exprs_materialized(
    order_cols: list[str], prefix: str = "__ord_len_"
) -> tuple[dict[str, "F.Column"], list["F.Column"]]:
    """`order_exprs`, split into materialized attributes — for Window
    sorts that must COLLAPSE. Expression-based sort orders defeat both
    CollapseWindow (adjacent Window merge) and sort-order reuse across
    lag/lead windows; with attribute-only ordering a multi-window pass
    computes on one exchange + one sort (scd2.py, r13: 3 sorts → 1).

    Returns ``(tmp_cols, order_by)``: the caller adds each
    ``tmp_cols[name]`` via withColumn BEFORE building the window and
    drops the names from the final result; ``order_by`` references only
    attributes. Same (length, value) pos_file convention as
    `order_exprs` — one source of truth for the rotation-safe order."""
    tmp_cols: dict[str, F.Column] = {}
    order_by: list[F.Column] = []
    for c in order_cols:
        if c == "pos_file":
            tmp = f"{prefix}{c}"
            tmp_cols[tmp] = F.length(F.col(c))
            order_by.append(F.col(tmp))
        order_by.append(F.col(c))
    return tmp_cols, order_by


def last_write_wins(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Collapse a change batch to the latest event per key.

    ``order_cols`` default to the binlog total order
    ``(pos_file, pos_offset)``; rows with the greatest order win.
    """
    order_cols = order_cols or ["pos_file", "pos_offset"]
    w = Window.partitionBy(*key_cols).orderBy(*order_exprs(order_cols, descending=True))
    return (
        df.withColumn(_RN, F.row_number().over(w))
        .filter(F.col(_RN) == 1)
        .drop(_RN)
    )


def dedup_transport(
    df: DataFrame,
    key_cols: list[str] | None = None,
    watermark: tuple[str, str] | None = None,
) -> DataFrame:
    """Remove duplicate deliveries of the same (key, position).

    Batch: exact ``dropDuplicates``. Streaming: pass
    ``watermark=("ts", "10 minutes")`` to bound state with
    ``dropDuplicatesWithinWatermark`` (SURVEY.md §7 hard-point (d)).
    """
    key_cols = key_cols or ["db", "table", "key", "pos_file", "pos_offset"]
    if watermark is not None:
        col, delay = watermark
        df = df.withWatermark(col, delay)
        return df.dropDuplicatesWithinWatermark(key_cols)
    return df.dropDuplicates(key_cols)
