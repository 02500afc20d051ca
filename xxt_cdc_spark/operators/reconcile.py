"""Source/target table reconciliation: chunk checksums + targeted
row drill-down — the consistency-verification step of a CDC topology
(the pt-table-checksum / pt-table-sync workflow, re-expressed as two
scans and one narrow shuffle).

A replication pipeline needs an answer to "did the target converge?"
that does not ship either table across the network. The classic
protocol: split the table into PK chunks, aggregate an order-
insensitive checksum per chunk on BOTH sides, compare the tiny
checksum tables, then fetch rows only for mismatched chunks. At
100 TB the checksum pass is a full scan but a TRIVIAL shuffle (one
(chunk, count, xor) row per chunk — O(chunks), not O(rows), crosses
the wire), and the drill-down touches only the mismatched chunks'
rows; a converged table costs two scans and kilobytes of transfer.

Spark-first shape: the per-row hash is `xxhash64` (JVM, codegen), the
chunk id is a hash of the key columns (hash chunking is skew-proof
where pt-table-checksum's PK ranges hot-spot on monotonic keys), the
chunk checksum is COUNT + BIT_XOR of row hashes (XOR is order- and
partition-insensitive and cannot overflow under ANSI arithmetic; PK
uniqueness within a chunk makes cancellation impossible). Row hashes
are TWO-LEVEL — each column hashed with its position, then the
per-column digests hashed together — so a NULL in column i cannot
collide with the same value shifted into column i+1 (Spark's hash
functions skip NULLs; a flat salted stream would re-align when an
integer value equals an adjacent salt).

Reference parity: the reference ships changes (connector/sink) but has
no convergence checker; this closes the operational loop around its
S5/O16 path (snapshot + upsert apply).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CHUNK_COL = "_chunk"
HASH_COL = "_row_hash"

STATUS_MISSING_TARGET = "missing_in_target"
STATUS_MISSING_SOURCE = "missing_in_source"
STATUS_DIFFERS = "differs"


def _row_hash(cols: list[str]) -> F.Column:
    # two-level: hash each column WITH its position first, then hash
    # the per-column digests. A NULL column leaves xxhash64(lit(i)) —
    # a concrete, position-specific value — so the outer hash always
    # sees exactly len(cols) non-null longs and NULL-adjacent value
    # shifts cannot line up. (A single flat xxhash64(i0, c0, i1, c1, …)
    # is NOT enough: the NULL skip deletes the column slot and an int
    # column whose value equals the next salt index re-aligns the
    # stream — found by review, pinned in tests.)
    parts = [F.xxhash64(F.lit(i), F.col(c)) for i, c in enumerate(cols)]
    return F.xxhash64(*parts)


def with_chunks(df: DataFrame, key_cols: list[str], n_chunks: int) -> DataFrame:
    """Tag each row with its (deterministic, skew-proof) chunk id."""
    return df.withColumn(
        CHUNK_COL, F.pmod(F.xxhash64(*[F.col(k) for k in key_cols]), F.lit(n_chunks))
    )


def table_checksums(
    df: DataFrame, key_cols: list[str], n_chunks: int = 1024
) -> DataFrame:
    """Per-chunk (row count, xor of row hashes) over ALL columns.
    One scan, partial aggregation map-side, O(n_chunks) result."""
    value_cols = [c for c in df.columns]
    return (
        with_chunks(df, key_cols, n_chunks)
        .withColumn(HASH_COL, _row_hash(value_cols))
        .groupBy(CHUNK_COL)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.bit_xor(HASH_COL).alias("xor_hash"),
        )
    )


def mismatched_chunks(
    src: DataFrame, dst: DataFrame, key_cols: list[str], n_chunks: int = 1024
) -> DataFrame:
    """Chunk ids whose checksums disagree — the only chunks whose rows
    the drill-down must read. Full-outer join of two O(n_chunks)
    frames; a chunk present on one side only is a mismatch too."""
    s = table_checksums(src, key_cols, n_chunks).alias("s")
    d = table_checksums(dst, key_cols, n_chunks).alias("d")
    return (
        s.join(d, on=CHUNK_COL, how="full_outer")
        .filter(
            ~(
                F.col("s.n_rows").eqNullSafe(F.col("d.n_rows"))
                & F.col("s.xor_hash").eqNullSafe(F.col("d.xor_hash"))
            )
        )
        .select(CHUNK_COL)
    )


def reconcile(
    src: DataFrame,
    dst: DataFrame,
    key_cols: list[str],
    n_chunks: int = 1024,
) -> DataFrame:
    """Row-level drift report: ``key_cols + status`` for every row
    that is missing on either side or differs in any non-key column.

    Two phases, as the protocol demands: (1) chunk checksums find the
    mismatched chunk set; (2) ONLY those chunks' rows (a semi-join on
    the chunk id, which prunes at the scan when the tables are stored
    chunk-bucketed) meet in a keyed full-outer join and compare their
    row hashes. A converged table exits at phase 1 with an empty plan.
    """
    # both sides hash src's column list, so a column present only in
    # dst would be silently EXCLUDED from comparison (drift in it
    # invisible) and a column missing from dst would fail only deep in
    # execution with an unresolved-column error — validate up front
    # (r5 ADVICE item 3)
    src_cols, dst_cols = set(src.columns), set(dst.columns)
    if src_cols != dst_cols:
        raise ValueError(
            "reconcile: src and dst column sets differ — "
            f"only in src: {sorted(src_cols - dst_cols)}, "
            f"only in dst: {sorted(dst_cols - src_cols)}; "
            "project both sides to the columns you want compared"
        )
    # normalize dst to src's column ORDER: the row hash is position-
    # salted, so a reordered dst would flag every chunk in phase 1
    # (correct result, but the drill-down reads the whole table)
    dst = dst.select(*src.columns)
    # materialize the O(n_chunks) mismatch set ONCE: it feeds both
    # sides' drill-down semi-joins, and un-materialized it would embed
    # the full-table checksum subtree twice in the final plan (four
    # scans instead of two)
    bad = mismatched_chunks(src, dst, key_cols, n_chunks).localCheckpoint(eager=True)
    value_cols = list(src.columns)

    def prep(df: DataFrame, side: str) -> DataFrame:
        return (
            with_chunks(df, key_cols, n_chunks)
            .join(bad, on=CHUNK_COL, how="left_semi")
            .select(*key_cols, _row_hash(value_cols).alias(f"{side}_hash"))
        )

    s = prep(src, "src")
    d = prep(dst, "dst")
    joined = s.join(d, on=key_cols, how="full_outer")
    return joined.select(
        *key_cols,
        F.when(F.col("dst_hash").isNull(), F.lit(STATUS_MISSING_TARGET))
        .when(F.col("src_hash").isNull(), F.lit(STATUS_MISSING_SOURCE))
        .otherwise(F.lit(STATUS_DIFFERS))
        .alias("status"),
    ).filter(
        F.col("src_hash").isNull()
        | F.col("dst_hash").isNull()
        | (F.col("src_hash") != F.col("dst_hash"))
    )
