"""Incremental aggregate maintenance over a CDC changelog.

The materialized-view-over-CDC posture (Flink dynamic tables,
Materialize, TimescaleDB continuous aggregates): a grouped aggregate
of the replicated table is kept current by applying per-batch DELTAS
derived from the change stream, never recomputing from the base.

Why it scales: each micro-batch touches O(batch) rows — the old images
come from a bucket-pruned keyed-state lookup (sinks/parquet_state.py),
the delta is one partial aggregation of ±contributions, and the
aggregate table merge is additive (`apply_additive`) over only the
touched groups. A 100 TB base table is never re-scanned; maintenance
cost tracks change volume.

Correctness contract (oracle-checked by ``cdc_incremental_agg``):
- INSERT contributes (+1, +value) to its group;
- DELETE contributes (−1, −old value) to the OLD image's group;
- UPDATE contributes both — which handles group migration (a row whose
  group column changes moves its count/sum between groups) with no
  special case;
- sums accumulate in exact decimal so the maintained value is
  bit-identical to a from-scratch aggregate, regardless of how many
  increments it took (float accumulation would drift).

The reference has no analogue (its sinks materialize only row state);
this is part of the relational surface the Spark engine adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xxt_cdc_spark.model.envelope import OP_DELETE

DECIMAL = "decimal(25,6)"


def cdc_agg_delta(
    collapsed: DataFrame,
    old_images: DataFrame,
    group_cols: list[str],
    sum_cols: list[str],
    op_col: str = "op",
) -> DataFrame:
    """Per-group aggregate delta of ONE collapsed change batch.

    ``collapsed``: one event per key (LWW within the batch), carrying
    ``op`` + the payload columns. ``old_images``: the PRIOR row images
    of exactly those batch keys that already existed in the state
    (payload columns only; keys new to the state are simply absent).

    Returns ``group_cols + n_delta + <c>_delta`` (decimal) — the
    amounts to add into the maintained aggregate.
    """
    adds = collapsed.filter(F.col(op_col) != OP_DELETE).select(
        *group_cols,
        F.lit(1).alias("__n"),
        *[F.col(c).cast(DECIMAL).alias(c) for c in sum_cols],
    )
    subs = old_images.select(
        *group_cols,
        F.lit(-1).alias("__n"),
        *[(-F.col(c).cast(DECIMAL)).alias(c) for c in sum_cols],
    )
    return (
        adds.unionByName(subs)
        .groupBy(*group_cols)
        .agg(
            F.sum("__n").alias("n_delta"),
            *[F.sum(c).alias(f"{c}_delta") for c in sum_cols],
        )
    )


class ContinuousAggregate:
    """Exactly-once continuous aggregate for foreachBatch.

    Spark's foreachBatch is at-least-once: after a crash the last
    uncommitted micro-batch REPLAYS, and a naive additive update would
    double-count its delta. This class makes the whole maintenance
    step idempotent under replay:

    1. the per-batch aggregate result is written to a VERSIONED dir
       (``agg/b{batch_id}``) derived from the previous committed
       version + this batch's delta — rewriting it on replay produces
       the identical content;
    2. the keyed base-state merge (``ParquetStateTable.apply``) is
       already idempotent (keyed LWW);
    3. a marker file commits the batch id LAST (atomic rename).

    Crash at any point: before (1) → clean recompute; between (1) and
    (2) → the version dir exists, so the delta is NOT recomputed
    against a state that step (2) may since have advanced — the stored
    version is reused and only the idempotent steps re-run; between
    (2) and (3) → same path. Replay of a committed batch is a no-op.
    """

    def __init__(
        self,
        spark,
        root: str,
        key_cols: list[str],
        group_cols: list[str],
        sum_cols: list[str],
        order_cols: list[str],
        n_buckets: int = 16,
    ) -> None:
        import os

        from xxt_cdc_spark.sinks.parquet_state import ParquetStateTable

        self.spark = spark
        self.root = root
        self.group_cols = group_cols
        self.sum_cols = sum_cols
        self.order_cols = order_cols
        self.key_cols = key_cols
        self.state = ParquetStateTable(
            spark, os.path.join(root, "state"), key_cols, n_buckets=n_buckets
        )
        self.agg_root = os.path.join(root, "agg")
        self.marker_path = os.path.join(root, "_agg_commit.json")

    # -- commit marker ------------------------------------------------------
    def _last_committed(self) -> int:
        import json as _json

        try:
            with open(self.marker_path) as f:
                return _json.load(f)["batch_id"]
        except FileNotFoundError:
            return -1

    def _commit(self, batch_id: int) -> None:
        import json as _json
        import os

        os.makedirs(self.root, exist_ok=True)
        tmp = self.marker_path + ".tmp"
        with open(tmp, "w") as f:
            _json.dump({"batch_id": batch_id}, f)
        os.replace(tmp, self.marker_path)

    def _vdir(self, batch_id: int) -> str:
        import os

        return os.path.join(self.agg_root, f"b{batch_id}")

    def read(self) -> DataFrame:
        """The current committed aggregate."""
        import os

        last = self._last_committed()
        if last < 0:
            raise RuntimeError("no committed aggregate yet")
        return self.spark.read.parquet(self._vdir(last))

    def apply_batch(self, typed: DataFrame, batch_id: int) -> None:
        """foreachBatch body: fold one change micro-batch in, exactly
        once. ``typed`` carries op + order cols + payload (key, group,
        sum columns)."""
        import os

        from xxt_cdc_spark.operators.collapse import last_write_wins

        last = self._last_committed()
        if batch_id <= last:
            return  # fully committed earlier; replay is a no-op

        collapsed = last_write_wins(typed, self.key_cols, self.order_cols).localCheckpoint(
            eager=True
        )
        payload = [c for c in collapsed.columns if c not in ("op", *self.order_cols)]
        if not self.state.exists():
            self.state.init(collapsed.select(*payload).limit(0))

        vdir = self._vdir(batch_id)
        # replay-skip must gate on the _SUCCESS marker, not the directory:
        # a crash DURING the parquet write leaves a partial dir (only
        # _temporary, no _SUCCESS), and skipping the recompute then would
        # commit a corrupt version — overwrite mode makes the redo safe
        if not os.path.isfile(os.path.join(vdir, "_SUCCESS")):
            # old images: bucket-pruned lookup of ONLY the touched keys
            keys = collapsed.select(*self.key_cols)
            touched = sorted(
                r[0]
                for r in keys.select(
                    self.state.bucket_of(*[F.col(k) for k in self.key_cols]).alias("b")
                )
                .distinct()
                .collect()
            )
            old = (
                self.state.read_buckets(touched).join(keys, self.key_cols, "inner")
                if touched
                else collapsed.select(*payload).limit(0)
            )
            delta = cdc_agg_delta(collapsed, old, self.group_cols, self.sum_cols)
            if last >= 0:
                prev = self.spark.read.parquet(self._vdir(last))
            else:
                prev = delta.select(
                    *self.group_cols,
                    F.lit(0).cast("long").alias("n"),
                    *[
                        F.lit(0).cast("decimal(25,6)").alias(f"{c}_sum")
                        for c in self.sum_cols
                    ],
                ).limit(0)
            merged = merge_agg(prev, delta, self.group_cols, self.sum_cols)
            merged.write.mode("overwrite").parquet(vdir)

        # idempotent keyed merge, then commit; GC keeps two versions
        self.state.apply(collapsed, order_cols=self.order_cols)
        self._commit(batch_id)
        if last >= 1 and os.path.isdir(self._vdir(last - 1)):
            import shutil

            shutil.rmtree(self._vdir(last - 1), ignore_errors=True)


def merge_agg(
    agg: DataFrame,
    delta: DataFrame,
    group_cols: list[str],
    sum_cols: list[str],
) -> DataFrame:
    """Fold a delta into the maintained aggregate frame
    (``group_cols + n + <c>_sum``); groups reaching n == 0 drop out,
    so a fully-deleted group disappears exactly as a recomputed
    aggregate would omit it."""
    d = delta.select(
        *group_cols,
        F.col("n_delta").alias("n"),
        *[F.col(f"{c}_delta").alias(f"{c}_sum") for c in sum_cols],
    )
    merged = (
        agg.unionByName(d)
        .groupBy(*group_cols)
        .agg(
            F.sum("n").alias("n"),
            *[F.sum(f"{c}_sum").cast(DECIMAL).alias(f"{c}_sum") for c in sum_cols],
        )
    )
    return merged.filter(F.col("n") != 0)
