"""SCD Type-2 history materialization from a CDC changefeed — the
classic warehouse consumer of this engine's output (Kimball slowly-
changing dimensions; Delta's MERGE-based SCD2 pattern), expressed as
one window pass.

Semantics: every non-delete change becomes a VERSION row valid from
its own binlog position until the key's next change (exclusive); a
delete closes the prior version without creating one; the key's last
non-delete change (with no later event) is the current version.
Exact duplicate events (transport redelivery) must be dropped first —
`scd2_history` does so — because a tie on the position ordering would
make lead() engine-dependent.

Plan shape: one shuffle+sort on (key, position) — lead() is a running
window, O(rows). The incremental `Scd2Table` folds position-ordered
batches into (bucket-pruned current state, append-only closed-version
log) with the versioned-directory idempotency protocol, so maintaining
a year of history never rescans it: per batch it reads only the
touched keys' hash buckets and writes one closed-versions directory.

Reference parity note: the reference stops at row replication (its
sinks hold only the latest image); SCD2 is part of the downstream
surface the Spark rebuild adds, next to the MOR table's time travel
(sinks/changelog_mor.py) — time travel answers "state as of P",
SCD2 answers "every version, with validity intervals, as a table".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from xxt_cdc_spark.model.envelope import OP_DELETE
from xxt_cdc_spark.operators.collapse import order_exprs_materialized


def scd2_history(
    changes: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    op_col: str = "op",
) -> DataFrame:
    """Batch form: the full SCD2 version table of one changefeed.

    Output: key + payload columns, ``valid_from_<c>``/``valid_to_<c>``
    per order column (valid_to null on the current version), and
    ``is_current`` (1 for the key's live version; a deleted key has
    none).

    Malformed-feed delta vs dropDuplicates (r13 behavior change): the
    redelivery dedup below collapses exact copies only when they sort
    ADJACENT in the per-key position order. On a well-formed feed —
    (key, order_cols) unique per distinct row — copies always do, and
    behavior is identical. On a BROKEN feed where a different row ties
    on (key, order_cols) and interleaves between two copies, the
    second copy now survives where dropDuplicates would have collapsed
    it (either way the tie makes lead() engine-dependent, so such a
    feed has no well-defined history).
    """
    # rotation-safe position order, materialized as attributes
    # (collapse.order_exprs_materialized — the shared (length, value)
    # pos_file convention): attribute-only sort orders let
    # CollapseWindow merge the lag/lead windows onto ONE exchange +
    # ONE sort (r13; measured 3 sorts with inline expressions).
    tmp_cols, order_by = order_exprs_materialized(order_cols)
    sort_tmp = list(tmp_cols)
    src = changes
    for tmp, expr in tmp_cols.items():
        src = src.withColumn(tmp, expr)
    w = Window.partitionBy(*key_cols).orderBy(*order_by)
    # full-row dedup, matching the oracle's SELECT DISTINCT *: the
    # position is the engine's logical clock, so two DIFFERENT rows at
    # one (key, position) is a broken feed (both engines would order
    # the tie arbitrarily) — only exact redeliveries are collapsible.
    # The dedup RIDES the version window's shuffle+sort (r13): exact
    # redeliveries share (key, position), so they land ADJACENT in the
    # per-key position sort and a lag-equality filter drops them; the
    # lead() windows below reuse the same exchange+sort (identical
    # window spec over an order-preserving filter). A dropDuplicates
    # here instead hashed the FULL row as the shuffle key — a second
    # full-feed shuffle, with every payload byte in the key, ahead of
    # the key-partitioned window shuffle.
    #
    # The comparison is PER-COLUMN lag (null-safe), NOT a lag over a
    # full-row struct: the lag OUTPUTS are computed during the window
    # scan (post-shuffle) from columns the exchange already carries,
    # so the shuffle/sort payload stays 1× — a struct column doubles
    # the sorted row width and SPILLS at scale (slope-measured: the
    # struct variant read −15% at sf1 but +40% at sf10; this shape
    # keeps the sf1 win without the cliff). lag(lit(1)) is null
    # exactly on each key's first sorted row — an explicit first-row
    # flag, so all-null payload columns cannot masquerade as a
    # redelivery of a missing predecessor.
    is_first = F.lag(F.lit(1)).over(w).isNull()
    same_as_prev = None
    for c in changes.columns:
        eq = F.lag(F.col(c)).over(w).eqNullSafe(F.col(c))
        same_as_prev = eq if same_as_prev is None else (same_as_prev & eq)
    deduped = (
        src.withColumn("__keep", is_first | ~same_as_prev)
        .filter(F.col("__keep"))
        .drop("__keep")
    )
    out = deduped
    for c in order_cols:
        out = out.withColumn(f"valid_to_{c}", F.lead(c).over(w))
    out = out.withColumn(
        "is_current",
        (F.col(f"valid_to_{order_cols[0]}").isNull() & (F.col(op_col) != OP_DELETE)).cast("int"),
    )
    for c in order_cols:
        out = out.withColumnRenamed(c, f"valid_from_{c}")
    return out.filter(F.col(op_col) != OP_DELETE).drop(op_col, *sort_tmp)


class Scd2Table:
    """Incrementally-maintained SCD2 table over position-ordered change
    batches (a foreachBatch body).

    Layout: ``current/`` — a bucket-pruned ParquetStateTable holding
    each live key's latest image (payload includes its valid-from
    position); ``history/b<batch_id>/`` — the versions CLOSED by that
    batch. A batch closes (a) the prior current image of every key it
    touches, at the key's first in-batch position, and (b) its own
    intra-batch superseded versions; the state merge then installs the
    batch's survivors.

    Exactly-once under foreachBatch replay: the closed-versions
    directory is gated on its _SUCCESS marker (recompute would see the
    already-advanced state and close the wrong images — same protocol
    as operators/incremental_agg.ContinuousAggregate), and the state
    merge is keyed + LWW, so re-applying the same batch is a no-op.
    Batches must arrive in position order (the streaming checkpoint's
    contract).
    """

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        key_cols: list[str],
        order_cols: list[str],
        n_buckets: int = 16,
    ) -> None:
        import os

        from xxt_cdc_spark.sinks.parquet_state import ParquetStateTable

        self.spark = spark
        self.key_cols = key_cols
        self.order_cols = order_cols
        self.state = ParquetStateTable(
            spark, os.path.join(root, "current"), key_cols, n_buckets=n_buckets
        )
        self.hist_root = os.path.join(root, "history")

    def _bdir(self, batch_id: int) -> str:
        import os

        return os.path.join(self.hist_root, f"b{batch_id}")

    def apply_batch(self, changes: DataFrame, batch_id: int, op_col: str = "op") -> None:
        import os

        deduped = changes.dropDuplicates().localCheckpoint(eager=True)
        payload = [c for c in deduped.columns if c != op_col]
        if not self.state.exists():
            # the state keeps TOMBSTONES (_deleted=1) rather than
            # removing deleted keys: a later redelivery of a deleted
            # key's events must still find its position in the gate
            # below, or it would re-materialize closed versions
            self.state.init(
                deduped.select(*payload).limit(0).withColumn("_deleted", F.lit(0))
            )

        # bucket-pruned lookup of the touched keys' current images —
        # used BOTH to drop cross-batch redeliveries and to close the
        # superseded versions
        keys = deduped.select(*self.key_cols).distinct()
        touched = sorted(
            r[0]
            for r in keys.select(
                self.state.bucket_of(*[F.col(k) for k in self.key_cols]).alias("b")
            )
            .distinct()
            .collect()
        )
        cur = (
            self.state.read_buckets(touched).join(keys, self.key_cols, "inner")
            if touched
            else None
        )
        # cross-batch redelivery gate: an event at or before the stored
        # current's position was already applied by an earlier batch —
        # without this, a redelivered event re-closes the current image
        # as a spurious zero-width version (in-batch dedup can't see it)
        fresh = deduped
        if cur is not None:
            cur_pos = cur.select(
                *self.key_cols,
                F.struct(*[F.col(c) for c in self.order_cols]).alias("_cur_pos"),
            )
            fresh = (
                deduped.join(cur_pos, self.key_cols, "left")
                .filter(
                    F.col("_cur_pos").isNull()
                    | (F.struct(*[F.col(c) for c in self.order_cols]) > F.col("_cur_pos"))
                )
                .drop("_cur_pos")
            )
        if "_deleted" in fresh.columns:
            fresh = fresh.drop("_deleted")
        fresh = fresh.localCheckpoint(eager=True)

        bdir = self._bdir(batch_id)
        if not os.path.isfile(os.path.join(bdir, "_SUCCESS")):
            hist = scd2_history(fresh, self.key_cols, self.order_cols, op_col)
            intra_closed = hist.filter(
                F.col(f"valid_to_{self.order_cols[0]}").isNotNull()
            ).drop("is_current")
            # each touched key's FIRST fresh position closes the prior
            # current image
            firsts = fresh.groupBy(*self.key_cols).agg(
                F.min(F.struct(*[F.col(c) for c in self.order_cols])).alias("_f")
            )
            if cur is not None:
                # a tombstone image has no live version to close — a
                # re-insert after a delete just starts a new version
                old = cur.filter(F.col("_deleted") == 0).join(firsts, self.key_cols, "inner")
                closed_from_state = old.select(
                    *[
                        F.col(c).alias(f"valid_from_{c}") if c in self.order_cols else F.col(c)
                        for c in old.columns
                        if c not in ("_f", "_deleted")
                    ],
                    *[F.col("_f").getField(c).alias(f"valid_to_{c}") for c in self.order_cols],
                )
                closed = intra_closed.unionByName(closed_from_state)
            else:
                closed = intra_closed
            closed.write.mode("overwrite").parquet(bdir)

        # keyed LWW merge installs the batch survivors; deletes persist
        # as tombstone rows (payload nulled by the feed, position kept)
        as_upserts = fresh.withColumn(
            "_deleted", (F.col(op_col) == OP_DELETE).cast("int")
        ).withColumn(op_col, F.lit("U"))
        self.state.apply(as_upserts, order_cols=self.order_cols, op_col=op_col)

    def as_of(self, *position) -> DataFrame:
        """Valid-time point read: the table's rows AS OF ``position``
        (one value per order column) — the version whose validity
        interval contains it. Complements the MOR table's as_of (which
        replays the log to a cut): here the versions are materialized,
        so the read is a pair of comparisons on the history table, the
        shape a warehouse dimension query takes."""
        if len(position) != len(self.order_cols):
            raise ValueError(f"as_of needs one value per order column {self.order_cols}")
        h = self.history()
        # struct comparisons require matching field names on both sides
        pos_from = F.struct(
            *[F.lit(v).alias(f"valid_from_{c}") for v, c in zip(position, self.order_cols)]
        )
        pos_to = F.struct(
            *[F.lit(v).alias(f"valid_to_{c}") for v, c in zip(position, self.order_cols)]
        )
        vfrom = F.struct(*[F.col(f"valid_from_{c}") for c in self.order_cols])
        vto = F.struct(*[F.col(f"valid_to_{c}") for c in self.order_cols])
        vto_open = F.col(f"valid_to_{self.order_cols[0]}").isNull()
        return h.filter((vfrom <= pos_from) & (vto_open | (pos_to < vto)))

    def history(self) -> DataFrame:
        """The full SCD2 table: closed versions ∪ live versions."""
        import os

        cur = self.state.read().filter(F.col("_deleted") == 0).drop("_deleted")
        live = cur.select(
            *[
                F.col(c).alias(f"valid_from_{c}") if c in self.order_cols else F.col(c)
                for c in cur.columns
            ],
            *[
                F.lit(None).cast(dict(cur.dtypes)[c]).alias(f"valid_to_{c}")
                for c in self.order_cols
            ],
        ).withColumn("is_current", F.lit(1))
        if not os.path.isdir(self.hist_root):
            return live
        closed = (
            self.spark.read.option("mergeSchema", "true")
            .parquet(os.path.join(self.hist_root, "b*"))
            .withColumn("is_current", F.lit(0))
        )
        return closed.unionByName(live)
