"""Merge-on-read CDC lake sink: JVM-only streaming append of the typed
changelog, convergence at read time, compaction in the background.

The upsert sinks (sinks/upsert.py, sinks/parquet_state.py) are
merge-on-WRITE: every micro-batch pays the merge, and — measured on
this box (SCALING.md latency ablation) — any Python-side sink adds a
~170 ms worker-dispatch floor per batch. This module is the
merge-on-READ posture (the Hudi-MOR / Paimon changelog pattern,
re-expressed with nothing but Spark built-ins):

- the streaming query appends the typed change rows to a parquet log
  via the built-in FILE SINK — a pure-JVM plan (no foreachBatch, no
  Python worker in the loop), exactly-once through the sink's
  _spark_metadata commit log;
- ``converged()`` defines the table state AS A QUERY: compacted base
  state, merged with the LWW collapse of the log suffix newer than the
  compaction watermark;
- ``compact()`` periodically folds the log prefix into a bucketed
  ParquetStateTable (merge cost amortized across many batches, run at
  leisure off the latency path) and advances the watermark sidecar.

Write latency therefore excludes merge work entirely; readers pay the
collapse of only the un-compacted suffix. At 100 TB the log partitions
by ingest time, the state table bucket-prunes (parquet_state.py), and
compaction cadence bounds the suffix a reader folds.

Reference parity: this is the engine-side analogue of the reference's
StarRocks routed-load path (connector/starrocks/*.scala) where the
TARGET does merge-on-read; here Spark itself plays both parts, with
the same composite (pos_file, pos_offset) ordering as the binlog
comparator (reader/BinlogPosition ordering; ADVICE round-2 composite
gate).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from xxt_cdc_spark.model.envelope import OP_DELETE
from xxt_cdc_spark.operators.collapse import last_write_wins
from xxt_cdc_spark.sinks.parquet_state import ParquetStateTable

_WATERMARK_FILE = "_mor_compaction.json"


def _after(pos_file: Column, pos_offset: Column, file_val, offset_val) -> Column:
    """Composite (pos_file, pos_offset) strictly-after predicate —
    offsets reset on binlog rotation, so a plain offset compare would
    drop post-rotate events, and the FILE compare is (length, value) so
    a rotation suffix widened past 999999 keeps numeric order
    (model/positions.FilePosition ordering; collapse.order_exprs is the
    sort-side counterpart)."""
    f, o = F.lit(file_val), F.lit(offset_val)
    flen = F.length(pos_file)
    vlen = F.lit(len(str(file_val)))
    return (
        (flen > vlen)
        | ((flen == vlen) & (pos_file > f))
        | ((pos_file == f) & (pos_offset > o))
    )


class ChangelogMorTable:
    """A CDC table materialized as (compacted state, changelog suffix).

    ``typed`` rows must carry the payload columns plus ``op`` and the
    composite order columns (default pos_file/pos_offset).
    """

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        key_cols: list[str],
        order_cols: tuple[str, str] = ("pos_file", "pos_offset"),
        n_buckets: int = 64,
        log_schema=None,
    ) -> None:
        self.spark = spark
        self.root = root
        self.key_cols = key_cols
        self.order_cols = list(order_cols)
        self.log_path = os.path.join(root, "log")
        self.log_schema = log_schema
        self.state = ParquetStateTable(
            spark, os.path.join(root, "state"), key_cols, n_buckets=n_buckets
        )

    # --- write side (JVM-only) -----------------------------------------------
    def start_stream(
        self,
        typed: DataFrame,
        checkpoint_dir: str,
        trigger: dict | None = None,
        files_per_batch: int = 1,
    ) -> StreamingQuery:
        """Append the typed changelog stream to the parquet log.

        The whole micro-batch plan is JVM-side (source → projection →
        file sink): no Python worker dispatch on the latency path, and
        the file sink's metadata log gives exactly-once file visibility
        across restarts. ``files_per_batch`` coalesces the batch so a
        low-rate stream doesn't shed one file per source partition."""
        out = typed.coalesce(files_per_batch) if files_per_batch else typed
        writer = (
            out.writeStream.format("parquet")
            .option("path", self.log_path)
            .option("checkpointLocation", checkpoint_dir)
            .queryName("xxt-cdc-mor-append")
        )
        writer = writer.trigger(**(trigger or {"processingTime": "0 seconds"}))
        return writer.start()

    def append_batch(self, typed: DataFrame) -> None:
        """Batch-mode log append (catchup/backfill path).

        REFUSED once the streaming file sink owns the log: the sink's
        ``_spark_metadata`` commit log makes readers trust ONLY the
        files it lists, so rows appended outside it would be silently
        invisible — worse than an error. Run backfills through the
        stream (or into a fresh log) instead."""
        if os.path.isdir(os.path.join(self.log_path, "_spark_metadata")):
            raise ValueError(
                f"log at {self.log_path} is owned by the streaming file sink "
                "(_spark_metadata present); batch-appended files would be "
                "invisible to readers — route backfill through the stream"
            )
        typed.write.mode("append").parquet(self.log_path)

    # --- metadata ------------------------------------------------------------
    def _watermark(self) -> dict | None:
        try:
            with open(os.path.join(self.root, _WATERMARK_FILE)) as f:
                return json.load(f)
        except FileNotFoundError:
            return None

    def _write_watermark(self, wm: dict) -> None:
        # atomic rename — same posture as offsets.py's file store
        path = os.path.join(self.root, _WATERMARK_FILE)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(wm, f)
        os.replace(tmp, path)

    def log(self) -> DataFrame:
        # Evolution support: files written before an additive evolution
        # (a stream restarted with new columns appends new-schema files
        # to the same log) must null-fill the newer columns. With an
        # explicit ``log_schema`` the reader aligns every file to it at
        # zero planning cost — the right mode for a long-lived log,
        # where mergeSchema's read of EVERY file footer at every
        # planning grows with log age. Without a hint, mergeSchema
        # derives the union schema from the footers (correct, footer-
        # scan-priced — fine for short logs and tests).
        if self.log_schema is not None:
            return self.spark.read.schema(self.log_schema).parquet(self.log_path)
        return self.spark.read.option("mergeSchema", "true").parquet(self.log_path)

    def _log_suffix(self) -> DataFrame:
        """Log rows strictly after the compaction watermark. The filter
        is a plain pushed predicate on (pos_file, pos_offset) — with a
        time/file-partitioned log layout it prunes whole directories."""
        log = self.log()
        wm = self._watermark()
        if wm is None:
            return log
        return log.filter(
            _after(
                F.col(self.order_cols[0]),
                F.col(self.order_cols[1]),
                wm[self.order_cols[0]],
                wm[self.order_cols[1]],
            )
        )

    # --- read side -----------------------------------------------------------
    def converged(self) -> DataFrame:
        """The table's current state AS A QUERY: LWW-collapse the
        un-compacted log suffix, then merge over the compacted base
        (suffix wins; suffix deletes drop base rows). Payload columns
        only — identical to what a merge-on-write sink would hold."""
        suffix = self._log_suffix()
        meta = ["op", *self.order_cols]
        payload_cols = [c for c in suffix.columns if c not in meta]
        latest = last_write_wins(suffix, self.key_cols, self.order_cols)
        live = latest.filter(F.col("op") != OP_DELETE).select(*payload_cols)
        if not self.state.exists():
            return live
        base = self.state.read()
        # anti-join: base rows whose key the suffix touched (upsert OR
        # delete) are superseded. No broadcast hint: compaction cadence
        # bounds the suffix, but when it HAS grown, AQE's runtime size
        # check (not a static hint) should make the broadcast call.
        touched = latest.select(*self.key_cols)
        kept = base.join(touched, self.key_cols, "left_anti")
        # allowMissingColumns: between an evolution and the next
        # compaction the base lacks the newer columns — those rows
        # null-fill, the same additive semantics as the log read
        return kept.unionByName(live, allowMissingColumns=True)

    def changes_between(self, lo: tuple | None, hi: tuple | None) -> DataFrame:
        """Change-data-feed read: the raw change rows in position range
        (lo, hi] — Delta-CDF-style incremental consumption for
        downstream subscribers (e.g. a ContinuousAggregate maintaining
        a view off this table). ``lo=None`` starts at the log head;
        ``hi=None`` is unbounded. Positions below the compaction
        watermark are refused like ``as_of`` — compaction cadence is
        the CDF retention knob too."""
        from xxt_cdc_spark.model.positions import position_in_range

        wm = self._watermark()
        if lo is not None and wm is not None and (
            (wm[self.order_cols[0]], wm[self.order_cols[1]]) > tuple(lo)
        ):
            raise ValueError(
                f"changes_between lower bound {lo} predates the compaction "
                f"watermark {wm} — that history is folded into the base and "
                "no longer position-addressable"
            )
        log = self.log()
        if lo is None and hi is None:
            return log
        return log.filter(
            position_in_range(
                tuple(lo) if lo is not None else ("", -1),
                tuple(hi) if hi is not None else None,
                file_col=self.order_cols[0],
                offset_col=self.order_cols[1],
            )
        )

    def as_of(self, file_val, offset_val) -> DataFrame:
        """Time travel: the table state AS OF a binlog position — the
        compacted base merged with the LWW collapse of log rows in
        (compaction watermark, requested position]. Valid only while
        the requested position is at or above the compaction watermark
        (rows folded into the base below it are no longer
        position-addressable); compaction cadence is therefore also
        the time-travel retention knob."""
        wm = self._watermark()
        if wm is not None and (
            (wm[self.order_cols[0]], wm[self.order_cols[1]]) > (file_val, offset_val)
        ):
            raise ValueError(
                f"as_of position ({file_val}, {offset_val}) predates the "
                f"compaction watermark {wm} — that history is folded into "
                "the base state and no longer position-addressable"
            )
        suffix = self._log_suffix().filter(
            ~_after(
                F.col(self.order_cols[0]),
                F.col(self.order_cols[1]),
                file_val,
                offset_val,
            )
        )
        meta = ["op", *self.order_cols]
        payload_cols = [c for c in suffix.columns if c not in meta]
        latest = last_write_wins(suffix, self.key_cols, self.order_cols)
        live = latest.filter(F.col("op") != OP_DELETE).select(*payload_cols)
        if not self.state.exists():
            return live
        base = self.state.read()
        touched = latest.select(*self.key_cols)
        kept = base.join(touched, self.key_cols, "left_anti")
        return kept.unionByName(live, allowMissingColumns=True)

    # --- compaction ----------------------------------------------------------
    def compact(self) -> dict:
        """Fold the current log suffix into the bucketed state table and
        advance the watermark. Runs OFF the write latency path (cadence
        is the knob trading read-side fold size against compaction
        I/O). Idempotent: replaying a compaction re-merges the same
        keyed rows (parquet_state.apply is keyed + LWW)."""
        suffix = self._log_suffix().localCheckpoint()
        meta = ["op", *self.order_cols]
        payload_cols = [c for c in suffix.columns if c not in meta]
        hi = (
            suffix.select(
                F.max(F.struct(*[F.col(c) for c in self.order_cols])).alias("m")
            ).first()["m"]
        )
        if hi is None:
            return {"compacted_rows": 0}
        if not self.state.exists():
            empty = self.spark.createDataFrame(
                [], suffix.select(*payload_cols).schema
            )
            self.state.init(empty)
        stats = self.state.apply(
            suffix.select(*payload_cols, "op", *self.order_cols),
            order_cols=self.order_cols,
        )
        self._write_watermark(
            {self.order_cols[0]: hi[self.order_cols[0]],
             self.order_cols[1]: hi[self.order_cols[1]]}
        )
        return {"compacted_rows": suffix.count(), **stats}
