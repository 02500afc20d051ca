"""Two-stage streaming windowed top-k: a persistent per-(window, key)
count store maintained incrementally from an append-only event stream,
ranked at read time.

This is the OPEN-DOMAIN / hot-window scale form that the single-operator
``streaming/topk_stream.py`` documents and defers to: there, each
window's whole key map transits one ``applyInPandasWithState`` task and
lives in executor memory, which is right for bounded-cardinality keys
but wrong when a window holds millions of distinct keys or one hot
window exceeds a single task. Here:

- **stage 1 (maintenance)** folds each micro-batch's per-(window, key)
  partial counts into a distributed parquet state — one ordinary
  ``groupBy`` per batch (partial aggregation map-side, all cores), no
  driver-resident or single-task state, open key domains welcome;
- **stage 2 (serving)** ranks the closed windows' count maps with a
  window function over O(distinct keys) count rows, never re-reading
  events.

Storage is bucketed by TIME RANGE (``wb = window_bucket //
windows_per_bucket``), not by hash: an advancing stream touches only
the trailing bucket(s), so long-closed buckets are never rewritten and
per-batch maintenance cost is O(delta + open-range state) — the
economics a 100 TB stream needs. Reads are partition-pruned to the
requested windows' range buckets.

Exactly-once under foreachBatch replay uses the versioned-directory +
commit-marker protocol of ``operators/incremental_agg.ContinuousAggregate``
(see its docstring for the crash-point analysis): each batch writes the
merged count maps of its touched range buckets to ``b{batch_id}/wb=…``,
derived ONLY from the previous COMMITTED versions plus the batch's
deterministic delta, then commits ``{batch_id, versions, max_ts}`` by
atomic rename. Replaying an uncommitted batch rewrites identical
content; replaying a committed batch is a no-op.

Sum-merge is not naturally idempotent (unlike the max-lattice stores:
``functions/sketches.IncrementalHLL``, ``operators/timeseries``' OHLC),
which is exactly why the commit protocol — not a bare
``ParquetStateTable.apply_additive`` — carries this operator.

Reference parity: the reference engine has no streaming analytics at
all (its pipeline is transport -> sink, reader/MySQLBinlogReader.scala);
this belongs to the analytics surface the Spark engine adds.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


class WindowedTopK:
    """Persistent windowed key-count store with read-time top-k rank.

    ``root`` must be a driver-visible path (local fs in tests; any
    Hadoop-visible store in production — the marker file would move to
    the FileSystem API there, same as ParquetStateTable's bucket ops).
    """

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        key_col: str = "event_type",
        ts_col: str = "ts",
        window_seconds: int = 3600,
        windows_per_bucket: int = 64,
    ) -> None:
        self.spark = spark
        self.root = root
        self.key_col = key_col
        self.ts_col = ts_col
        self.window_us = window_seconds * 1_000_000
        self.windows_per_bucket = windows_per_bucket
        self.marker_path = os.path.join(root, "_commit.json")

    # -- commit marker ------------------------------------------------------
    def _meta(self) -> dict:
        try:
            with open(self.marker_path) as f:
                return json.load(f)
        except FileNotFoundError:
            return {"batch_id": -1, "versions": {}, "max_w": -(1 << 62)}

    def _commit(self, meta: dict) -> None:
        os.makedirs(self.root, exist_ok=True)
        tmp = self.marker_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, self.marker_path)

    def _wb_dir(self, batch_id: int, wb: int) -> str:
        return os.path.join(self.root, f"b{batch_id}", f"wb={wb}")

    def _gc_wb(self, batch_id: int, wb: int) -> None:
        """Remove one superseded wb version dir AND its b{batch} parent
        once the last wb child is gone — a steady-state stream touching
        one bucket per batch would otherwise strand an empty b{N}
        directory (plus _SUCCESS) per batch, forever."""
        shutil.rmtree(self._wb_dir(batch_id, wb), ignore_errors=True)
        parent = os.path.join(self.root, f"b{batch_id}")
        try:
            if not any(n.startswith("wb=") for n in os.listdir(parent)):
                shutil.rmtree(parent, ignore_errors=True)
        except FileNotFoundError:
            pass

    # -- stage 1: maintenance ----------------------------------------------
    def foreach_batch(self):
        """The ``writeStream.foreachBatch`` body."""

        def fn(df: DataFrame, batch_id: int) -> None:
            self.apply_batch(df, batch_id)

        return fn

    def apply_batch(self, df: DataFrame, batch_id: int) -> None:
        """Fold one micro-batch of raw events in, exactly once."""
        meta = self._meta()
        if batch_id <= meta["batch_id"]:
            return  # committed earlier; replay is a no-op

        wpb = self.windows_per_bucket
        # retention floor: events below the persisted expire() cutoff
        # must NOT resurrect a dropped bucket — a fresh bucket holding
        # only the straggler's counts would be served as a (wrong)
        # closed window (same posture as topk_stream's finalized-window
        # gate; review finding r5)
        floor_w = meta.get("floor_w")
        if floor_w is not None:
            df = df.filter(
                F.floor(
                    F.unix_micros(F.col(self.ts_col).cast("timestamp"))
                    / F.lit(self.window_us)
                )
                >= F.lit(int(floor_w))
            )
        delta = (
            df.filter(F.col(self.ts_col).isNotNull() & F.col(self.key_col).isNotNull())
            .select(
                F.floor(
                    F.unix_micros(F.col(self.ts_col).cast("timestamp"))
                    / F.lit(self.window_us)
                )
                .cast("long")
                .alias("_w"),
                F.col(self.key_col).cast("string").alias("_k"),
            )
            .groupBy("_w", "_k")
            .agg(F.count(F.lit(1)).alias("n"))
            .withColumn("wb", (F.floor(F.col("_w") / wpb)).cast("long"))
            .localCheckpoint(eager=True)
        )
        stats = delta.agg(
            F.collect_set("wb").alias("wbs"), F.max("_w").alias("max_w")
        ).collect()[0]
        touched = sorted(stats["wbs"] or [])
        if not touched:
            # data-free batch still advances the commit (so replays of
            # later batches don't re-run it)
            meta["batch_id"] = batch_id
            self._commit(meta)
            return

        versions: dict[str, int] = meta["versions"]
        prev_parts = [
            self.spark.read.parquet(self._wb_dir(versions[str(wb)], wb)).withColumn(
                "wb", F.lit(wb).cast("long")
            )
            for wb in touched
            if str(wb) in versions
        ]
        merged = delta
        for p in prev_parts:
            merged = merged.unionByName(p)
        merged = merged.groupBy("wb", "_w", "_k").agg(F.sum("n").alias("n"))
        # overwrite-safe: a crash mid-write leaves a partial b{batch_id}
        # dir that the replay rewrites identically (prev versions are
        # read from the still-uncommitted OLD marker)
        merged.write.mode("overwrite").partitionBy("wb").parquet(
            os.path.join(self.root, f"b{batch_id}")
        )

        superseded = [(wb, versions[str(wb)]) for wb in touched if str(wb) in versions]
        for wb in touched:
            versions[str(wb)] = batch_id
        # ONE-GENERATION GC GRACE: delete the versions superseded by the
        # PREVIOUS commit, and only queue this batch's superseded dirs.
        # A serving read (counts()/topk() DataFrame) pins its file list
        # at plan time; immediate deletion raced concurrent stage-2
        # readers into FileNotFound at action time. With the grace, a
        # reader survives as long as its plan is no more than one
        # maintenance batch old; longer-lived plans must re-resolve.
        pending = [tuple(x) for x in meta.get("pending_gc", [])]
        meta.update(
            batch_id=batch_id,
            versions=versions,
            max_w=max(meta.get("max_w", -(1 << 62)), int(stats["max_w"])),
            pending_gc=[[wb, old] for wb, old in superseded],
        )
        self._commit(meta)
        # GC AFTER commit, best-effort (a crash just leaves garbage the
        # next batch's grace queue would also strand — bounded by one
        # stale dir per range bucket per generation)
        for wb, old in pending:
            self._gc_wb(old, wb)

    def expire(self, keep_windows: int) -> list[int]:
        """Retention: drop range buckets whose ENTIRE window span lies
        more than ``keep_windows`` behind the newest observed window.
        O(dropped buckets) directory removals + one marker rewrite — no
        data read; without this the store grows one bucket per
        ``windows_per_bucket`` windows forever. Returns dropped wb ids.

        Whole-bucket granularity is deliberate: a partial trim would
        rewrite a bucket's surviving windows (a data job) to save at
        most windows_per_bucket-1 windows of cheap parquet."""
        meta = self._meta()
        cutoff_w = meta["max_w"] - keep_windows
        # bucket wb spans windows [wb*wpb, (wb+1)*wpb): fully expired
        # iff its last window is below the cutoff
        dropped = [
            int(wb)
            for wb in meta["versions"]
            if (int(wb) + 1) * self.windows_per_bucket - 1 < cutoff_w
        ]
        pending = [tuple(x) for x in meta.get("pending_gc", [])]
        if not dropped:
            # nothing new to expire, but a previous generation's queue
            # may still be waiting — drain it so back-to-back expire()
            # calls converge to a clean store (commit the emptied queue
            # first, same referenced-never-deleted posture as below)
            if pending:
                meta["pending_gc"] = []
                self._commit(meta)
                for wb, old in pending:
                    self._gc_wb(old, wb)
            return []
        doomed = [(wb, meta["versions"].pop(str(wb))) for wb in dropped]
        # persist the retention floor so apply_batch filters stragglers
        # below it — an expired bucket must stay expired, not come back
        # as a fresh (wrong) count map
        meta["floor_w"] = max(
            meta.get("floor_w") or -(1 << 62),
            (max(wb for wb, _ in doomed) + 1) * self.windows_per_bucket,
        )
        # ONE-GENERATION GC GRACE, same as apply_batch: a serving plan
        # pinned moments before expire() must not hit FileNotFound at
        # action time — queue the doomed dirs through pending_gc and
        # drain only the PREVIOUS generation's queue (its grace period
        # has elapsed). Commit the narrowed manifest FIRST: a crash
        # between commit and rmtree strands readable-but-unreferenced
        # dirs, never a referenced-but-deleted one.
        meta["pending_gc"] = [[wb, ver] for wb, ver in doomed]
        self._commit(meta)
        for wb, old in pending:
            self._gc_wb(old, wb)
        return sorted(wb for wb, _ in doomed)

    # -- stage 2: serving ---------------------------------------------------
    def counts(self, include_open: bool = False) -> DataFrame:
        """The maintained (window, key, n) table — partition-pruned to
        the latest committed version of each range bucket."""
        meta = self._meta()
        versions = meta["versions"]
        if not versions:
            raise RuntimeError("no committed windows yet")
        # ONE multi-path scan node — a per-bucket read chained through
        # unionByName builds an N-deep plan (N = live range buckets:
        # a year of hourly windows at wpb=64 is ~137, long retention
        # reaches thousands) that pays N file listings and linear
        # analysis cost on the driver for the identical frame
        dirs = [
            self._wb_dir(v, int(wb))
            for wb, v in sorted(versions.items(), key=lambda kv: int(kv[0]))
        ]
        out = self.spark.read.parquet(*dirs)
        if not include_open:
            # closed = a strictly later window has been observed (the
            # store's watermark analogue at window granularity; lateness
            # delay belongs to the caller's stream watermark, which
            # gates what reaches us)
            out = out.filter(F.col("_w") < F.lit(int(meta["max_w"])))
        return out

    def topk(self, k: int, include_open: bool = False) -> DataFrame:
        """Per-window top-k by count — rank over count rows only,
        deterministic ties on the key; same output shape as the
        single-operator form and the batch twin."""
        c = self.counts(include_open=include_open)
        win = Window.partitionBy("_w").orderBy(F.col("n").desc(), "_k")
        return (
            c.withColumn("rank", F.row_number().over(win))
            .filter(F.col("rank") <= k)
            .select(
                F.timestamp_micros(F.col("_w") * self.window_us).alias("window_start"),
                F.col("rank").cast("int").alias("rank"),
                F.col("_k").alias(self.key_col),
                "n",
            )
        )
