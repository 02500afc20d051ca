"""Hash-bucketed mutable state table on parquet — the lakehouse upsert
target without a Delta/Iceberg jar (SURVEY §7.2: with Delta this is one
``MERGE INTO``; here the merge is explicit but bucket-pruned).

Layout: ``root/bucket=<k>/part-*.parquet`` with
``k = pmod(hash(key_cols), n_buckets)``. Applying a change batch:

1. LWW-collapse the batch (R5);
2. compute the touched bucket set (small — bounded by n_buckets);
3. read ONLY touched buckets (partition pruning on the bucket column);
4. merge (anti-join + union, operators/apply.py semantics);
5. rewrite only those buckets via dynamic partition overwrite.

At 100 TB: untouched buckets are never read or written, so apply cost
scales with the change batch's key spread, not the table size. A key
always lands in the same bucket, so the merge join co-partitions.
Replays are idempotent (merge is keyed), matching the engine's
effectively-once contract.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from xxt_cdc_spark.model.envelope import OP_DELETE
from xxt_cdc_spark.operators.collapse import last_write_wins

_BUCKET = "bucket"


class ParquetStateTable:
    def __init__(
        self,
        spark: SparkSession,
        root: str,
        key_cols: list[str],
        n_buckets: int = 64,
    ) -> None:
        self.spark = spark
        self.root = root
        self.key_cols = key_cols
        self.n_buckets = n_buckets

    def _bucket_col(self):
        return F.pmod(F.hash(*[F.col(c) for c in self.key_cols]), F.lit(self.n_buckets))

    def exists(self) -> bool:
        # an initialized-but-empty table has a _SUCCESS marker and no
        # bucket directories yet
        return os.path.isdir(self.root) and any(
            name.startswith(f"{_BUCKET}=") or name == "_SUCCESS"
            for name in os.listdir(self.root)
        )

    def init(self, snapshot: DataFrame) -> None:
        """Bulk-load the initial state (snapshot phase, O18). A schema
        sidecar makes an initialized-but-empty table readable."""
        # init must fully replace the table — static overwrite (a
        # session left in dynamic mode would turn an empty init into a
        # silent no-op)
        prev = self.spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
        try:
            (
                snapshot.withColumn(_BUCKET, self._bucket_col())
                .write.mode("overwrite")
                .partitionBy(_BUCKET)
                .parquet(self.root)
            )
        finally:
            self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        os.makedirs(self.root, exist_ok=True)
        with open(os.path.join(self.root, "_xxt_schema.json"), "w") as f:
            json.dump(snapshot.schema.jsonValue(), f)

    def _payload_schema(self) -> T.StructType | None:
        try:
            with open(os.path.join(self.root, "_xxt_schema.json")) as f:
                return T.StructType.fromJson(json.load(f))
        except FileNotFoundError:
            return None

    def _has_data(self) -> bool:
        return os.path.isdir(self.root) and any(
            name.startswith(f"{_BUCKET}=") for name in os.listdir(self.root)
        )

    def _state_columns(self) -> list[str]:
        schema = self._payload_schema()
        if schema is not None:
            return [f.name for f in schema.fields]
        return list(self.read().columns)

    def _check_sidecar(self) -> None:
        # init() writes data THEN the sidecar (the static overwrite
        # would wipe a sidecar written first) — a crash in between
        # leaves a table exists() accepts whose schema guards
        # (add-only retype check, aligned per-bucket reads) would all
        # silently no-op. Fail loudly instead of proceeding degraded.
        if self._has_data() and self._payload_schema() is None:
            raise RuntimeError(
                f"state table at {self.root} has data but no schema sidecar "
                "(crash between init()'s data write and sidecar write?) — "
                "re-run init()"
            )

    def _full_schema(self) -> T.StructType | None:
        """Sidecar payload schema + the bucket partition column — the
        schema every read is ALIGNED to. Passing it explicitly makes
        parquet files written before an additive evolution null-fill
        the newer columns, and keeps the read schema stable no matter
        which subset of buckets (files) a pruned read touches."""
        payload = self._payload_schema()
        if payload is None:
            return None
        return T.StructType([*payload.fields, T.StructField(_BUCKET, T.IntegerType())])

    def evolve_additive(self, new_fields: list[T.StructField]) -> None:
        """Additive schema evolution: append columns to the sidecar
        schema (same policy as sinks/schema_evolution.py — add-only,
        never drop/retype). Existing parquet files are NOT rewritten;
        aligned reads null-fill the new columns, and each bucket
        picks up the full schema whenever apply() next rewrites it."""
        schema = self._payload_schema()
        if schema is None:
            raise RuntimeError(f"state table at {self.root} has no schema sidecar")
        existing = {f.name: f.dataType for f in schema.fields}
        # add-only means NEVER retype: a name collision with a different
        # type must fail here, loudly — silently accepting it would let
        # new buckets be written wide (e.g. LONG) while the sidecar says
        # INT, breaking aligned reads much later with a parquet
        # conversion error far from the cause
        for f in new_fields:
            if f.name in existing and f.dataType != existing[f.name]:
                raise ValueError(
                    f"schema evolution is add-only: column {f.name!r} exists as "
                    f"{existing[f.name].simpleString()}, batch has {f.dataType.simpleString()}"
                )
        added = [f for f in new_fields if f.name not in existing]
        for f in added:
            if f.name in self.key_cols:
                raise ValueError(f"cannot evolve key column {f.name!r}")
        if not added:
            return
        out = T.StructType([*schema.fields, *[T.StructField(f.name, f.dataType, True) for f in added]])
        tmp = os.path.join(self.root, "_xxt_schema.json.tmp")
        with open(tmp, "w") as f:
            json.dump(out.jsonValue(), f)
        os.replace(tmp, os.path.join(self.root, "_xxt_schema.json"))

    def read(self) -> DataFrame:
        if not self._has_data():
            schema = self._payload_schema()
            if schema is None:
                raise RuntimeError(f"state table at {self.root} not initialized")
            return self.spark.createDataFrame([], schema)
        full = self._full_schema()
        if full is not None:
            return self.spark.read.schema(full).parquet(self.root).drop(_BUCKET)
        return self.spark.read.parquet(self.root).drop(_BUCKET)

    def bucket_of(self, *key_values) -> "F.Column":
        """Bucket id expression for arbitrary key columns/literals —
        lets callers compute which buckets a batch will touch without
        reading anything."""
        return F.pmod(F.hash(*key_values), F.lit(self.n_buckets))

    def read_buckets(self, buckets: list[int]) -> DataFrame:
        """Public bucket-pruned read: only the listed bucket partitions
        are scanned (partition pruning on the directory column)."""
        return self._read_buckets(buckets)

    def _read_buckets(self, buckets: list[int]) -> DataFrame:
        if not self._has_data():
            return self.read()
        # partition pruning: the filter on the partition column prunes
        # directories at planning time — untouched buckets are not read.
        # Aligned to the sidecar schema so pre-evolution files null-fill
        # newer columns instead of shifting the read schema per bucket.
        full = self._full_schema()
        reader = self.spark.read.schema(full) if full is not None else self.spark.read
        return reader.parquet(self.root).filter(F.col(_BUCKET).isin(buckets)).drop(_BUCKET)

    def apply(
        self,
        changes: DataFrame,
        order_cols: list[str],
        op_col: str = "op",
    ) -> dict:
        """Merge a change batch (envelope-ish: payload + op + order cols).

        Returns stats incl. which buckets were rewritten.
        """
        if not self.exists():
            raise RuntimeError(f"state table at {self.root} not initialized; call init() first")
        self._check_sidecar()
        latest = last_write_wins(changes, self.key_cols, order_cols).localCheckpoint()
        # additive schema evolution: payload columns new to this batch
        # extend the sidecar schema (C31 policy — add-only); buckets
        # rewritten below carry the full schema, untouched ones null-
        # fill on aligned reads until their next rewrite
        sidecar = self._payload_schema()
        if sidecar is not None:
            meta = {op_col, *order_cols}
            # pass ALL payload fields (not just the new names) so a
            # same-name/different-type batch fails evolve_additive's
            # retype check instead of writing type-drifted buckets
            self.evolve_additive([f for f in latest.schema.fields if f.name not in meta])
        with_bucket = latest.withColumn(_BUCKET, self._bucket_col())
        touched = sorted(
            r[_BUCKET] for r in with_bucket.select(_BUCKET).distinct().collect()
        )
        if not touched:
            return {"touched_buckets": [], "upserts": 0, "deletes": 0}

        state = self._read_buckets(touched)
        payload_cols = state.columns  # state carries payload only
        # an old-schema batch replayed AFTER an evolution lacks the
        # newer columns — align it with typed nulls. NOTE: apply() is a
        # REPLACE merge (anti-join + union); it is idempotent for
        # re-delivery of the SAME batch, but re-applying an older batch
        # on top of newer state regresses rows — batch order is owned
        # by the caller (the streaming checkpoint replays only the last
        # uncommitted batch, in order)
        batch_missing = [f for f in state.schema.fields if f.name not in with_bucket.columns]
        for f in batch_missing:
            with_bucket = with_bucket.withColumn(f.name, F.lit(None).cast(f.dataType))
        upserts = with_bucket.filter(F.col(op_col) != OP_DELETE).select(*payload_cols, _BUCKET)
        touched_keys = with_bucket.select(*self.key_cols)
        kept = state.withColumn(_BUCKET, self._bucket_col()).join(
            touched_keys, on=self.key_cols, how="left_anti"
        )
        merged = kept.select(*payload_cols, _BUCKET).unionByName(upserts).persist()
        try:
            # dynamic overwrite only rewrites partitions PRESENT in `merged`:
            # a touched bucket whose every row was deleted produces no output
            # partition, so its old files would survive and the deleted rows
            # would resurrect on the next read. Find those buckets up front
            # (persist makes this one extra cheap job over the cached merge)
            # and remove their directories after the write.
            present = {r[0] for r in merged.select(_BUCKET).distinct().collect()}
            emptied = [k for k in touched if k not in present]
            self._overwrite_dynamic(merged)
            for k in emptied:
                self._delete_bucket_dir(k)
            n_up = upserts.count()
            return {
                "touched_buckets": touched,
                "emptied_buckets": emptied,
                "upserts": n_up,
                "deletes": latest.count() - n_up,
            }
        finally:
            merged.unpersist()

    def _overwrite_dynamic(self, merged: DataFrame) -> None:
        """Dynamic partition overwrite with the session conf saved and
        restored (a leaked dynamic mode would silently turn a later
        user's full overwrite into a partial one).

        The merged frame arrives key-hash-partitioned (the merge's own
        shuffle), so writing it directly sprays every bucket across up
        to spark.sql.shuffle.partitions sliver files PER REWRITE —
        measured 31 files/bucket at 32 shuffle partitions, and at
        1600 buckets the resulting ~50k file commits+opens were the
        dominant update cost (SCALING.md round-9 addendum). One extra
        exchange ON THE BUCKET COLUMN makes every bucket exactly one
        task's rows → ONE file per bucket directory per rewrite; the
        store stays read-efficient for the partition-pruned probes all
        the incremental operators rely on. Buckets larger than one
        comfortable task are the n_buckets knob's job (size ∝ √N), not
        the writer's."""
        prev = self.spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (
                merged.repartition(F.col(_BUCKET))
                .write.mode("overwrite")
                .partitionBy(_BUCKET)
                .parquet(self.root)
            )
        finally:
            self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    def _delete_bucket_dir(self, bucket: int) -> None:
        """Remove one bucket partition directory through the Hadoop
        FileSystem API — scheme-agnostic (local fs, HDFS, S3A), driver-
        side, and bounded by n_buckets calls per batch."""
        jvm = self.spark._jvm
        path = jvm.org.apache.hadoop.fs.Path(f"{self.root}/{_BUCKET}={bucket}")
        fs = path.getFileSystem(self.spark._jsc.hadoopConfiguration())
        fs.delete(path, True)

    def apply_additive(self, delta: DataFrame, value_cols: list[str]) -> dict:
        """Continuous-aggregate maintenance (hypertable-style rollup):
        per-key numeric accumulators are ADDED into the state instead of
        replaced. ``delta`` carries key_cols + value_cols (typically the
        partial aggregate of one micro-batch — e.g. counts/sums per
        time bucket); keys absent from the state are inserted.

        Same bucket-pruned economics as apply(): only buckets whose
        keys appear in the delta are read or rewritten. NOT idempotent
        under replay (addition double-counts) — pair with the streaming
        checkpoint, which guarantees each micro-batch's delta is
        produced once.
        """
        return self.apply_merge(delta, value_cols, how="sum")

    def apply_merge(
        self, delta: DataFrame, value_cols: list[str], how: str | dict[str, str] = "sum"
    ) -> dict:
        """Per-key accumulator merge with a chosen combine function:
        ``sum`` (additive rollup — see apply_additive), ``max`` or
        ``min`` (lattice merges; structs order lexicographically, so an
        argmin/argmax like OHLC's (ts, tiebreak, value) open/close is a
        lattice too). ``how`` may be one function for every column or a
        per-column dict (e.g. OHLC: min/max structs + max/min doubles).
        The lattice merges are IDEMPOTENT — replaying a batch cannot
        move the state — which is what makes a persistent sketch store
        (HLL registers merge by max, functions/sketches.py) and the
        incremental OHLC store exactly-once under foreachBatch replay
        with no extra commit protocol; mixing ``sum`` in forfeits that
        (addition double-counts on replay)."""
        hows = {c: how for c in value_cols} if isinstance(how, str) else dict(how)
        if set(hows) != set(value_cols):
            raise ValueError(f"per-column merge spec {sorted(hows)} != value_cols {sorted(value_cols)}")
        bad = {h for h in hows.values() if h not in ("sum", "max", "min")}
        if bad:
            raise ValueError(f"unsupported merge: {sorted(bad)!r}")
        if not self.exists():
            raise RuntimeError(f"state table at {self.root} not initialized; call init() first")
        self._check_sidecar()
        # the output projection below loops over the STATE schema, so a
        # value_col the state doesn't know (or one shadowing a key)
        # would be silently dropped — every batch's accumulator data
        # lost while success stats are returned. Fail loudly instead.
        state_cols = {c.lower() for c in self._state_columns()}
        missing = [c for c in value_cols if c.lower() not in state_cols]
        if missing:
            raise ValueError(
                f"value_cols {missing} absent from the state schema "
                f"{sorted(state_cols)}; init() the table with every "
                "accumulator column (merge never auto-evolves the schema)"
            )
        shadowed = [c for c in value_cols if c in self.key_cols]
        if shadowed:
            raise ValueError(f"value_cols {shadowed} are key columns")
        fns = {"sum": F.sum, "max": F.max, "min": F.min}
        delta = delta.groupBy(*self.key_cols).agg(
            *[fns[hows[c]](c).alias(c) for c in value_cols]
        )
        with_bucket = delta.withColumn(_BUCKET, self._bucket_col()).localCheckpoint()
        touched = sorted(r[_BUCKET] for r in with_bucket.select(_BUCKET).distinct().collect())
        if not touched:
            return {"touched_buckets": [], "merged_keys": 0}

        state = self._read_buckets(touched)
        payload_cols = state.columns
        s = state.alias("s")
        d = with_bucket.drop(_BUCKET).alias("d")
        joined = s.join(d, on=self.key_cols, how="full_outer")
        merged_cols = []
        for c in payload_cols:
            if c in self.key_cols:
                continue
            if c in value_cols:
                if hows[c] == "sum":
                    combined = F.coalesce(F.col(f"s.{c}"), F.lit(0)) + F.coalesce(
                        F.col(f"d.{c}"), F.lit(0)
                    )
                elif hows[c] == "max":
                    # greatest/least ignore NULLs, so a key on only one
                    # side keeps that side's value
                    combined = F.greatest(F.col(f"s.{c}"), F.col(f"d.{c}"))
                else:
                    combined = F.least(F.col(f"s.{c}"), F.col(f"d.{c}"))
                merged_cols.append(combined.alias(c))
            else:
                # non-accumulator payload exists only on the state side;
                # null for freshly-inserted keys
                merged_cols.append(F.col(f"s.{c}").alias(c))
        merged = joined.select(*self.key_cols, *merged_cols).withColumn(
            _BUCKET, self._bucket_col()
        )
        # full-outer join keeps every delta key, so no touched bucket can
        # come out empty here — only the save/restore wrapper is needed
        self._overwrite_dynamic(merged)
        return {"touched_buckets": touched, "merged_keys": with_bucket.count()}
