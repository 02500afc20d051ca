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

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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
        return os.path.isdir(self.root) and any(
            name.startswith(f"{_BUCKET}=") for name in os.listdir(self.root)
        )

    def init(self, snapshot: DataFrame) -> None:
        """Bulk-load the initial state (snapshot phase, O18)."""
        (
            snapshot.withColumn(_BUCKET, self._bucket_col())
            .write.mode("overwrite")
            .partitionBy(_BUCKET)
            .parquet(self.root)
        )

    def read(self) -> DataFrame:
        return self.spark.read.parquet(self.root).drop(_BUCKET)

    def _read_buckets(self, buckets: list[int]) -> DataFrame:
        # partition pruning: the filter on the partition column prunes
        # directories at planning time — untouched buckets are not read
        return (
            self.spark.read.parquet(self.root)
            .filter(F.col(_BUCKET).isin(buckets))
            .drop(_BUCKET)
        )

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
        latest = last_write_wins(changes, self.key_cols, order_cols).localCheckpoint()
        with_bucket = latest.withColumn(_BUCKET, self._bucket_col())
        touched = sorted(
            r[_BUCKET] for r in with_bucket.select(_BUCKET).distinct().collect()
        )
        if not touched:
            return {"touched_buckets": [], "upserts": 0, "deletes": 0}

        state = self._read_buckets(touched)
        payload_cols = state.columns  # state carries payload only
        upserts = with_bucket.filter(F.col(op_col) != OP_DELETE).select(*payload_cols, _BUCKET)
        touched_keys = with_bucket.select(*self.key_cols)
        kept = state.withColumn(_BUCKET, self._bucket_col()).join(
            touched_keys, on=self.key_cols, how="left_anti"
        )
        merged = kept.select(*payload_cols, _BUCKET).unionByName(upserts)

        # dynamic partition overwrite: only partitions present in
        # `merged` (= the touched buckets) are replaced
        self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        merged.write.mode("overwrite").partitionBy(_BUCKET).parquet(self.root)
        n_up = upserts.count()
        return {
            "touched_buckets": touched,
            "upserts": n_up,
            "deletes": latest.count() - n_up,
        }
