"""Timestamp-type inference must never leak into query semantics.

Round-2 postmortem: the driver's session read the events parquet
(annotated isAdjustedToUTC=false) as TIMESTAMP_NTZ, which broke
``unix_micros(ts)`` (lead_lag_user_gaps), ``withWatermark`` (streaming
event time), and crashed the whole official bench. The fix normalizes
every ts ingress to TIMESTAMP (LTZ): ``session.normalize_timestamps``
plus conf pins in ``get_spark`` / ``_pinned`` / ``load_tables``.

This suite recreates the hostile environment — NTZ inference forced ON
before the query runs — and proves the registry is inference-proof.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from xxt_cdc_spark.queries import QUERIES
from xxt_cdc_spark.session import load_tables, normalize_timestamps

SF_DIR = "/root/testdata/sf0.001"

# every query that touches a timestamp column anywhere in its plan
TS_SENSITIVE = [
    "lead_lag_user_gaps",
    "range_join_order_events",
    "stream_window_agg",
    "stream_sessionize",
    "asof_join_events_orders",
    "events_salted_agg",
    "cdc_envelope_roundtrip",
    "cdc_apply_upsert",
    "cdc_catchup_range",
    "q1_pricing_summary",
]


def _force_ntz(spark):
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    spark.conf.set("spark.sql.timestampType", "TIMESTAMP_NTZ")


@pytest.mark.parametrize("name", TS_SENSITIVE)
def test_query_survives_ntz_inference(spark, name):
    """Each ts-sensitive query must run and keep a TIMESTAMP/NTZ-free
    interface even when the ambient session prefers NTZ (the driver's
    round-2 environment)."""
    _force_ntz(spark)
    try:
        df = QUERIES[name](spark, SF_DIR)
        assert "timestamp_ntz" not in {t for _, t in df.dtypes}, df.dtypes
        assert df.limit(5).count() >= 0  # plan executes
    finally:
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        spark.conf.set("spark.sql.timestampType", "TIMESTAMP_LTZ")


def test_load_tables_normalizes_under_ntz(spark):
    _force_ntz(spark)
    try:
        tables = load_tables(spark, SF_DIR)
        for name, df in tables.items():
            bad = [c for c, t in df.dtypes if t == "timestamp_ntz"]
            assert not bad, f"{name} still carries NTZ columns: {bad}"
    finally:
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        spark.conf.set("spark.sql.timestampType", "TIMESTAMP_LTZ")


def test_normalize_is_value_identity_under_utc(spark):
    """NTZ→LTZ under the pinned UTC session TZ must not shift instants."""
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    try:
        raw = spark.read.parquet(f"{SF_DIR}/events.parquet")
        if dict(raw.dtypes).get("ts") != "timestamp_ntz":
            pytest.skip("corpus no longer NTZ-annotated")
        a = (
            normalize_timestamps(raw)
            .agg(F.sum(F.unix_micros("ts")).alias("s"))
            .collect()[0]["s"]
        )
        b = raw.agg(
            F.sum(F.unix_micros(F.col("ts").cast("timestamp"))).alias("s")
        ).collect()[0]["s"]
        assert a == b
    finally:
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")


def test_watermark_on_parquet_sourced_stream(spark, tmp_path):
    """withWatermark must accept the ts column of a parquet-sourced
    stream regardless of footer annotation (r2 failure #2)."""
    _force_ntz(spark)
    try:
        ev = load_tables(spark, SF_DIR, ["events"])["events"]
        stage = str(tmp_path / "ev")
        ev.limit(200).write.mode("overwrite").parquet(stage)
        sdf = (
            spark.readStream.schema(spark.read.parquet(stage).schema)
            .parquet(stage)
            .withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 hour"))
            .count()
        )
        q = (
            sdf.writeStream.format("memory")
            .queryName("ntz_wm_probe")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert spark.sql("SELECT * FROM ntz_wm_probe").count() >= 1
    finally:
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        spark.conf.set("spark.sql.timestampType", "TIMESTAMP_LTZ")
