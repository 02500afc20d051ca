"""Ops-parity tests: Prometheus export, performance report, JDBC offset
mirror, config file loading, and the typed_all JSON-envelope roundtrip
(FIXTURES.md F2 type edges)."""

from __future__ import annotations

import sqlite3

import pytest

from xxt_cdc_spark.config import load_config
from xxt_cdc_spark.model.positions import FilePosition, GTIDPosition
from xxt_cdc_spark.obs.metrics import MetricsSnapshot
from xxt_cdc_spark.obs.report import performance_report, prometheus_text
from xxt_cdc_spark.offsets import JdbcOffsetStore


class TestPrometheus:
    def test_exposition_format(self):
        m = MetricsSnapshot(events_applied=100, events_failed=5, batches=3)
        m.per_table = {"orders": 70, "lineitem": 30}
        text = prometheus_text(m, labels={"task": "t1"})
        assert '# TYPE xxt_cdc_events_applied_total counter' in text
        assert 'xxt_cdc_events_applied_total{task="t1"} 100' in text
        assert 'xxt_cdc_table_events_total{table="orders",task="t1"} 70' in text
        assert text.endswith("\n")

    def test_report_renders(self):
        m = MetricsSnapshot(events_applied=12345)
        rep = performance_report(m)
        assert "12,345" in rep and rep.count("+") >= 4


class TestOffsetMirror:
    def test_roundtrip_and_upsert(self, tmp_path):
        db = str(tmp_path / "offsets.db")
        store = JdbcOffsetStore(lambda: sqlite3.connect(db))
        store.ensure_table()
        assert store.load("task1") is None
        store.save("task1", FilePosition("binlog.000001", 100))
        assert store.load("task1") == FilePosition("binlog.000001", 100)
        store.save("task1", FilePosition("binlog.000002", 5))  # upsert same task
        assert store.load("task1") == FilePosition("binlog.000002", 5)
        store.save("task2", GTIDPosition("uuid:1-9"))
        assert store.load("task2") == GTIDPosition("uuid:1-9")


class TestConfigLoader:
    def test_toml_roundtrip(self, tmp_path):
        p = tmp_path / "cdc.toml"
        p.write_text(
            """
include_tables = ["orders*", "lineitem"]
checkpoint_dir = "/tmp/ck"

[source]
host = "db1"
database = "prod"

[parallelism]
partition_count = 32
"""
        )
        cfg = load_config(str(p))
        assert cfg.source.host == "db1"
        assert cfg.parallelism.partition_count == 32
        assert cfg.include_tables == ["orders*", "lineitem"]

    def test_unknown_key_rejected(self, tmp_path):
        p = tmp_path / "bad.toml"
        p.write_text("not_a_real_key = 1\n")
        with pytest.raises(ValueError, match="unknown CDCConfig keys"):
            load_config(str(p))

    def test_invalid_values_rejected(self, tmp_path):
        p = tmp_path / "bad2.toml"
        p.write_text("[parallelism]\npartition_count = 0\n")
        with pytest.raises(ValueError, match="invalid config"):
            load_config(str(p))


class TestTypedAllRoundtrip:
    """F2 type-edge coverage: every mapped Spark type survives the
    envelope JSON encode/decode (to_json → from_json)."""

    def test_roundtrip(self, spark):
        from pyspark.sql import functions as F

        src = spark.sql(
            """
            SELECT * FROM VALUES
              (CAST(1 AS BIGINT), CAST(127 AS TINYINT), CAST(32000 AS SMALLINT), 42,
               CAST(9007199254740993 AS BIGINT), CAST(12345.67 AS DECIMAL(10,2)),
               CAST(1.5 AS FLOAT), CAST(2.25 AS DOUBLE), 'véré-ünïcode-字符', true,
               TIMESTAMP'2024-02-29 23:59:59.123456', DATE'2024-02-29',
               X'DEADBEEF', '{"a":1}'),
              (CAST(2 AS BIGINT), CAST(NULL AS TINYINT), CAST(NULL AS SMALLINT), NULL,
               NULL, CAST(NULL AS DECIMAL(10,2)), CAST(NULL AS FLOAT),
               CAST(NULL AS DOUBLE), NULL, NULL, NULL, NULL, NULL, NULL)
            AS t(id, c_tiny, c_small, c_int, c_big, c_dec, c_float, c_double,
                 c_str, c_bool, c_ts, c_date, c_bin, c_json)
            """
        )
        from xxt_cdc_spark.model.envelope import JSON_OPTS

        # JSON_OPTS pins micro-precision timestamps: the default
        # to_json truncates to milliseconds (found by this test)
        env = src.select(F.to_json(F.struct(*src.columns), JSON_OPTS).alias("j"))
        back = env.select(F.from_json("j", src.schema, JSON_OPTS).alias("r")).select("r.*")
        a = src.orderBy("id").collect()
        b = back.orderBy("id").collect()
        assert len(a) == len(b) == 2
        for ra, rb in zip(a, b):
            for col in src.columns:
                va, vb = ra[col], rb[col]
                assert va == vb or (va is None and vb is None), (col, va, vb)
