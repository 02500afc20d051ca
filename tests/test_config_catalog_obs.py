"""Config validation, catalog discovery, metrics/health tests."""

from __future__ import annotations

from xxt_cdc_spark.catalog.discovery import CORPUS_PRIMARY_KEYS, ParquetCatalogService
from xxt_cdc_spark.config import CDCConfig, ParallelismConfig, SinkConfig
from xxt_cdc_spark.model.table_id import TableId
from xxt_cdc_spark.obs.metrics import HealthCheck, MetricsSnapshot


class TestConfig:
    def test_defaults_valid(self):
        assert CDCConfig().validate() == []

    def test_reference_defaults_preserved(self):
        p = ParallelismConfig()
        # reference config/CDCConfig.scala:90-96
        assert (p.partition_count, p.apply_worker_count, p.batch_size) == (64, 8, 100)

    def test_bad_values_reported_together(self):
        cfg = CDCConfig(
            parallelism=ParallelismConfig(partition_count=0, batch_size=0, commit_interval_s=0.1),
            sink=SinkConfig(kind="oracle"),
            include_tables=["x"],
            exclude_tables=["x"],
        )
        problems = cfg.validate()
        assert len(problems) >= 4
        assert any("partition_count" in p for p in problems)
        assert any("unknown sink kind" in p for p in problems)
        assert any("both include and exclude" in p for p in problems)


class TestParquetCatalog:
    def test_discovery(self, spark, sf_dir):
        cat = ParquetCatalogService(spark, sf_dir)
        metas = cat.discover_tables()
        names = {m.table.table for m in metas}
        assert {"orders", "lineitem", "customer"} <= names

    def test_table_meta(self, spark, sf_dir):
        cat = ParquetCatalogService(spark, sf_dir)
        m = cat.get_table_meta(TableId("testdb", "lineitem"))
        assert m.primary_key == ["l_orderkey", "l_linenumber"]  # composite PK
        assert any(c.name == "l_extendedprice" for c in m.columns)
        assert m.spark_schema()["l_orderkey"].dataType.simpleString() == "bigint"

    def test_cache(self, spark, sf_dir):
        cat = ParquetCatalogService(spark, sf_dir)
        a = cat.get_table_meta(TableId("testdb", "orders"))
        b = cat.get_table_meta(TableId("testdb", "orders"))
        assert a is b

    def test_corpus_pk_map_complete(self):
        assert set(CORPUS_PRIMARY_KEYS) >= {
            "region", "nation", "customer", "supplier", "part",
            "orders", "lineitem", "events", "documents", "embeddings",
        }


class TestObservability:
    def test_healthy(self):
        m = MetricsSnapshot(events_applied=1000, lag_ms=1000)
        assert HealthCheck().check(m)["status"] == "HEALTHY"

    def test_degraded_on_lag(self):
        m = MetricsSnapshot(events_applied=1000, lag_ms=10 * 60 * 1000)
        r = HealthCheck().check(m)
        assert r["status"] == "DEGRADED" and "lag" in r["problems"][0]

    def test_degraded_on_error_rate(self):
        m = MetricsSnapshot(events_applied=90, events_failed=10)
        r = HealthCheck().check(m)
        assert r["status"] == "DEGRADED" and "error rate" in r["problems"][0]

    def test_snapshot_dict_shape(self):
        d = MetricsSnapshot().as_dict()
        for key in ("events_applied", "tps_since_start", "error_rate", "lag_ms"):
            assert key in d
