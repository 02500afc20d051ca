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


class TestManagementHTTP:
    """M37/M33 ops surface: live stdlib-HTTP sidecar (reference
    api/CDCManagementAPI.scala:53-270, metrics/PrometheusMetrics.scala)."""

    def _api(self):
        from xxt_cdc_spark.api import ManagementAPI
        from xxt_cdc_spark.model.states import CDCState

        m = MetricsSnapshot(events_applied=1234, batches=7, per_table={"orders": 1000, "li": 234})
        return ManagementAPI(metrics=m, state=CDCState.STREAMING, components={"engine": "RUNNING"})

    def test_endpoints_over_http(self):
        import json
        import urllib.request

        api = self._api()
        server = api.start(port=0)
        try:
            _, port = server.server_address

            def get(path):
                with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}", timeout=5) as r:
                    return r.status, r.headers.get("Content-Type", ""), r.read().decode()

            st, _, body = get("/api/v1/health")
            assert st == 200 and json.loads(body)["status"] == "HEALTHY"
            st, _, body = get("/api/v1/status")
            assert st == 200 and json.loads(body)["state"] == "STREAMING"
            st, _, body = get("/api/v1/metrics")
            assert st == 200 and json.loads(body)["events_applied"] == 1234
            st, _, body = get("/api/v1/components")
            assert json.loads(body)["components"] == {"engine": "RUNNING"}
            st, _, body = get("/api/v1/hotset")
            assert json.loads(body)["hot_tables"][0] == {"table": "orders", "events": 1000}
            try:
                get("/nope")
                raise AssertionError("404 expected")
            except urllib.error.HTTPError as e:
                assert e.code == 404
        finally:
            server.shutdown()

    def test_config_and_table_activity_endpoints(self):
        import json
        import urllib.request

        from xxt_cdc_spark.api import ManagementAPI
        from xxt_cdc_spark.model.states import CDCState

        m = MetricsSnapshot(per_table={"orders": 900, "li": 100})
        api = ManagementAPI(
            metrics=m,
            state=CDCState.STREAMING,
            config={"source": {"host": "db1", "password": "hunter2"}, "batch_size": 100},
        )
        server = api.start(port=0)
        try:
            _, port = server.server_address

            def get(path):
                with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}", timeout=5) as r:
                    return json.loads(r.read().decode())

            cfg = get("/api/v1/config")["config"]
            assert cfg["source"]["host"] == "db1"
            assert cfg["source"]["password"] == "***"  # secrets redacted
            assert cfg["batch_size"] == 100
            act = get("/api/v1/tables/orders/activity")
            assert act == {"table": "orders", "events": 900, "share": 0.9}
            act = get("/api/v1/tables/nope/activity")
            assert act["events"] == 0
        finally:
            server.shutdown()

    def test_prometheus_exposition_over_http(self):
        import urllib.request

        api = self._api()
        server = api.start(port=0)
        try:
            _, port = server.server_address
            with urllib.request.urlopen(f"http://127.0.0.1:{port}/metrics", timeout=5) as r:
                assert r.status == 200
                assert r.headers["Content-Type"].startswith("text/plain")
                text = r.read().decode()
            # exposition format: HELP/TYPE pairs then samples
            assert "# HELP xxt_cdc_events_applied_total Change events applied to the sink" in text
            assert "# TYPE xxt_cdc_events_applied_total counter" in text
            assert "xxt_cdc_events_applied_total 1234" in text
            assert 'xxt_cdc_table_events_total{table="orders"} 1000' in text
        finally:
            server.shutdown()

    def test_performance_logger_ticks(self):
        import time as _time

        from xxt_cdc_spark.obs.report import PerformanceLogger

        m = MetricsSnapshot(events_applied=42)
        seen = []
        lg = PerformanceLogger(lambda: m, interval_s=0.05, emit=seen.append).start()
        try:
            deadline = _time.time() + 3
            while not seen and _time.time() < deadline:
                _time.sleep(0.02)
        finally:
            lg.stop()
        assert seen and "CDC performance" in seen[0] and "42" in seen[0]
        assert "42" in lg.tick()


class TestSourcePositions:
    def test_snapshot_captures_transport_offsets(self, spark, tmp_path):
        """The metrics snapshot must carry the last batch's per-source
        transport positions (S9 for the live stream) — for the binlog
        source these are the {file, pos} offsets the checkpoint owns."""
        import json as _json

        from xxt_cdc_spark.obs.metrics import snapshot_from_query
        from xxt_cdc_spark.streaming.binlog_source import (
            BinlogLogWriter,
            read_binlog_stream,
        )

        log = str(tmp_path / "log")
        w = BinlogLogWriter(log)
        w.append(
            [
                {
                    "db": "d", "table": "t", "op": "I", "ts": None, "gtid": None,
                    "key": _json.dumps({"id": i}), "before": None,
                    "after": _json.dumps({"id": i}),
                }
                for i in range(10)
            ]
        )
        q = (
            read_binlog_stream(spark, log)
            .writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        snap = snapshot_from_query(q)
        assert snap.source_positions, "no source positions captured"
        end = snap.source_positions[0]["end_offset"]
        if isinstance(end, str):
            # Python data sources serialize offsets as a dict repr
            import ast

            try:
                pos = _json.loads(end)
            except _json.JSONDecodeError:
                pos = ast.literal_eval(end)
        else:
            pos = end
        assert pos["file"] == "binlog.000001" and pos["pos"] > 0
        assert "source_positions" in snap.as_dict()
