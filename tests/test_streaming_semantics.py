"""Streaming-mode semantics: watermark transport dedup and windowed
aggregation running as actual streaming queries (not batch twins)."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from xxt_cdc_spark.api import ManagementAPI
from xxt_cdc_spark.model.states import CDCState


class TestWatermarkDedup:
    def test_duplicate_deliveries_removed_in_stream(self, spark, tmp_path):
        src = str(tmp_path / "src")
        os.makedirs(src)
        base = {
            "db": "testdb", "table": "orders", "op": "I", "gtid": None,
            "key": '{"k":1}', "before": None, "after": '{"k":1}',
        }
        events = [
            dict(base, ts="2024-01-01T00:00:00", pos_file="f", pos_offset=1),
            dict(base, ts="2024-01-01T00:00:01", pos_file="f", pos_offset=1),  # dup
            dict(base, ts="2024-01-01T00:00:02", pos_file="f", pos_offset=2),
            dict(base, ts="2024-01-01T00:00:03", pos_file="f", pos_offset=2),  # dup
            dict(base, ts="2024-01-01T00:00:04", pos_file="f", pos_offset=3),
        ]
        with open(os.path.join(src, "a.json"), "w") as f:
            for e in events:
                f.write(json.dumps(e) + "\n")

        from xxt_cdc_spark.streaming.pipeline import CDCStreamPipeline, read_envelope_stream

        seen: list[int] = []
        pipe = CDCStreamPipeline(
            spark=spark,
            source=read_envelope_stream(spark, src),
            apply_fn=lambda df, _id: seen.append(df.count()),
            checkpoint_dir=str(tmp_path / "ck"),
            dedup_watermark=("ts", "10 minutes"),
        )
        q = pipe.start(available_now=True)
        q.awaitTermination(120)
        assert sum(seen) == 3  # 5 deliveries, 3 distinct positions


class TestStreamingWindowAgg:
    def test_windowed_counts_match_batch(self, spark, sf_dir, tmp_path):
        # stream the events table through a windowed agg with watermark;
        # availableNow drains everything → results equal the batch agg
        from xxt_cdc_spark.queries.streaming import _events

        ev = _events(spark, sf_dir)
        stage = str(tmp_path / "events_parquet")
        ev.write.mode("overwrite").parquet(stage)

        stream = (
            spark.readStream.schema(spark.read.parquet(stage).schema)
            .parquet(stage)
            .withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 hour"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        q = (
            stream.writeStream.outputMode("append")
            .format("memory")
            .queryName("win_agg")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = spark.sql("SELECT count(*) AS n FROM win_agg").first().n
        batch = ev.groupBy(F.window("ts", "1 hour"), "event_type").count().count()
        # append mode emits only windows closed by the watermark; the
        # final (open) windows are withheld — allow that small tail
        assert 0 < got <= batch
        assert batch - got <= len(ev.select("event_type").distinct().collect())


class TestManagementAPI:
    def test_endpoints(self):
        api = ManagementAPI(state=CDCState.STREAMING, components={"normalizer": "RUNNING"})
        api.metrics.events_applied = 100
        api.metrics.per_table = {"orders": 60, "lineitem": 40}
        assert api.status()["state"] == "STREAMING"
        assert api.health()["status"] == "HEALTHY"
        assert api.metrics_endpoint()["events_applied"] == 100
        assert api.components_endpoint() == {"components": {"normalizer": "RUNNING"}}
        hs = api.hotset()["hot_tables"]
        assert hs[0] == {"table": "orders", "events": 60}
        assert {
            "/api/v1/health", "/api/v1/status", "/api/v1/metrics",
            "/api/v1/components", "/api/v1/hotset", "/api/v1/config",
        } <= set(api.routes())
