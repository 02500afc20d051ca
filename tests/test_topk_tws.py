"""transformWithState windowed top-k vs the applyInPandasWithState
twin: same feed, identical finalized blocks (the TWS form's MapState +
event-time timers must not change a single output row)."""

from __future__ import annotations

import json

import pytest

from xxt_cdc_spark.streaming.topk_tws import streaming_topk_tws

try:  # TWS's Python driver worker imports google.protobuf at runtime
    import google.protobuf  # noqa: F401

    _HAS_PROTOBUF = True
except ImportError:
    _HAS_PROTOBUF = False

pytestmark = pytest.mark.skipif(
    not _HAS_PROTOBUF,
    reason="transformWithStateInPandas requires google.protobuf (absent in "
    "this image — the TWS driver worker crashes with ImportError in "
    "StateMessage_pb2; verified 2026-08-15). The operator module is the "
    "environment-gated modern-API twin; streaming_topk (old API) is the "
    "tested registered form.",
)

SCHEMA = "event_type string, ts timestamp"

ROWS = [
    ("a", "2024-01-01 00:05:00"),
    ("a", "2024-01-01 00:15:00"),
    ("b", "2024-01-01 00:20:00"),
    ("a", "2024-01-01 00:25:00"),
    ("c", "2024-01-01 00:40:00"),
    ("b", "2024-01-01 00:50:00"),
    ("c", "2024-01-01 01:10:00"),
    ("b", "2024-01-01 01:30:00"),
    ("d", "2024-01-01 03:45:00"),
]
# same two-sentinel determinism pattern as test_topk_stream.py: the
# second sentinel's data batch runs with the watermark already past
# every real window's end, so the timers fire in a data batch
SENTINEL = [("z", "2024-02-01 00:00:00")]
SENTINEL2 = [("z", "2024-02-01 00:10:00")]


def _write(src, name, rows):
    with open(src / name, "w") as f:
        for (k, ts) in rows:
            f.write(json.dumps({"event_type": k, "ts": ts}) + "\n")


from conftest import stamp_feed


def _run(spark, src, out, ck, k=2):
    stamp_feed(src)
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", "1").json(str(src))
    )
    q = (
        streaming_topk_tws(stream, k=k, watermark="0 seconds")
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ck))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "streaming query did not terminate"


class TestStreamingTopKTws:
    def test_matches_old_api_twin_across_restart(self, spark, tmp_path):
        src = tmp_path / "src"
        src.mkdir()
        _write(src, "f0.json", ROWS[:4])
        _write(src, "f1.json", ROWS[4:])
        _run(spark, src, tmp_path / "out", tmp_path / "ck")
        _write(src, "f2.json", SENTINEL)
        _write(src, "f3.json", SENTINEL2)
        _run(spark, src, tmp_path / "out", tmp_path / "ck")

        got = sorted(
            (r.window_start.isoformat(), r.rank, r.event_type, r.n)
            for r in spark.read.parquet(str(tmp_path / "out")).collect()
        )
        # the exact blocks test_topk_stream pins for the old API
        assert got == [
            ("2024-01-01T00:00:00", 1, "a", 3),
            ("2024-01-01T00:00:00", 2, "b", 2),
            ("2024-01-01T01:00:00", 1, "b", 1),
            ("2024-01-01T01:00:00", 2, "c", 1),
            ("2024-01-01T03:00:00", 1, "d", 1),
        ]
        assert len(got) == len({(w, r) for (w, r, *_rest) in got})

    def test_requires_watermark(self, spark, tmp_path):
        src = tmp_path / "s"
        src.mkdir()
        stream = spark.readStream.schema(SCHEMA).json(str(src))
        with pytest.raises(ValueError, match="watermark"):
            streaming_topk_tws(stream)

    def test_max_keys_refusal(self, spark, tmp_path):
        src = tmp_path / "src"
        src.mkdir()
        _write(src, "f0.json", [(f"k{i}", "2024-01-01 00:30:00") for i in range(12)])
        from py4j.protocol import Py4JJavaError
        from pyspark.errors.exceptions.captured import StreamingQueryException

        with pytest.raises((StreamingQueryException, Py4JJavaError)):
            stamp_feed(src)
            stream = (
                spark.readStream.schema(SCHEMA)
                .option("maxFilesPerTrigger", "1")
                .json(str(src))
            )
            q = (
                streaming_topk_tws(stream, k=2, watermark="0 seconds", max_keys=10)
                .writeStream.format("noop")
                .option("checkpointLocation", str(tmp_path / "ck"))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
