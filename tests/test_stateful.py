"""Stateful streaming: cross-batch stale-position suppression."""

from __future__ import annotations

import json
import os

from xxt_cdc_spark.streaming.pipeline import read_envelope_stream
from xxt_cdc_spark.streaming.stateful import suppress_stale


def _env(key, pos, op="U"):
    return {
        "db": "testdb", "table": "orders", "op": op,
        "ts": "2024-01-01T00:00:00", "pos_file": "f", "pos_offset": pos,
        "gtid": None, "key": json.dumps({"k": key}), "before": None,
        "after": json.dumps({"k": key, "v": pos}),
    }


class TestSuppressStale:
    def test_stale_and_duplicate_positions_dropped_across_batches(self, spark, tmp_path):
        src = str(tmp_path / "src")
        os.makedirs(src)
        # batch 1: key A advances to pos 30; key B to pos 10
        with open(os.path.join(src, "b1.json"), "w") as f:
            for e in [_env("A", 10, "I"), _env("A", 30), _env("B", 10, "I")]:
                f.write(json.dumps(e) + "\n")
        # batch 2 (separate file): replay of A@30 (duplicate), stale A@20,
        # fresh A@40, fresh B@11
        with open(os.path.join(src, "b2.json"), "w") as f:
            for e in [_env("A", 30), _env("A", 20), _env("A", 40), _env("B", 11)]:
                f.write(json.dumps(e) + "\n")

        gated = suppress_stale(
            read_envelope_stream(spark, src, max_files_per_trigger=1)
        )
        seen: list[tuple] = []
        q = (
            gated.writeStream.foreachBatch(
                lambda df, _id: seen.extend(
                    (r.key, r.pos_offset) for r in df.select("key", "pos_offset").collect()
                )
            )
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

        a = sorted(p for k, p in seen if "A" in k)
        b = sorted(p for k, p in seen if "B" in k)
        assert a == [10, 30, 40]  # 30-replay and stale 20 suppressed
        assert b == [10, 11]

    def test_within_batch_order_preserved(self, spark, tmp_path):
        src = str(tmp_path / "src")
        os.makedirs(src)
        with open(os.path.join(src, "b1.json"), "w") as f:
            # arrival order scrambled; operator sorts by position
            for e in [_env("C", 3), _env("C", 1, "I"), _env("C", 2)]:
                f.write(json.dumps(e) + "\n")
        gated = suppress_stale(read_envelope_stream(spark, src))
        rows: list[int] = []
        q = (
            gated.writeStream.foreachBatch(
                lambda df, _id: rows.extend(r.pos_offset for r in df.orderBy("pos_offset").collect())
            )
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert rows == [1, 2, 3]
