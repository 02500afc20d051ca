"""Two-stage windowed top-k store: exactly-once maintenance + rank."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from xxt_cdc_spark.operators.topk_store import WindowedTopK

SCHEMA = "event_type string, ts timestamp"


def _df(spark, rows):
    return spark.createDataFrame(rows, "event_type string, ts string").select(
        "event_type", F.col("ts").cast("timestamp").alias("ts")
    )


H0 = "2024-01-01 00:{m:02d}:00"
H1 = "2024-01-01 01:{m:02d}:00"
H2 = "2024-01-01 02:{m:02d}:00"


class TestWindowedTopKStore:
    def test_fold_replay_and_closed_semantics(self, spark, tmp_path):
        store = WindowedTopK(spark, str(tmp_path / "st"), window_seconds=3600)
        b0 = [("a", H0.format(m=5)), ("a", H0.format(m=10)), ("b", H0.format(m=15))]
        b1 = [("b", H0.format(m=20)), ("c", H1.format(m=5))]
        store.apply_batch(_df(spark, b0), 0)
        store.apply_batch(_df(spark, b1), 1)
        # replays of BOTH committed batches must be no-ops (sum-merge
        # would double-count without the commit gate)
        store.apply_batch(_df(spark, b0), 0)
        store.apply_batch(_df(spark, b1), 1)

        # hour 0 closed (hour 1 observed); hour 1 still open
        closed = sorted(
            (r.window_start.isoformat(), r.rank, r.event_type, r.n)
            for r in store.topk(2).collect()
        )
        assert closed == [
            ("2024-01-01T00:00:00", 1, "a", 2),
            ("2024-01-01T00:00:00", 2, "b", 2),
        ]
        allw = sorted(
            (r.window_start.isoformat(), r.rank, r.event_type, r.n)
            for r in store.topk(2, include_open=True).collect()
        )
        assert allw == closed + [("2024-01-01T01:00:00", 1, "c", 1)]

    def test_crash_before_commit_then_replay(self, spark, tmp_path):
        store = WindowedTopK(spark, str(tmp_path / "st"), window_seconds=3600)
        store.apply_batch(_df(spark, [("a", H0.format(m=5))]), 0)

        # crash AFTER the version-dir write but BEFORE the commit marker:
        # the partial b1 dir exists, the marker still says batch 0
        broken = WindowedTopK(spark, str(tmp_path / "st"), window_seconds=3600)
        broken._commit = lambda meta: (_ for _ in ()).throw(RuntimeError("crash"))
        with pytest.raises(RuntimeError, match="crash"):
            broken.apply_batch(_df(spark, [("a", H0.format(m=10))]), 1)
        assert os.path.isdir(tmp_path / "st" / "b1")
        assert store._meta()["batch_id"] == 0

        # replay of batch 1 rewrites b1 identically and commits
        store.apply_batch(_df(spark, [("a", H0.format(m=10))]), 1)
        store.apply_batch(_df(spark, [("z", H1.format(m=0))]), 2)  # closes h0
        got = [(r.rank, r.event_type, r.n) for r in store.topk(3).collect()]
        assert got == [(1, "a", 2)]

    def test_trailing_bucket_economics(self, spark, tmp_path):
        """An advancing stream must not rewrite long-closed range
        buckets: their version pins stay at the old batch id."""
        store = WindowedTopK(
            spark, str(tmp_path / "st"), window_seconds=3600, windows_per_bucket=2
        )
        store.apply_batch(_df(spark, [("a", H0.format(m=5))]), 0)  # wb 236796 (w=473592)
        v0 = dict(store._meta()["versions"])
        assert len(v0) == 1
        (wb0,) = v0
        # two days later: a different range bucket; wb0 untouched
        store.apply_batch(_df(spark, [("b", "2024-01-03 07:05:00")]), 1)
        v1 = store._meta()["versions"]
        assert v1[wb0] == 0 and len(v1) == 2
        assert os.path.isdir(tmp_path / "st" / "b0" / f"wb={wb0}")

    def test_retention_drops_only_fully_expired_buckets(self, spark, tmp_path):
        store = WindowedTopK(
            spark, str(tmp_path / "st"), window_seconds=3600, windows_per_bucket=2
        )
        store.apply_batch(_df(spark, [("a", H0.format(m=5))]), 0)
        store.apply_batch(_df(spark, [("b", "2024-01-05 00:05:00")]), 1)
        v = dict(store._meta()["versions"])
        assert len(v) == 2
        # keep 4 windows: the Jan-1 bucket (95 windows behind) expires,
        # the Jan-5 bucket (holds max_w) survives
        dropped = store.expire(keep_windows=4)
        assert len(dropped) == 1
        left = store._meta()["versions"]
        assert len(left) == 1 and str(dropped[0]) not in left
        import os as _os

        # ONE-GENERATION GRACE (r6 ADVICE): the doomed dir survives the
        # expire() that dereferenced it — a serving plan pinned moments
        # earlier must not hit FileNotFound at action time. It is
        # queued through pending_gc and deleted by the NEXT drain.
        assert _os.path.isdir(tmp_path / "st" / "b0" / f"wb={dropped[0]}")
        assert [tuple(x) for x in store._meta()["pending_gc"]] == [
            (dropped[0], 0)
        ]
        # reads keep working on the survivor
        assert store.topk(1, include_open=True).count() == 1
        # idempotent / nothing more to drop; the second expire() drains
        # the first one's queue — NOW the dir is gone
        assert store.expire(keep_windows=4) == []
        assert not _os.path.isdir(tmp_path / "st" / "b0" / f"wb={dropped[0]}")

        # r5 review finding: a straggler below the retention floor must
        # NOT resurrect the dropped bucket as a fresh (wrong) count map
        store.apply_batch(_df(spark, [("ghost", H0.format(m=30))]), 2)
        assert str(dropped[0]) not in store._meta()["versions"]
        got = [r.event_type for r in store.topk(5, include_open=True).collect()]
        assert got == ["b"]  # only the surviving bucket's key

    def test_streaming_foreachbatch_restart_matches_twin(self, spark, tmp_path):
        """Real foreachBatch feed with a checkpoint restart mid-stream:
        the store must equal the one-shot batch twin (the streaming
        engine replays the last uncommitted batch on restart — the
        commit protocol absorbs it)."""
        from xxt_cdc_spark.queries.streaming import (
            TOPK_WINDOW_K,
            _events,
            stream_topk_per_window,
        )

        ev = _events(spark, "/root/testdata/sf0.001").select(
            "event_type", "ts", "event_id"
        )
        rows = ev.orderBy("ts", "event_id").collect()
        src = tmp_path / "src"
        src.mkdir()
        chunk = (len(rows) + 3) // 4
        for i in range(4):
            with open(src / f"f{i}.json", "w") as f:
                for r in rows[i * chunk : (i + 1) * chunk]:
                    f.write(
                        json.dumps(
                            {"event_type": r.event_type, "ts": r.ts.isoformat()}
                        )
                        + "\n"
                    )

        store = WindowedTopK(spark, str(tmp_path / "st"), window_seconds=3600)

        def run():
            from conftest import stamp_feed

            stamp_feed(src)
            stream = (
                spark.readStream.schema(SCHEMA)
                .option("maxFilesPerTrigger", "1")
                .json(str(src))
            )
            q = (
                stream.writeStream.foreachBatch(store.foreach_batch())
                .option("checkpointLocation", str(tmp_path / "ck"))
                .trigger(availableNow=True)
                .start()
            )
            assert q.awaitTermination(300)

        run()   # files 0-3
        run()   # restart: no new data, replays nothing, must not corrupt
        got = sorted(
            (r.window_start, r.rank, r.event_type, r.n)
            for r in store.topk(TOPK_WINDOW_K, include_open=True).collect()
        )
        want = sorted(
            (r.window_start, r.rank, r.event_type, r.n)
            for r in stream_topk_per_window(spark, "/root/testdata/sf0.001").collect()
        )
        assert got == want and len(want) > 100


class TestStoreGcHygiene:
    def test_no_stranded_dirs_and_one_generation_grace(self, spark, tmp_path):
        """Superseded wb version dirs survive exactly ONE maintenance
        commit (grace for concurrently-planned serving reads), their
        empty b{N} parents are removed with them, and the store floor
        stays correct throughout."""
        import os

        from xxt_cdc_spark.operators.topk_store import WindowedTopK

        root = str(tmp_path / "tk")
        store = WindowedTopK(spark, root, key_col="k", ts_col="ts", window_seconds=3600)

        def batch(i):
            return spark.createDataFrame(
                [(f"2024-01-01 0{i}:00:00", "a"), (f"2024-01-01 0{i}:00:00", "b")],
                "ts string, k string",
            )

        store.apply_batch(batch(0), 0)
        store.apply_batch(batch(1), 1)  # supersedes b0/wb=...; b0 queued (grace)
        dirs_after_1 = {n for n in os.listdir(root) if n.startswith("b")}
        assert "b0" in dirs_after_1 and "b1" in dirs_after_1  # grace holds b0
        store.apply_batch(batch(2), 2)  # b0's pending GC executes now
        dirs_after_2 = {n for n in os.listdir(root) if n.startswith("b")}
        assert "b0" not in dirs_after_2  # wb child AND empty parent gone
        assert "b1" in dirs_after_2 and "b2" in dirs_after_2
        # serving still exact after all GC
        got = {(r["_w"], r["_k"]): r["n"] for r in store.counts(include_open=True).collect()}
        assert len(got) == 6 and all(n == 1 for n in got.values())
