"""GTID positions wired through the stream/resume path (r2 verdict
"missing" #2): ``GTIDPosition`` round-trips through
``commit_position``/``resume_position``/watermarks, and
``position_after`` compiles a GTID set into a JVM-side containment
gate over the ``gtid`` column (reference MySQLBinlogReader.scala:127-131
``setGtidSet``)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from xxt_cdc_spark.engine import CDCEngine, WatermarkStore
from xxt_cdc_spark.model.gtid import GTIDSet, gtid_not_executed
from xxt_cdc_spark.model.positions import GTIDPosition, position_after, position_in_range
from xxt_cdc_spark.model.states import CDCState

U1 = "3e11fa47-71ca-11e1-9e33-c80aa9429562"
U2 = "aaaaaaaa-bbbb-cccc-dddd-eeeeeeeeeeee"


def _engine(spark, tmp_path, **kw):
    return CDCEngine(
        spark=spark,
        snapshot_source=lambda: None,
        changelog=lambda lo, hi: None,
        current_position=lambda: GTIDPosition(f"{U1}:1-10"),
        apply_fn=lambda df: None,
        checkpoint_dir=str(tmp_path / "ck"),
        **kw,
    )


class TestGtidRoundTrip:
    def test_commit_and_resume(self, spark, tmp_path):
        eng = _engine(spark, tmp_path)
        eng.commit_position(GTIDPosition(f"{U1}:1-100"))
        # stored as the portable string form
        with open(tmp_path / "ck" / "commits.json") as f:
            assert json.load(f)["position"] == f"gtid:{U1}:1-100"
        pos = eng.resume_position()
        assert isinstance(pos, GTIDPosition)
        assert pos.gtid_set == f"{U1}:1-100"

    def test_watermark_high_beats_commit(self, spark, tmp_path):
        eng = _engine(spark, tmp_path)
        eng.commit_position(GTIDPosition(f"{U1}:1-50"))
        WatermarkStore(eng.checkpoint_dir).save(
            eng.snapshot_id, GTIDPosition(f"{U1}:1-80"), GTIDPosition(f"{U1}:1-100"), "COMPLETED"
        )
        pos = eng.resume_position()
        assert isinstance(pos, GTIDPosition)
        assert pos.gtid_set == f"{U1}:1-100"

    def test_pos_advanced_uses_containment(self, spark, tmp_path):
        eng = _engine(spark, tmp_path)
        lo, hi = GTIDPosition(f"{U1}:1-10"), GTIDPosition(f"{U1}:1-12")
        assert eng._pos_advanced(lo, hi) is True
        assert eng._pos_advanced(hi, hi) is False
        # string compare would call '1-9' > '1-10' (lexicographic) —
        # containment gets it right
        assert eng._pos_advanced(GTIDPosition(f"{U1}:1-9"), GTIDPosition(f"{U1}:1-10")) is True


class TestGtidGate:
    def _feed(self, spark):
        rows = [(i, f"{U1}:{i}") for i in range(1, 21)] + [
            (100 + i, f"{U2}:{i}") for i in range(1, 6)
        ] + [(999, None)]
        return spark.createDataFrame(rows, "pos_offset long, gtid string")

    def test_position_after_gtid(self, spark):
        df = self._feed(spark)
        kept = df.filter(position_after(GTIDPosition(f"{U1}:1-15,{U2}:1-5"))).collect()
        ids = sorted(r.pos_offset for r in kept)
        # U1 16..20 remain, all U2 executed, NULL gtid kept
        assert ids == [16, 17, 18, 19, 20, 999]

    def test_gap_in_executed_set_replays(self, spark):
        df = self._feed(spark)
        kept = df.filter(gtid_not_executed(GTIDSet.parse(f"{U1}:1-6:8-20,{U2}:1-5")))
        ids = sorted(r.pos_offset for r in kept.collect())
        assert ids == [7, 999]  # the gap transaction replays

    def test_gtid_range_cut(self, spark):
        df = self._feed(spark)
        cut = df.filter(
            position_in_range(GTIDPosition(f"{U1}:1-5"), GTIDPosition(f"{U1}:1-15"))
        )
        ids = sorted(r.pos_offset for r in cut.collect())
        # (lo, hi]: after lo AND contained in hi; NULL-gtid rows are
        # kept by the lo gate but excluded by the hi bound
        assert ids == list(range(6, 16))

    def test_gate_is_jvm_side(self, spark):
        """The GTID gate must compile to Catalyst expressions (no
        Python UDF): BatchEvalPython in the plan would mean a
        per-row Python round-trip on the hot path."""
        df = self._feed(spark)
        plan = df.filter(
            position_after(GTIDPosition(f"{U1}:1-15"))
        )._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan


class TestGtidStreamE2E:
    def test_stream_resume_skips_executed(self, spark, tmp_path):
        """Engine streaming attach in GTID mode over the binlog
        transport: transactions in the committed executed set never
        reach the sink; later ones arrive exactly once."""
        from xxt_cdc_spark.streaming.binlog_source import (
            BinlogLogWriter,
            read_binlog_stream,
        )

        log = str(tmp_path / "log")
        w = BinlogLogWriter(log)
        w.append(
            [
                {
                    "db": "d",
                    "table": "t",
                    "op": "I",
                    "ts": None,
                    "gtid": f"{U1}:{i}",
                    "key": json.dumps({"id": i}),
                    "before": None,
                    "after": json.dumps({"id": i}),
                }
                for i in range(1, 31)
            ]
        )
        eng = _engine(spark, tmp_path)
        eng.commit_position(GTIDPosition(f"{U1}:1-22"))
        eng.state = CDCState.CATCHUP
        seen: list[int] = []

        def apply(batch_df, _id):
            seen.extend(
                json.loads(r.key)["id"] for r in batch_df.select("key").collect()
            )

        q = eng.start_streaming_query(
            read_binlog_stream(spark, log), apply, available_now=True
        )
        q.awaitTermination(120)
        assert sorted(seen) == list(range(23, 31))


class TestGtidGateFuzz:
    def test_compiled_gate_matches_python_containment(self, spark):
        """Fuzz the SQL compilation: for randomized executed sets
        (multiple UUIDs, gaps, singletons, adjacent-merge cases) and
        randomized event GTIDs, the JVM BETWEEN gate must agree with
        the pure-Python interval algebra row for row. One seeded batch
        per round drives Spark once (per-example hypothesis rounds are
        too slow for JVM calls)."""
        import random

        for seed in (1, 7, 42):
            rng = random.Random(seed)
            uuids = [U1, U2, "cccccccc-dddd-eeee-ffff-000000000000"]
            parts = []
            for u in uuids:
                ivs = []
                lo = 1
                for _ in range(rng.randint(1, 4)):
                    lo += rng.randint(0, 40)
                    hi = lo + rng.randint(0, 30)
                    ivs.append(f"{lo}-{hi}" if hi > lo else str(lo))
                    lo = hi + 2  # leave gaps
                parts.append(f"{u}:{':'.join(ivs)}")
            executed = GTIDSet.parse(",".join(parts[: rng.randint(1, 3)]))

            rows = []
            for i in range(300):
                u = rng.choice(uuids + ["not-in-set-uuid"])
                txid = rng.randint(1, 200)
                rows.append((i, f"{u}:{txid}"))
            rows.append((9000, None))  # NULL gtid row must be kept
            df = spark.createDataFrame(rows, "rid long, gtid string")

            kept_spark = {
                r.rid
                for r in df.filter(gtid_not_executed(executed)).collect()
            }
            kept_py = {
                rid
                for rid, g in rows
                if g is None or not executed.contains(GTIDSet.parse(g))
            }
            assert kept_spark == kept_py, f"seed {seed} diverged"
