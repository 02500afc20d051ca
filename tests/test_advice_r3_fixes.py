"""Regression tests for the round-3 advisor findings (ADVICE.md):

1. Binlog file order must be numeric on the rotation suffix — MySQL
   widens the suffix past its zero-padding, and lexicographic compare
   inverts 'binlog.1000000' vs 'binlog.999999'. Applies to the source
   (_binlog_files/_plan/latestOffset/commit) AND to the position model
   (FilePosition ordering, the position_after Column predicate).
2. latestOffset pins per-file end offsets for fully-consumed
   intermediate files, so a replayed batch stays byte-identical even
   when a torn tail completes between the original run and the replay.
3. _read_range must short-circuit a zero-length range without opening
   the file (fresh empty dir / purged file → no FileNotFoundError).
4. gtid_not_executed must keep rows whose transaction part is not a
   plain integer (range form 'uuid:1-5') — NULL from the cast must not
   poison the predicate into silently dropping the row.
5. ContinuousAggregate replay-skip must gate on the parquet _SUCCESS
   marker, not os.path.isdir — a crash mid-write leaves a partial dir
   that must be recomputed, not committed.
6. JdbcUpsertWriter._acquire must not hold the global pool lock while
   the connect retry loop sleeps — one task's connect storm must not
   stall every other writer's acquire.
"""

from __future__ import annotations

import os
import threading

from pyspark.sql import functions as F

from xxt_cdc_spark.model.gtid import GTIDSet, gtid_not_executed
from xxt_cdc_spark.model.positions import FilePosition, position_after
from xxt_cdc_spark.streaming.binlog_source import (
    BinlogRange,
    BinlogStreamReader,
    _binlog_files,
    _plan,
    _read_range,
)

U1 = "3e11fa47-71ca-11e1-9e33-c80aa9429562"


def _write(path: str, name: str, lines: list[dict]) -> None:
    import json

    with open(os.path.join(path, name), "a", encoding="utf-8") as f:
        for r in lines:
            f.write(json.dumps(r, separators=(",", ":")) + "\n")


def _rec(k: int) -> dict:
    return {"db": "d", "table": "t", "op": "I", "key": str(k), "after": "{}"}


class TestNumericFileOrder:
    def test_binlog_files_sort_numeric(self, tmp_path):
        d = str(tmp_path)
        for name in ("binlog.1000000", "binlog.999999"):
            _write(d, name, [_rec(1)])
        assert _binlog_files(d) == ["binlog.999999", "binlog.1000000"]

    def test_plan_spans_suffix_widening(self, tmp_path):
        d = str(tmp_path)
        _write(d, "binlog.999999", [_rec(1)])
        _write(d, "binlog.1000000", [_rec(2)])
        end_file = os.path.getsize(os.path.join(d, "binlog.1000000"))
        parts = _plan(
            d,
            {"file": "binlog.999999", "pos": 0},
            {"file": "binlog.1000000", "pos": end_file},
            0,
        )
        assert [p.filename for p in parts] == ["binlog.999999", "binlog.1000000"]

    def test_latest_offset_rolls_across_widened_suffix(self, tmp_path):
        d = str(tmp_path)
        _write(d, "binlog.999999", [_rec(1)])
        _write(d, "binlog.1000000", [_rec(2)])
        r = BinlogStreamReader({"path": d})
        end = r.latestOffset()
        assert end["file"] == "binlog.1000000"
        # the fully-consumed predecessor's end is pinned in the offset
        assert end["ends"]["binlog.999999"] == os.path.getsize(
            os.path.join(d, "binlog.999999")
        )

    def test_fileposition_numeric_order(self):
        assert FilePosition("binlog.999999", 100) < FilePosition("binlog.1000000", 0)
        # non-numeric filenames keep the lexicographic fallback
        assert FilePosition("a", 1) < FilePosition("b", 0)

    def test_position_after_column_numeric(self, spark):
        df = spark.createDataFrame(
            [("binlog.999999", 10), ("binlog.999999", 60), ("binlog.1000000", 4)],
            "pos_file string, pos_offset long",
        )
        kept = df.filter(position_after(("binlog.999999", 50))).collect()
        got = {(r.pos_file, r.pos_offset) for r in kept}
        assert got == {("binlog.999999", 60), ("binlog.1000000", 4)}


class TestPinnedEnds:
    def test_replay_ignores_completed_torn_tail(self, tmp_path):
        d = str(tmp_path)
        _write(d, "binlog.000001", [_rec(1)])
        fp1 = os.path.join(d, "binlog.000001")
        complete1 = os.path.getsize(fp1)
        with open(fp1, "a", encoding="utf-8") as f:
            f.write('{"db":"d","table":"t","op":"I","key":"torn"')  # no newline
        _write(d, "binlog.000002", [_rec(2)])

        r = BinlogStreamReader({"path": d})
        start = r.initialOffset()
        end = r.latestOffset()
        assert end["ends"]["binlog.000001"] == complete1

        # the torn tail completes AFTER the offset was recorded
        with open(fp1, "a", encoding="utf-8") as f:
            f.write(',"after":"{}"}\n')
        parts = _plan(d, start, end, 0)
        p1 = [p for p in parts if p.filename == "binlog.000001"]
        assert p1 and p1[0].end == complete1  # byte-identical replay


class TestEmptyRangeNoop:
    def test_zero_length_range_missing_file(self, tmp_path):
        part = BinlogRange(str(tmp_path), "binlog.000001", 0, 0)
        assert list(_read_range(part)) == []  # pre-fix: FileNotFoundError

    def test_partitions_empty_dir_batch_is_noop(self, tmp_path):
        r = BinlogStreamReader({"path": str(tmp_path)})
        start = r.initialOffset()
        parts = r.partitions(start, start)
        assert len(parts) == 1
        assert list(_read_range(parts[0])) == []


class TestGtidRangeFormKept:
    def test_range_form_not_silently_dropped(self, spark):
        executed = GTIDSet.parse(f"{U1}:1-10")
        df = spark.createDataFrame(
            [
                (f"{U1}:5", "in_set"),
                (f"{U1}:11", "after_set"),
                (f"{U1}:1-5", "range_form"),
                (None, "no_gtid"),
            ],
            "gtid string, tag string",
        )
        kept = {r.tag for r in df.filter(gtid_not_executed(executed)).collect()}
        # unparseable txid fails OPEN (kept), like NULL gtid
        assert kept == {"after_set", "range_form", "no_gtid"}


class TestPartialVersionDirRecomputed:
    def test_crash_during_version_write_recomputes(self, spark, tmp_path):
        from xxt_cdc_spark.operators.incremental_agg import ContinuousAggregate

        ca = ContinuousAggregate(
            spark, str(tmp_path / "ca"), ["id"], ["grp"], ["v"],
            ["pos_file", "pos_offset"], n_buckets=4,
        )
        # simulate a crash DURING merged.write.parquet: partial dir,
        # only _temporary, no _SUCCESS
        vdir = ca._vdir(0)
        os.makedirs(os.path.join(vdir, "_temporary"))
        batch0 = spark.createDataFrame(
            [("I", "f", 1, 1, "a", 10.0), ("I", "f", 2, 2, "a", 5.0)],
            "op string, pos_file string, pos_offset long, id long, grp string, v double",
        )
        ca.apply_batch(batch0, 0)
        got = {r.grp: (r.n, float(r.v_sum)) for r in ca.read().collect()}
        assert got == {"a": (2, 15.0)}  # pre-fix: empty/corrupt version committed


class TestPoolLockNotHeldDuringConnect:
    def test_slow_connect_does_not_stall_other_pool_keys(self, tmp_path):
        import sqlite3

        from xxt_cdc_spark.sinks.upsert import JdbcUpsertWriter

        release = threading.Event()
        entered = threading.Event()

        def slow_connect():
            entered.set()
            assert release.wait(30), "test deadlock: release never set"
            return sqlite3.connect(str(tmp_path / "a.db"))

        w_slow = JdbcUpsertWriter(
            slow_connect, "t", ["k"], ["k"], dialect="sqlite",
            pool_key=f"slow-{id(release)}",
        )
        w_fast = JdbcUpsertWriter(
            lambda: sqlite3.connect(str(tmp_path / "b.db")),
            "t", ["k"], ["k"], dialect="sqlite",
            pool_key=f"fast-{id(release)}",
        )

        done = threading.Event()
        t = threading.Thread(target=lambda: (w_slow._acquire(), done.set()))
        t.start()
        try:
            assert entered.wait(30)
            # while the slow connect is in flight, a DIFFERENT pool key
            # must acquire without blocking (pre-fix: lock held through
            # the connect + its backoff sleeps)
            conn, pooled = w_fast._acquire()
            assert pooled and conn is not None
        finally:
            release.set()
            t.join(30)
        assert done.is_set()
