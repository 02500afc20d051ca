"""Property-style invariant tests (SURVEY.md §5.3):

final state == last-write-wins replay by position, for randomized
interleaved I/U/D histories per key including insert→delete→re-insert
and duplicate deliveries. One seeded large history drives Spark once
(JVM round-trips are too slow for per-example hypothesis runs); pure-
Python components get real hypothesis fuzzing.
"""

from __future__ import annotations

import random

from hypothesis import given, settings
from pyspark.sql import functions as F
from hypothesis import strategies as st

from xxt_cdc_spark.model.positions import BinlogPosition, FilePosition
from xxt_cdc_spark.model.table_id import TableId
from xxt_cdc_spark.operators.apply import apply_changes
from xxt_cdc_spark.operators.collapse import last_write_wins
from xxt_cdc_spark.operators.table_filter import TableFilter


def _random_history(seed: int, n_keys: int = 150, max_events: int = 12):
    rng = random.Random(seed)
    events = []
    pos = 0
    for key in range(n_keys):
        alive = False
        for _ in range(rng.randint(1, max_events)):
            pos += 1
            if not alive:
                op = "I"
                alive = True
            else:
                op = rng.choice(["U", "U", "D"])
                alive = op != "D"
            val = rng.randint(0, 10_000)
            events.append((key, op, pos, val))
            if rng.random() < 0.15:  # duplicate delivery, same position
                events.append((key, op, pos, val))
    rng.shuffle(events)  # arrival order ≠ position order
    return events


def _python_oracle(events):
    state: dict[int, int] = {}
    for key, op, pos, val in sorted(events, key=lambda e: e[2]):
        if op == "D":
            state.pop(key, None)
        else:
            state[key] = val
    return state


class TestLWWInvariant:
    def test_spark_apply_matches_python_replay(self, spark):
        events = _random_history(seed=42)
        df = spark.createDataFrame(events, "key int, op string, pos_offset long, val int")
        empty = spark.createDataFrame([], "key int, op string, pos_offset long, val int").select(
            "key", "val"
        )
        result = apply_changes(
            empty, df.select("key", "val", "op", "pos_offset"), ["key"], ["pos_offset"]
        )
        got = {r.key: r.val for r in result.collect()}
        assert got == _python_oracle(events)

    def test_duplicate_injection_is_noop(self, spark):
        events = _random_history(seed=7, n_keys=60)
        df = spark.createDataFrame(events, "key int, op string, pos_offset long, val int")
        once = last_write_wins(df, ["key"], ["pos_offset"])
        twice = last_write_wins(df.union(df), ["key"], ["pos_offset"])
        assert once.exceptAll(twice).count() == 0
        assert twice.exceptAll(once).count() == 0


class TestPurePythonProperties:
    @given(st.text(alphabet="abcdefgh.*?_", min_size=1, max_size=12), st.text(alphabet="abcdefgh_", min_size=1, max_size=12))
    @settings(max_examples=200, deadline=None)
    def test_filter_never_crashes_and_is_deterministic(self, pattern, table):
        tf = TableFilter(include_tables=[pattern])
        r1 = tf.should_include(TableId("db", table))
        r2 = TableFilter(include_tables=[pattern]).should_include(TableId("db", table))
        assert r1 == r2

    @given(
        st.lists(
            st.tuples(st.sampled_from(["binlog.000001", "binlog.000002"]), st.integers(0, 1 << 40)),
            min_size=2,
            max_size=20,
        )
    )
    @settings(max_examples=200, deadline=None)
    def test_position_order_consistent_with_tuple_order(self, pairs):
        positions = [FilePosition(f, o) for f, o in pairs]
        by_pos = sorted(positions)
        by_tuple = sorted(positions, key=lambda p: (p.filename, p.offset))
        assert by_pos == by_tuple

    @given(st.sampled_from(["binlog.01", "host:log.02", "x"]), st.integers(0, 1 << 50))
    @settings(max_examples=100, deadline=None)
    def test_position_roundtrip(self, fn, off):
        p = FilePosition(fn, off)
        assert BinlogPosition.parse(p.as_string()) == p


class TestRotationSuffixWidening:
    def test_lww_and_route_respect_numeric_file_order(self, spark):
        """MySQL widens the binlog suffix past 999999: 'binlog.1000000'
        is numerically NEWER than 'binlog.999999' but lexicographically
        SMALLER. The LWW collapse and the route sort must follow the
        numeric (length-first) order, or the sink converges to stale
        pre-rotation values."""
        from xxt_cdc_spark.operators.collapse import last_write_wins
        from xxt_cdc_spark.operators.routing import route

        rows = [
            ("k1", "binlog.999999", 500, "old"),
            ("k1", "binlog.1000000", 10, "new"),  # later file, offset reset
            ("k2", "binlog.1000000", 5, "new"),
            ("k2", "binlog.999999", 900, "old"),
        ]
        df = spark.createDataFrame(rows, "key string, pos_file string, pos_offset long, v string")
        winners = {r["key"]: r["v"] for r in last_write_wins(df, ["key"]).collect()}
        assert winners == {"k1": "new", "k2": "new"}
        # route's in-partition sort: the post-rotation rows come LAST
        part = route(df.withColumn("db", F.lit("d")).withColumn("table", F.lit("t")), 1)
        ordered = [r["pos_file"] for r in part.collect()]
        assert ordered == ["binlog.999999", "binlog.999999", "binlog.1000000", "binlog.1000000"]

    def test_mor_after_predicate_numeric_file_order(self, spark):
        from xxt_cdc_spark.sinks.changelog_mor import _after

        df = spark.createDataFrame(
            [("binlog.1000000", 0), ("binlog.999999", 999), ("binlog.999998", 5)],
            "pos_file string, pos_offset long",
        )
        kept = {
            r["pos_file"]
            for r in df.filter(
                _after(F.col("pos_file"), F.col("pos_offset"), "binlog.999999", 10)
            ).collect()
        }
        assert kept == {"binlog.1000000", "binlog.999999"}
