"""Snapshot + catchup watermark-protocol tests (SURVEY.md §3.2).

Simulates "changes arriving during the snapshot": the snapshot reads a
mid-flight state, catchup replays the (low, high] range — which
overlaps what the snapshot already saw — and idempotent upserts absorb
the overlap. Final state must converge to the full-replay oracle.
"""

from __future__ import annotations

import sqlite3

import pytest
from pyspark.sql import functions as F

from xxt_cdc_spark.changefeed import ORDERS_PAYLOAD, orders_changefeed
from xxt_cdc_spark.engine import CDCEngine, WatermarkStore
from xxt_cdc_spark.model.states import CDCState
from xxt_cdc_spark.operators.apply import apply_changes
from xxt_cdc_spark.sinks.upsert import JdbcUpsertWriter, apply_batch


@pytest.fixture()
def target_db(tmp_path):
    path = str(tmp_path / "target.db")
    con = sqlite3.connect(path)
    con.execute(
        "CREATE TABLE orders (o_orderkey INTEGER PRIMARY KEY, o_custkey INTEGER,"
        " o_orderstatus TEXT, o_totalprice REAL, o_orderdate TEXT, o_orderpriority TEXT)"
    )
    con.commit()
    con.close()
    return path


def _mk_engine(spark, sf_dir, target_db, checkpoint_dir, positions):
    """positions: iterator of values current_position() returns."""
    base = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cf = orders_changefeed(spark, sf_dir)
    pos_iter = iter(positions)

    def state_at(pos: int):
        """Source-table contents once all changes ≤ pos are applied."""
        upto = cf.filter(F.col("pos_offset") <= pos)
        return apply_changes(base, upto, ["o_orderkey"], ["pos_offset"])

    def snapshot_source():
        # snapshot observes the mid-flight state (between low and high)
        return state_at(MID).withColumn("op", F.lit("I")).withColumn("pos_offset", F.lit(0))

    def changelog(lo, hi):
        d = cf.filter(F.col("pos_offset") > lo)
        if hi is not None:
            d = d.filter(F.col("pos_offset") <= hi)
        return d

    def apply_fn(df):
        cast = df.selectExpr(
            "op", "pos_offset", "o_orderkey", "o_custkey", "o_orderstatus",
            "o_totalprice", "cast(o_orderdate as string) AS o_orderdate", "o_orderpriority",
        )
        apply_batch(
            cast,
            lambda: JdbcUpsertWriter(
                connect_fn=lambda: sqlite3.connect(target_db, timeout=30),
                table="orders",
                columns=ORDERS_PAYLOAD,
                key_cols=["o_orderkey"],
                dialect="sqlite",
            ),
            ["o_orderkey"],
            ["pos_offset"],
            num_partitions=4,
        )

    return CDCEngine(
        spark=spark,
        snapshot_source=snapshot_source,
        changelog=changelog,
        current_position=lambda: next(pos_iter),
        apply_fn=apply_fn,
        checkpoint_dir=checkpoint_dir,
    )


LOW, MID, HIGH = 5000, 8000, 150000  # positions inside the feed's range


def _sqlite_state(path):
    con = sqlite3.connect(path)
    rows = con.execute("SELECT o_orderkey, o_orderstatus, round(o_totalprice, 4) FROM orders ORDER BY 1").fetchall()
    con.close()
    return rows


class TestWatermarkProtocol:
    def test_snapshot_catchup_stream_converges(self, spark, sf_dir, tmp_path, target_db):
        eng = _mk_engine(spark, sf_dir, target_db, str(tmp_path / "ck"), positions=[LOW, HIGH])
        stats = eng.start(enable_snapshot=True, stream=True)

        assert eng.history == ["SNAPSHOT", "CATCHUP", "STREAMING"]
        assert eng.state is CDCState.STREAMING
        assert stats["start_position"] == HIGH

        # oracle: full replay of the changefeed over the base snapshot
        base = spark.read.parquet(f"{sf_dir}/orders.parquet")
        cf = orders_changefeed(spark, sf_dir)
        expected_df = apply_changes(base, cf, ["o_orderkey"], ["pos_offset"])
        expected = sorted(
            (r.o_orderkey, r.o_orderstatus, round(r.o_totalprice, 4))
            for r in expected_df.select("o_orderkey", "o_orderstatus", "o_totalprice").collect()
        )
        assert _sqlite_state(target_db) == [tuple(t) for t in expected]

    def test_resume_position_precedence(self, spark, sf_dir, tmp_path, target_db):
        ck = str(tmp_path / "ck2")
        eng = _mk_engine(spark, sf_dir, target_db, ck, positions=[42])
        # nothing persisted → falls through to current_position()
        assert eng.resume_position() == 42

        eng.commit_position(777)
        assert eng.resume_position() == 777  # lastCommitted beats latest

        WatermarkStore(ck).save(eng.snapshot_id, low=1, high=999, status="COMPLETED")
        assert eng.resume_position() == 999  # highWatermark beats lastCommitted

    def test_illegal_phase_jump_rejected(self, spark, sf_dir, tmp_path, target_db):
        eng = _mk_engine(spark, sf_dir, target_db, str(tmp_path / "ck3"), positions=[1, 1])
        from xxt_cdc_spark.model.states import InvalidTransition

        with pytest.raises(InvalidTransition):
            eng._to(CDCState.CATCHUP)  # INIT → CATCHUP is illegal
