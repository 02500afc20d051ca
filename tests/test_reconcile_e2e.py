"""The operational loop the reconcile operator exists for: a CDC apply
into a real (sqlite) target, then chunk-checksum verification of the
converged state — and precise drift localization after the target is
mutated behind the pipeline's back."""

from __future__ import annotations

import sqlite3

import pandas as pd

from xxt_cdc_spark.changefeed import orders_changefeed
from xxt_cdc_spark.operators.apply import apply_changes
from xxt_cdc_spark.operators.reconcile import reconcile
from xxt_cdc_spark.sinks.upsert import JdbcUpsertWriter, apply_batch

SF = "/root/testdata/sf0.001"
COLS = ["o_orderkey", "o_orderstatus", "o_totalprice"]


def _target_df(spark, db):
    con = sqlite3.connect(db)
    try:
        pdf = pd.read_sql_query(f"SELECT {', '.join(COLS)} FROM orders_t", con)
    finally:
        con.close()
    return spark.createDataFrame(pdf)


class TestReconcileE2E:
    def test_converged_then_drifted(self, spark, tmp_path):
        db = str(tmp_path / "t.db")
        con = sqlite3.connect(db)
        con.execute(
            "CREATE TABLE orders_t (o_orderkey INTEGER PRIMARY KEY, "
            "o_orderstatus TEXT, o_totalprice REAL)"
        )
        con.commit()
        con.close()

        cf = orders_changefeed(spark, SF).selectExpr("op", "pos_file", "pos_offset", *COLS)
        apply_batch(
            cf,
            lambda: JdbcUpsertWriter(
                connect_fn=lambda: sqlite3.connect(db, timeout=60),
                table="orders_t",
                columns=COLS,
                key_cols=["o_orderkey"],
                dialect="sqlite",
            ),
            ["o_orderkey"],
            ["pos_file", "pos_offset"],
            num_partitions=2,
        )

        # source of truth: the replay oracle over the base table
        base = spark.read.parquet(f"{SF}/orders.parquet")
        truth = apply_changes(
            base, orders_changefeed(spark, SF), ["o_orderkey"], ["pos_offset"]
        ).select(*COLS)

        # converged: the checksum protocol agrees with zero row reads
        assert reconcile(truth, _target_df(spark, db), ["o_orderkey"], 128).count() == 0

        # drift injected behind the pipeline's back
        con = sqlite3.connect(db)
        victim, = con.execute(
            "SELECT o_orderkey FROM orders_t ORDER BY o_orderkey LIMIT 1"
        ).fetchone()
        changed, = con.execute(
            "SELECT o_orderkey FROM orders_t ORDER BY o_orderkey DESC LIMIT 1"
        ).fetchone()
        con.execute("DELETE FROM orders_t WHERE o_orderkey = ?", (victim,))
        con.execute(
            "UPDATE orders_t SET o_totalprice = o_totalprice + 1 WHERE o_orderkey = ?",
            (changed,),
        )
        con.commit()
        con.close()

        report = sorted(
            (r.o_orderkey, r.status)
            for r in reconcile(truth, _target_df(spark, db), ["o_orderkey"], 128).collect()
        )
        assert report == sorted(
            [(victim, "missing_in_target"), (changed, "differs")]
        )
