"""Regression tests for the round-6 ADVICE findings.

1 (medium) — binlog_source.latestOffset: a FRESH query (initialOffset
   just ran) must budget its first advance from the configured start;
   the unbudgeted true-end path is only for genuine restarts where the
   checkpoint frontier is invisible to the reader.
2 (low) — temporal_join: as-of struct comparisons are now rotation-
   widening-safe ((length, value) on pos_file), agreeing with the sort
   paths (collapse/scd2/routing).
3 (low) — apply_batch_txn: legacy gate rows (bare pipeline identity,
   pre-topology-id deployments) still veto replays and are migrated
   in-band by the first new-format commit.
4 (low) — WindowedTopK.expire: doomed bucket dirs ride the same
   one-generation pending_gc grace as apply_batch (covered in
   test_topk_incremental.py::test_retention_drops_only_fully_expired_buckets).
5 (low) — similarity._broadcast_budget returns the resolved byte cap
   so diagnostics cite the limit actually enforced (covered in
   test_functions.py::test_broadcast_guard_is_byte_aware).
"""

from __future__ import annotations

import json
import os
import sqlite3

import pytest

from xxt_cdc_spark.streaming.binlog_source import (
    BinlogLogWriter,
    BinlogStreamReader,
    _complete_end,
)


def _mk_records(lo: int, hi: int):
    return [
        {
            "op": "I",
            "db": "d",
            "table": "t",
            "key": json.dumps({"id": i}),
            "value": json.dumps({"id": i, "v": f"v{i}"}),
            "gtid": f"aaaa-bbbb:{i + 1}",
        }
        for i in range(lo, hi)
    ]


class TestFreshQueryBudget:
    def test_fresh_query_first_advance_is_budgeted(self, tmp_path):
        """A fresh earliest-start query over a large retained log must
        NOT ingest the whole log as one micro-batch: after
        initialOffset() the frontier is known, so the first
        latestOffset() budgets from it (the r6 ADVICE medium)."""
        log = str(tmp_path / "log")
        w = BinlogLogWriter(log)
        w.append(_mk_records(0, 500))
        end = _complete_end(os.path.join(log, "binlog.000001"))
        budget = max(1, end // 10)

        rdr = BinlogStreamReader({"path": log, "maxbytespertrigger": str(budget)})
        start = rdr.initialOffset()  # fresh query: Spark always calls this
        assert start["pos"] == 0
        first_end = rdr.latestOffset()
        assert first_end["pos"] < end, "first batch ate the whole backlog"
        # ~1 budget's worth, never more than one snapped record over
        assert first_end["pos"] <= budget * 2
        # steady state keeps advancing under the same budget to the end
        seen = first_end["pos"]
        for _ in range(40):
            nxt = rdr.latestOffset()
            assert nxt["pos"] >= seen
            seen = nxt["pos"]
            if seen >= end:
                break
        assert seen == end

    def test_restart_first_advance_is_unbudgeted(self, tmp_path):
        """A RESTARTED reader (no initialOffset call — the start lives
        in Spark's checkpoint) must keep returning the true end on its
        first call: a budgeted advance from the configured start could
        land behind the committed frontier and stall forever."""
        log = str(tmp_path / "log")
        w = BinlogLogWriter(log)
        w.append(_mk_records(0, 500))
        end = _complete_end(os.path.join(log, "binlog.000001"))

        rdr = BinlogStreamReader({"path": log, "maxbytespertrigger": "64"})
        first_end = rdr.latestOffset()  # no initialOffset: restart path
        assert first_end["pos"] == end


class TestTemporalJoinWidening:
    def test_as_of_survives_suffix_widening(self, spark):
        """History spanning binlog.999999 → binlog.1000000: string
        compare orders the wider name FIRST ('1' < '9'); the
        length-aware structs must keep as-of semantics correct."""
        from xxt_cdc_spark.operators.scd2 import scd2_history
        from xxt_cdc_spark.operators.temporal_join import temporal_join

        changes = spark.createDataFrame(
            [
                ("I", "binlog.999999", 10, 1, "old"),
                ("U", "binlog.1000000", 10, 1, "new"),
            ],
            "op string, pos_file string, pos_offset long, k long, v string",
        )
        hist = scd2_history(changes, ["k"], ["pos_file", "pos_offset"])
        facts = spark.createDataFrame(
            [
                (1, "binlog.999999", 50, "pre_rotation"),
                (1, "binlog.1000000", 50, "post_rotation"),
            ],
            "k long, pos_file string, pos_offset long, label string",
        )
        got = {
            r.label: r.v
            for r in temporal_join(
                facts, hist, ["k"], ["pos_file", "pos_offset"]
            ).collect()
        }
        assert got == {"pre_rotation": "old", "post_rotation": "new"}


def _gate_factory(db, pool_key):
    from xxt_cdc_spark.sinks.upsert import JdbcUpsertWriter

    def make():
        return JdbcUpsertWriter(
            connect_fn=lambda: sqlite3.connect(db, timeout=60),
            table="t",
            columns=["id", "v"],
            key_cols=["id"],
            dialect="starrocks",  # plain INSERT — non-idempotent
            pool_key=pool_key,
            defer_commit=True,
        )

    return make


class TestLegacyGateMigration:
    def test_legacy_bare_pipeline_rows_still_veto_and_migrate(self, spark, tmp_path):
        """Gate rows written by a pre-topology-id deployment (pipeline
        stored as the bare name) must keep vetoing a replay after the
        upgrade — ignoring them would replay the last committed batch
        into exactly the non-idempotent sinks the gate protects — and
        the first genuinely-new batch prunes them into the new format."""
        from xxt_cdc_spark.sinks.upsert import (
            OFFSETS_TABLE,
            apply_batch_txn,
            close_pooled_connections,
        )

        db = str(tmp_path / "t.db")
        con = sqlite3.connect(db)
        con.execute("CREATE TABLE t (id INTEGER, v TEXT)")  # no PK
        # legacy deployment state: old PK shape, bare pipeline identity,
        # batch 7 already applied on every partition
        con.execute(
            f"CREATE TABLE {OFFSETS_TABLE} ("
            "pipeline VARCHAR(128) NOT NULL, partition_id INTEGER NOT NULL, "
            "batch_id INTEGER NOT NULL, PRIMARY KEY (pipeline, partition_id))"
        )
        nparts = 2
        for pid in range(nparts):
            con.execute(
                f"INSERT INTO {OFFSETS_TABLE} VALUES (?, ?, ?)", ("p1", pid, 7)
            )
        con.commit()
        con.close()

        batch = spark.createDataFrame(
            [("I", "f1", i, i, f"v{i}") for i in range(6)],
            "op string, pos_file string, pos_offset long, id long, v string",
        )
        fac = _gate_factory(db, pool_key=f"legacy-{tmp_path.name}")
        try:
            # REPLAY of batch 7 (crash between target commit and
            # checkpoint advance, then the upgrade deployed): the
            # legacy rows must veto it whole
            stats = apply_batch_txn(
                batch, fac, ["id"], batch_id=7, pipeline="p1", num_partitions=nparts
            )
            assert stats["skipped"] == nparts and stats["upserts"] == 0
            con = sqlite3.connect(db)
            assert con.execute("SELECT COUNT(*) FROM t").fetchone()[0] == 0

            # batch 8 is genuinely new: applies once, and prunes the
            # legacy rows into the new '{pipeline}@{nparts}' identity
            stats = apply_batch_txn(
                batch, fac, ["id"], batch_id=8, pipeline="p1", num_partitions=nparts
            )
            assert stats["upserts"] == 6 and stats["skipped"] == 0
            con = sqlite3.connect(db)
            assert con.execute("SELECT COUNT(*) FROM t").fetchone()[0] == 6
            idents = {
                r[0]
                for r in con.execute(
                    f"SELECT DISTINCT pipeline FROM {OFFSETS_TABLE}"
                ).fetchall()
            }
            assert idents == {f"p1@{nparts}"}  # legacy rows migrated away
            con.close()
        finally:
            close_pooled_connections()
