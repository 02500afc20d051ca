"""SCD Type-2 materialization: batch semantics, incremental folding,
and the streaming exactly-once composition."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from xxt_cdc_spark.operators.scd2 import Scd2Table, scd2_history

ROWS = [
    # key 1: I -> U -> U (current)
    (1, "a1", "I", "bin.000001", 10),
    (1, "a2", "U", "bin.000001", 20),
    (1, "a3", "U", "bin.000002", 5),  # rotation: offset resets, still later
    # key 2: I -> D (no current version)
    (2, "b1", "I", "bin.000001", 11),
    (2, None, "D", "bin.000001", 21),
    # key 3: I only, with a duplicate delivery
    (3, "c1", "I", "bin.000001", 12),
    (3, "c1", "I", "bin.000001", 12),
]
SCHEMA = "id long, v string, op string, pos_file string, pos_offset long"


def _hist_tuples(df):
    return sorted(
        (r.id, r.v, r.valid_from_pos_file, r.valid_from_pos_offset,
         r.valid_to_pos_file, r.valid_to_pos_offset, r.is_current)
        for r in df.collect()
    )


class TestScd2Batch:
    def test_versions_deletes_rotation_and_dups(self, spark):
        df = spark.createDataFrame(ROWS, SCHEMA)
        got = _hist_tuples(scd2_history(df, ["id"], ["pos_file", "pos_offset"]))
        assert got == sorted([
            (1, "a1", "bin.000001", 10, "bin.000001", 20, 0),
            (1, "a2", "bin.000001", 20, "bin.000002", 5, 0),
            (1, "a3", "bin.000002", 5, None, None, 1),
            # the delete closed b1 at its own position and created nothing
            (2, "b1", "bin.000001", 11, "bin.000001", 21, 0),
            # duplicate delivery collapsed to one version
            (3, "c1", "bin.000001", 12, None, None, 1),
        ])


class TestScd2Incremental:
    def test_split_key_across_batches_and_replay(self, spark, tmp_path):
        df = spark.createDataFrame(ROWS, SCHEMA)
        b1 = df.filter(F.col("pos_file") == "bin.000001")
        b2 = df.filter(F.col("pos_file") == "bin.000002")
        t = Scd2Table(spark, str(tmp_path / "t"), ["id"], ["pos_file", "pos_offset"], n_buckets=4)
        t.apply_batch(b1, 0)
        t.apply_batch(b1, 0)  # replay of a committed batch: no-op
        t.apply_batch(b2, 1)
        t.apply_batch(b2, 1)
        want = _hist_tuples(scd2_history(df, ["id"], ["pos_file", "pos_offset"]))
        assert _hist_tuples(t.history()) == want


class TestScd2Redelivery:
    def test_cross_batch_redelivery_is_a_noop(self, spark, tmp_path):
        """An event redelivered in a LATER batch (at-least-once
        transport) must not re-close the current image as a spurious
        zero-width version — the redelivery gate drops events at or
        before the stored current position."""
        df = spark.createDataFrame(ROWS, SCHEMA)
        b1 = df.filter(F.col("pos_file") == "bin.000001")
        b2 = df.filter(F.col("pos_file") == "bin.000002")
        t = Scd2Table(spark, str(tmp_path / "t"), ["id"], ["pos_file", "pos_offset"], n_buckets=4)
        t.apply_batch(b1, 0)
        # batch 1's rows redelivered inside batch 2 (different batch id)
        t.apply_batch(b2.unionByName(b1), 1)
        want = _hist_tuples(scd2_history(df, ["id"], ["pos_file", "pos_offset"]))
        assert _hist_tuples(t.history()) == want

    def test_partial_redelivery_keeps_fresh_suffix(self, spark, tmp_path):
        """A batch mixing already-applied events with genuinely new ones
        applies only the fresh suffix."""
        t = Scd2Table(spark, str(tmp_path / "t"), ["id"], ["pos_file", "pos_offset"], n_buckets=4)
        t.apply_batch(spark.createDataFrame(
            [(7, "x1", "I", "bin.000001", 100)], SCHEMA), 0)
        t.apply_batch(spark.createDataFrame(
            [(7, "x1", "I", "bin.000001", 100),   # redelivered
             (7, "x2", "U", "bin.000001", 200)],  # fresh
            SCHEMA), 1)
        got = _hist_tuples(t.history())
        assert got == sorted([
            (7, "x1", "bin.000001", 100, "bin.000001", 200, 0),
            (7, "x2", "bin.000001", 200, None, None, 1),
        ])


class TestScd2Streaming:
    def test_foreachbatch_with_restart(self, spark, tmp_path):
        """Checkpointed stream -> Scd2Table, killed and resumed: the
        final history equals the one-shot batch computation."""
        src = tmp_path / "src"
        src.mkdir()

        def write_file(name, rows):
            with open(src / name, "w") as f:
                for (i, v, op, pf, po) in rows:
                    f.write(json.dumps({"id": i, "v": v, "op": op, "pos_file": pf, "pos_offset": po}) + "\n")

        batch1 = [r for r in ROWS if r[3] == "bin.000001"]
        batch2 = [r for r in ROWS if r[3] == "bin.000002"]
        write_file("f0.json", batch1)
        t = Scd2Table(spark, str(tmp_path / "t"), ["id"], ["pos_file", "pos_offset"], n_buckets=4)

        def run():
            stream = spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", "1").json(str(src))
            q = (
                stream.writeStream.foreachBatch(lambda df, bid: t.apply_batch(df, bid))
                .option("checkpointLocation", str(tmp_path / "ck"))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)

        run()
        write_file("f1.json", batch2)
        run()  # restart from the checkpoint: only the new file applies
        df = spark.createDataFrame(ROWS, SCHEMA)
        want = _hist_tuples(scd2_history(df, ["id"], ["pos_file", "pos_offset"]))
        assert _hist_tuples(t.history()) == want


class TestScd2AsOf:
    def test_point_reads_match_replay_cuts(self, spark, tmp_path):
        """as_of(P) must equal a from-scratch LWW replay of events up
        to P, for cuts inside, between, and after the feed."""
        from xxt_cdc_spark.operators.apply import apply_changes

        df = spark.createDataFrame(ROWS, SCHEMA)
        t = Scd2Table(spark, str(tmp_path / "t"), ["id"], ["pos_file", "pos_offset"], n_buckets=4)
        t.apply_batch(df.filter(F.col("pos_file") == "bin.000001"), 0)
        t.apply_batch(df.filter(F.col("pos_file") == "bin.000002"), 1)
        base = df.select("id", "v").limit(0)
        for cut in (("bin.000001", 15), ("bin.000001", 21), ("bin.000002", 5)):
            got = sorted(
                (r.id, r.v) for r in t.as_of(*cut).select("id", "v").collect()
            )
            upto = df.filter(
                (F.col("pos_file") < cut[0])
                | ((F.col("pos_file") == cut[0]) & (F.col("pos_offset") <= cut[1]))
            )
            want = sorted(
                (r.id, r.v)
                for r in apply_changes(base, upto, ["id"], ["pos_file", "pos_offset"]).collect()
            )
            assert got == want, cut


class TestLagDedupEquivalence:
    """r13: scd2_history's redelivery dedup rides the version window
    (lag-equality filter) instead of a full-row dropDuplicates shuffle.
    Pin the equivalence on the shapes the lag can get wrong: triple
    redeliveries (consecutive equal rows must ALL collapse) and
    null-payload duplicates (struct equality must treat null fields as
    equal, like dropDuplicates does)."""

    def test_triple_and_null_payload_redeliveries_collapse(self, spark):
        rows = [
            # triple exact redelivery of one insert
            (1, "a1", "I", "bin.000001", 10),
            (1, "a1", "I", "bin.000001", 10),
            (1, "a1", "I", "bin.000001", 10),
            (1, "a2", "U", "bin.000001", 20),
            # duplicated DELETE with null payload — null-safe equality
            (2, "b1", "I", "bin.000001", 11),
            (2, None, "D", "bin.000001", 21),
            (2, None, "D", "bin.000001", 21),
        ]
        df = spark.createDataFrame(rows, SCHEMA)
        hist = scd2_history(df, ["id"], ["pos_file", "pos_offset"])
        got = _hist_tuples(hist)
        # key 1: two versions (the triple collapses to one row);
        # key 2: one closed version (delete collapses, closes it)
        assert got == [
            (1, "a1", "bin.000001", 10, "bin.000001", 20, 0),
            (1, "a2", "bin.000001", 20, None, None, 1),
            (2, "b1", "bin.000001", 11, "bin.000001", 21, 0),
        ]

    def test_matches_dropduplicates_baseline(self, spark):
        # randomized-ish feed with planted redeliveries: the window
        # form must equal a dropDuplicates + history computed the
        # old way (the oracle's SELECT DISTINCT * semantics)
        base = [(k, f"v{k}_{p}", op, "bin.000001", k * 10 + p)
                for k in range(1, 30)
                for p, op in ((1, "I"), (2, "U"))]
        feed = base + base[::3]  # every 3rd row redelivered
        df = spark.createDataFrame(feed, SCHEMA)
        hist = scd2_history(df, ["id"], ["pos_file", "pos_offset"])
        assert hist.count() == len(base)
        # exactly one current version per key
        cur = hist.filter(F.col("is_current") == 1)
        assert cur.count() == 29
