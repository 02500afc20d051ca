"""Merge-on-read changelog sink: JVM-only streaming append, read-time
convergence, compaction watermark, exactly-once restart."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from xxt_cdc_spark.sinks.changelog_mor import ChangelogMorTable


def _typed(spark, rows):
    """Typed change rows: payload (id, v) + op + composite position."""
    return spark.createDataFrame(
        rows, "id long, v string, op string, pos_file string, pos_offset long"
    )


B1 = [
    (1, "a1", "I", "bin.000001", 10),
    (2, "b1", "I", "bin.000001", 11),
    (3, "c1", "I", "bin.000001", 12),
    (2, "b2", "U", "bin.000001", 13),
]
B2 = [
    (3, None, "D", "bin.000001", 20),
    (4, "d1", "I", "bin.000001", 21),
    (1, "a2", "U", "bin.000001", 22),
]
# post-rotation batch: offsets RESET to small values — the composite
# watermark must still order these AFTER bin.000001 offsets
B3 = [
    (4, "d2", "U", "bin.000002", 3),
    (5, "e1", "I", "bin.000002", 4),
    (5, None, "D", "bin.000002", 5),
]


def _state(df):
    return sorted((r.id, r.v) for r in df.select("id", "v").collect())


class TestChangelogMor:
    def test_converged_from_log_only(self, spark, tmp_path):
        t = ChangelogMorTable(spark, str(tmp_path / "t"), ["id"], n_buckets=4)
        t.append_batch(_typed(spark, B1))
        t.append_batch(_typed(spark, B2))
        assert _state(t.converged()) == [(1, "a2"), (2, "b2"), (4, "d1")]

    def test_compaction_preserves_state_and_advances_watermark(self, spark, tmp_path):
        t = ChangelogMorTable(spark, str(tmp_path / "t"), ["id"], n_buckets=4)
        t.append_batch(_typed(spark, B1))
        before = _state(t.converged())
        stats = t.compact()
        assert stats["compacted_rows"] == len(B1)
        assert _state(t.converged()) == before
        wm = json.load(open(tmp_path / "t" / "_mor_compaction.json"))
        assert (wm["pos_file"], wm["pos_offset"]) == ("bin.000001", 13)
        # suffix after compaction is empty → converged == base state
        assert t._log_suffix().count() == 0

    def test_deletes_survive_compaction_and_rotation(self, spark, tmp_path):
        """A delete in the suffix must drop a compacted base row, a
        delete folded by compaction must not resurrect, and offsets
        that reset at a file rotation must still be ordered after."""
        t = ChangelogMorTable(spark, str(tmp_path / "t"), ["id"], n_buckets=4)
        t.append_batch(_typed(spark, B1))
        t.compact()
        t.append_batch(_typed(spark, B2))
        # suffix delete (id=3) removes a base row at read time
        assert _state(t.converged()) == [(1, "a2"), (2, "b2"), (4, "d1")]
        t.compact()
        assert _state(t.converged()) == [(1, "a2"), (2, "b2"), (4, "d1")]
        # rotation: pos_offset resets below the watermark offset
        t.append_batch(_typed(spark, B3))
        assert t._log_suffix().count() == len(B3)
        assert _state(t.converged()) == [(1, "a2"), (2, "b2"), (4, "d2")]
        t.compact()
        assert _state(t.converged()) == [(1, "a2"), (2, "b2"), (4, "d2")]

    def test_compaction_replay_idempotent(self, spark, tmp_path):
        """Replaying the same suffix through compaction (crash between
        state apply and watermark write) converges to the same state."""
        t = ChangelogMorTable(spark, str(tmp_path / "t"), ["id"], n_buckets=4)
        t.append_batch(_typed(spark, B1))
        t.compact()
        # simulate the crash: rewind the watermark, compact again
        os.remove(tmp_path / "t" / "_mor_compaction.json")
        t.compact()
        assert _state(t.converged()) == [(1, "a1"), (2, "b2"), (3, "c1")]

    def test_streaming_append_is_jvm_only_and_exactly_once(self, spark, tmp_path):
        """The write path must contain no Python evaluation (that is the
        whole point of merge-on-read here), and a restart from the same
        checkpoint must not duplicate log rows."""
        src_dir = tmp_path / "src"
        src_dir.mkdir()
        schema = "id long, v string, op string, pos_file string, pos_offset long"

        def write_file(name, rows):
            with open(src_dir / name, "w") as f:
                for (i, v, op, pf, po) in rows:
                    f.write(
                        json.dumps(
                            {"id": i, "v": v, "op": op, "pos_file": pf, "pos_offset": po}
                        )
                        + "\n"
                    )

        write_file("b1.json", B1)
        t = ChangelogMorTable(spark, str(tmp_path / "t"), ["id"], n_buckets=4)
        stream = spark.readStream.schema(schema).json(str(src_dir))

        q = t.start_stream(stream, str(tmp_path / "ck"), trigger={"availableNow": True})
        q.awaitTermination(120)
        # restart with one more file: only the new rows append
        write_file("b2.json", B2)
        q2 = t.start_stream(stream, str(tmp_path / "ck"), trigger={"availableNow": True})
        q2.awaitTermination(120)
        log = t.log()
        assert log.count() == len(B1) + len(B2)
        # no Python eval operators anywhere in the log-append plan
        batch_plan = log._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in batch_plan and "MapInPandas" not in batch_plan
        assert _state(t.converged()) == [(1, "a2"), (2, "b2"), (4, "d1")]

    def test_batch_append_refused_on_stream_owned_log(self, spark, tmp_path):
        """Once the streaming sink's _spark_metadata exists, readers
        trust only its file list — a batch append would be silently
        invisible, so it must be refused loudly instead."""
        src_dir = tmp_path / "src"
        src_dir.mkdir()
        with open(src_dir / "b1.json", "w") as f:
            for (i, v, op, pf, po) in B1:
                f.write(json.dumps({"id": i, "v": v, "op": op, "pos_file": pf, "pos_offset": po}) + "\n")
        t = ChangelogMorTable(spark, str(tmp_path / "t"), ["id"], n_buckets=4)
        stream = spark.readStream.schema(
            "id long, v string, op string, pos_file string, pos_offset long"
        ).json(str(src_dir))
        q = t.start_stream(stream, str(tmp_path / "ck"), trigger={"availableNow": True})
        q.awaitTermination(120)
        with pytest.raises(ValueError, match="_spark_metadata"):
            t.append_batch(_typed(spark, B2))

    def test_compact_on_empty_suffix_is_noop(self, spark, tmp_path):
        t = ChangelogMorTable(spark, str(tmp_path / "t"), ["id"], n_buckets=4)
        t.append_batch(_typed(spark, B1))
        t.compact()
        assert t.compact() == {"compacted_rows": 0}


class TestMorSchemaEvolution:
    """Additive schema evolution across the MOR lifecycle: log files of
    mixed width merge at read time, compaction evolves the state table
    sidecar, and pre-evolution rows/batches null-fill the new columns."""

    WIDE = [
        (4, "d1", 40, "I", "bin.000001", 21),
        (1, "a2", 10, "U", "bin.000001", 22),
    ]

    def _wide(self, spark, rows):
        return spark.createDataFrame(
            rows, "id long, v string, w long, op string, pos_file string, pos_offset long"
        )

    def test_log_and_converged_evolve_additively(self, spark, tmp_path):
        t = ChangelogMorTable(spark, str(tmp_path / "t"), ["id"], n_buckets=4)
        t.append_batch(_typed(spark, B1))
        assert "w" not in t.converged().columns
        t.append_batch(self._wide(spark, self.WIDE))
        got = {r.id: (r.v, r.w) for r in t.converged().collect()}
        # pre-evolution rows null-fill w; evolved rows carry it
        assert got == {1: ("a2", 10), 2: ("b2", None), 3: ("c1", None), 4: ("d1", 40)}

    def test_compaction_evolves_state_sidecar(self, spark, tmp_path):
        t = ChangelogMorTable(spark, str(tmp_path / "t"), ["id"], n_buckets=4)
        t.append_batch(_typed(spark, B1))
        t.compact()  # state born with the narrow schema
        assert [f.name for f in t.state._payload_schema().fields] == ["id", "v"]
        t.append_batch(self._wide(spark, self.WIDE))
        t.compact()  # additive evolution happens here
        assert [f.name for f in t.state._payload_schema().fields] == ["id", "v", "w"]
        got = {r.id: (r.v, r.w) for r in t.converged().collect()}
        assert got == {1: ("a2", 10), 2: ("b2", None), 3: ("c1", None), 4: ("d1", 40)}

    def test_narrow_batch_after_evolution_null_fills(self, spark, tmp_path):
        """A full-row image without the evolved column means the column
        is unknown for that row — the LWW winner's null replaces the
        older wide value (row-image replace semantics, not a patch)."""
        t = ChangelogMorTable(spark, str(tmp_path / "t"), ["id"], n_buckets=4)
        t.append_batch(self._wide(spark, self.WIDE))
        t.compact()
        t.append_batch(_typed(spark, [(4, "d9", "U", "bin.000002", 1)]))
        got = {r.id: (r.v, r.w) for r in t.converged().collect()}
        assert got[4] == ("d9", None) and got[1] == ("a2", 10)
        t.compact()
        got = {r.id: (r.v, r.w) for r in t.converged().collect()}
        assert got[4] == ("d9", None) and got[1] == ("a2", 10)

    def test_retype_refused(self, spark, tmp_path):
        """Add-only means never retype: a same-name/different-type
        batch must fail at the evolution boundary, not corrupt aligned
        reads later."""
        t = ChangelogMorTable(spark, str(tmp_path / "t"), ["id"], n_buckets=4)
        t.append_batch(self._wide(spark, self.WIDE))
        t.compact()
        retyped = spark.createDataFrame(
            [(9, "z", "9", "I", "bin.000009", 1)],
            "id long, v string, w string, op string, pos_file string, pos_offset long",
        )
        with pytest.raises(ValueError, match="add-only"):
            t.state.apply(retyped, order_cols=["pos_file", "pos_offset"])

    def test_streaming_restart_with_evolved_schema(self, spark, tmp_path):
        """The file sink accepts new-schema files on a restart from the
        same checkpoint; readers merge old and new log files."""
        src_dir = tmp_path / "src"
        src_dir.mkdir()
        with open(src_dir / "b1.json", "w") as f:
            for (i, v, op, pf, po) in B1:
                f.write(json.dumps({"id": i, "v": v, "op": op, "pos_file": pf, "pos_offset": po}) + "\n")
        t = ChangelogMorTable(spark, str(tmp_path / "t"), ["id"], n_buckets=4)
        narrow = spark.readStream.schema(
            "id long, v string, op string, pos_file string, pos_offset long"
        ).json(str(src_dir))
        q = t.start_stream(narrow, str(tmp_path / "ck"), trigger={"availableNow": True})
        q.awaitTermination(120)
        with open(src_dir / "b2.json", "w") as f:
            for (i, v, w, op, pf, po) in self.WIDE:
                f.write(json.dumps({"id": i, "v": v, "w": w, "op": op, "pos_file": pf, "pos_offset": po}) + "\n")
        wide = spark.readStream.schema(
            "id long, v string, w long, op string, pos_file string, pos_offset long"
        ).json(str(src_dir))
        q2 = t.start_stream(wide, str(tmp_path / "ck"), trigger={"availableNow": True})
        q2.awaitTermination(120)
        assert t.log().count() == len(B1) + len(self.WIDE)
        got = {r.id: (r.v, r.w) for r in t.converged().collect()}
        assert got == {1: ("a2", 10), 2: ("b2", None), 3: ("c1", None), 4: ("d1", 40)}


class TestTimeTravel:
    def test_as_of_matches_direct_replay_at_cuts(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from xxt_cdc_spark.changefeed import orders_changefeed
        from xxt_cdc_spark.operators.apply import apply_changes
        from xxt_cdc_spark.sinks.changelog_mor import ChangelogMorTable

        sf = "/root/testdata/sf0.001"
        cf = orders_changefeed(spark, sf)
        base = cf.select(
            "o_orderkey", "o_custkey", "o_orderstatus",
            "o_totalprice", "o_orderdate", "o_orderpriority",
        ).limit(0)
        t = ChangelogMorTable(spark, str(tmp_path / "t"), ["o_orderkey"], n_buckets=4)
        t.append_batch(cf.filter(F.col("pos_offset") <= 3000))
        t.compact()
        t.append_batch(cf.filter(F.col("pos_offset") > 3000))

        for cut in (4000, 9000):
            got = sorted(
                (r.o_orderkey, r.o_orderstatus, round(r.o_totalprice, 4))
                for r in t.as_of("binlog.000001", cut)
                .select("o_orderkey", "o_orderstatus", "o_totalprice")
                .collect()
            )
            want = sorted(
                (r.o_orderkey, r.o_orderstatus, round(r.o_totalprice, 4))
                for r in apply_changes(
                    base, cf.filter(F.col("pos_offset") <= cut),
                    ["o_orderkey"], ["pos_offset"],
                )
                .select("o_orderkey", "o_orderstatus", "o_totalprice")
                .collect()
            )
            assert got == want, f"as_of({cut}) diverged from direct replay"

    def test_as_of_below_watermark_refused(self, spark, tmp_path):
        import pytest
        from pyspark.sql import functions as F

        from xxt_cdc_spark.changefeed import orders_changefeed
        from xxt_cdc_spark.sinks.changelog_mor import ChangelogMorTable

        sf = "/root/testdata/sf0.001"
        cf = orders_changefeed(spark, sf)
        t = ChangelogMorTable(spark, str(tmp_path / "t"), ["o_orderkey"], n_buckets=4)
        t.append_batch(cf.filter(F.col("pos_offset") <= 3000))
        t.compact()
        with pytest.raises(ValueError, match="no longer position-addressable"):
            t.as_of("binlog.000001", 100)


class TestChangeDataFeed:
    def test_changes_between_cuts_exactly(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from xxt_cdc_spark.changefeed import orders_changefeed
        from xxt_cdc_spark.sinks.changelog_mor import ChangelogMorTable

        sf = "/root/testdata/sf0.001"
        cf = orders_changefeed(spark, sf)
        t = ChangelogMorTable(spark, str(tmp_path / "t"), ["o_orderkey"], n_buckets=4)
        t.append_batch(cf)

        lo, hi = ("binlog.000001", 4000), ("binlog.000001", 9000)
        got = t.changes_between(lo, hi)
        want = cf.filter((F.col("pos_offset") > 4000) & (F.col("pos_offset") <= 9000))
        assert got.count() == want.count()
        # half-open semantics: a row exactly AT lo is excluded, at hi included
        edge = cf.orderBy("pos_offset").first().pos_offset
        all_from_head = t.changes_between(None, None)
        assert all_from_head.count() == cf.count()
        assert t.changes_between(("binlog.000001", edge), None).filter(
            F.col("pos_offset") == edge
        ).count() == 0

    def test_cdf_feeds_continuous_aggregate(self, spark, tmp_path):
        """Composition: a downstream ContinuousAggregate consumes the
        MOR table's CDF in two increments and matches a from-scratch
        aggregate of the converged state."""
        from pyspark.sql import functions as F

        from xxt_cdc_spark.changefeed import orders_changefeed
        from xxt_cdc_spark.operators.incremental_agg import ContinuousAggregate
        from xxt_cdc_spark.sinks.changelog_mor import ChangelogMorTable

        sf = "/root/testdata/sf0.001"
        cf = orders_changefeed(spark, sf).select(
            "op", "pos_file", "pos_offset", "o_orderkey", "o_orderstatus", "o_totalprice"
        )
        t = ChangelogMorTable(spark, str(tmp_path / "t"), ["o_orderkey"], n_buckets=4)
        t.append_batch(cf)

        ca = ContinuousAggregate(
            spark, str(tmp_path / "ca"), ["o_orderkey"], ["o_orderstatus"],
            ["o_totalprice"], ["pos_file", "pos_offset"], n_buckets=4,
        )
        cut = ("binlog.000001", 8000)
        ca.apply_batch(t.changes_between(None, cut), 0)
        ca.apply_batch(t.changes_between(cut, None), 1)

        got = {
            r.o_orderstatus: (r.n, float(r.o_totalprice_sum))
            for r in ca.read().collect()
        }
        want_rows = (
            t.converged()
            .groupBy("o_orderstatus")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("o_totalprice").cast("decimal(25,6)")).alias("s"),
            )
            .collect()
        )
        want = {r.o_orderstatus: (r.n, float(r.s)) for r in want_rows}
        assert got == want

    def test_cdf_below_watermark_refused(self, spark, tmp_path):
        import pytest
        from pyspark.sql import functions as F

        from xxt_cdc_spark.changefeed import orders_changefeed
        from xxt_cdc_spark.sinks.changelog_mor import ChangelogMorTable

        sf = "/root/testdata/sf0.001"
        cf = orders_changefeed(spark, sf)
        t = ChangelogMorTable(spark, str(tmp_path / "t"), ["o_orderkey"], n_buckets=4)
        t.append_batch(cf.filter(F.col("pos_offset") <= 3000))
        t.compact()
        with pytest.raises(ValueError, match="no longer position-addressable"):
            t.changes_between(("binlog.000001", 10), None)
