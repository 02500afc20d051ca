"""Regression tests for the round-8 ADVICE items.

1. (medium) sinks/upsert.py writer cache: a cache hit must re-validate
   the table against the CURRENT sinks registry — removal stops
   applying, a changed TableSink.fingerprint evicts and rebuilds
   against the new target; a `sink_factory.fingerprint` attribute
   folds into the cache key so a config change misses by construction;
   cached writers cap retained dead letters; cache mutations are
   lock-guarded (exercised implicitly — the accessors are the only
   mutation path).
2. (low) IncrementalSemDedup.init / IncrementalIVF.init raise when the
   seed frame yields fewer than n_centroids vectors, and
   dedup_semantic_family's chunk cuts come from the ordered id
   distribution, so sparse / high-offset id spaces chunk correctly
   (incremental == batch even when ids are not dense from 0).
"""

import sqlite3

import pytest
from pyspark.sql import functions as F

from xxt_cdc_spark.sinks.upsert import (
    TableSink,
    _trim_cached_dead_letters,
    apply_batch_fanout,
    close_pooled_connections,
)


def _env(spark, n_events: int, n_tables: int):
    return spark.range(n_events).select(
        F.lit("d").alias("db"),
        F.concat(F.lit("t"), (F.col("id") % n_tables)).alias("table"),
        F.lit("I").alias("op"),
        F.lit(None).cast("timestamp").alias("ts"),
        F.lit("binlog.000001").alias("pos_file"),
        F.col("id").alias("pos_offset"),
        F.lit(None).cast("string").alias("gtid"),
        F.to_json(F.struct(F.floor(F.col("id") / n_tables).alias("k"))).alias("key"),
        F.lit(None).cast("string").alias("before"),
        F.to_json(
            F.struct(F.floor(F.col("id") / n_tables).alias("k"), F.col("id").alias("v"))
        ).alias("after"),
    )


def _mk_db(path: str, n_tables: int) -> None:
    con = sqlite3.connect(path)
    for i in range(n_tables):
        con.execute(f"CREATE TABLE t{i} (k INTEGER PRIMARY KEY, v INTEGER)")
    con.commit()
    con.close()


def _sink(db: str, table: str, fingerprint: str | None = None) -> TableSink:
    def make():
        import sqlite3 as _sq

        from xxt_cdc_spark.sinks.upsert import JdbcUpsertWriter as _W

        return _W(
            connect_fn=lambda: _sq.connect(db, timeout=60),
            table=table,
            columns=["k", "v"],
            key_cols=["k"],
            dialect="sqlite",
            pool_key=f"r8adv:{db}",
        )

    return TableSink(make, ["k"], None, fingerprint=fingerprint)


class TestWriterCacheValidation:
    def test_removed_table_stops_applying_on_cache_hit(self, spark, tmp_path):
        """A table removed from ``sinks`` between micro-batches must be
        SKIPPED even though its writer sits in the cache (pre-fix: the
        cache hit bypassed the registry and kept applying)."""
        n_tables = 4
        db = str(tmp_path / "rm.db")
        _mk_db(db, n_tables)
        env = _env(spark, 400, n_tables)
        ns = f"rm:{db}"
        try:
            full = {f"t{i}": _sink(db, f"t{i}") for i in range(n_tables)}
            applied = apply_batch_fanout(
                env, full, num_partitions=2, coalesce_commits=True, cache_writers=ns
            )
            assert sum(applied.values()) == 400
            # deregister t1; its cached writer must NOT keep applying
            pruned = {t: s for t, s in full.items() if t != "t1"}
            applied2 = apply_batch_fanout(
                env, pruned, num_partitions=2, coalesce_commits=True, cache_writers=ns
            )
            assert "t1" not in applied2, applied2
            assert sum(applied2.values()) == 300
        finally:
            close_pooled_connections()

    def test_fingerprint_change_repoints_cached_writer(self, spark, tmp_path):
        """Re-registering a table with a different TableSink.fingerprint
        (a re-pointed target) must evict the cached writer and apply to
        the NEW target — pre-fix the rows kept landing in the old DB."""
        n_tables = 2
        db_a = str(tmp_path / "a.db")
        db_b = str(tmp_path / "b.db")
        _mk_db(db_a, n_tables)
        _mk_db(db_b, n_tables)
        env = _env(spark, 200, n_tables)
        ns = "repoint"  # deliberately NOT target-unique: the fingerprint must save us
        try:
            sinks_a = {f"t{i}": _sink(db_a, f"t{i}", fingerprint=db_a) for i in range(n_tables)}
            apply_batch_fanout(
                env, sinks_a, num_partitions=2, coalesce_commits=True, cache_writers=ns
            )
            sinks_b = {f"t{i}": _sink(db_b, f"t{i}", fingerprint=db_b) for i in range(n_tables)}
            applied = apply_batch_fanout(
                env, sinks_b, num_partitions=2, coalesce_commits=True, cache_writers=ns
            )
            assert sum(applied.values()) == 200
        finally:
            close_pooled_connections()
        con = sqlite3.connect(db_b)
        n_b = sum(
            con.execute(f"SELECT COUNT(*) FROM t{i}").fetchone()[0] for i in range(n_tables)
        )
        con.close()
        assert n_b == 200, f"rows must land in the NEW target, got {n_b}"

    def test_factory_fingerprint_folds_into_cache_key(self, spark, tmp_path):
        """With ``sink_factory``, setting ``sink_factory.fingerprint``
        must make a config change a cache MISS: same namespace, new
        fingerprint → rows land in the new target."""
        n_tables = 2
        db_a = str(tmp_path / "fa.db")
        db_b = str(tmp_path / "fb.db")
        _mk_db(db_a, n_tables)
        _mk_db(db_b, n_tables)
        env = _env(spark, 200, n_tables)
        ns = "facfp"  # reused namespace; the attribute must disambiguate

        def factory_for(db):
            # self-contained (no test-module globals): the closure ships
            # to executor workers, which cannot import this test file
            def factory(table, _db=db):
                def make(_t=table, _d=_db):
                    import sqlite3 as _sq

                    from xxt_cdc_spark.sinks.upsert import JdbcUpsertWriter as _W

                    return _W(
                        connect_fn=lambda: _sq.connect(_d, timeout=60),
                        table=_t,
                        columns=["k", "v"],
                        key_cols=["k"],
                        dialect="sqlite",
                        pool_key=f"r8adv:{_d}",
                    )

                from xxt_cdc_spark.sinks.upsert import TableSink as _TS

                return _TS(make, ["k"], None)

            factory.fingerprint = db
            return factory

        try:
            apply_batch_fanout(
                env,
                sink_factory=factory_for(db_a),
                num_partitions=2,
                coalesce_commits=True,
                cache_writers=ns,
            )
            applied = apply_batch_fanout(
                env,
                sink_factory=factory_for(db_b),
                num_partitions=2,
                coalesce_commits=True,
                cache_writers=ns,
            )
            assert sum(applied.values()) == 200
        finally:
            close_pooled_connections()
        con = sqlite3.connect(db_b)
        n_b = sum(
            con.execute(f"SELECT COUNT(*) FROM t{i}").fetchone()[0] for i in range(n_tables)
        )
        con.close()
        assert n_b == 200, f"factory fingerprint must re-key the cache, got {n_b}"

    def test_dead_letter_cap_trims_oldest(self):
        class FakeWriter:
            dead_letters = [("upsert", (i,), "err") for i in range(25)]

        w = FakeWriter()
        _trim_cached_dead_letters(w, cap=10)
        assert len(w.dead_letters) == 10
        assert w.dead_letters[0] == ("upsert", (15,), "err")  # most recent kept
        _trim_cached_dead_letters(w, cap=10)  # idempotent at the cap
        assert len(w.dead_letters) == 10


class TestSemDedupSeedRobustness:
    def test_init_raises_on_short_seed(self, spark, tmp_path):
        from xxt_cdc_spark.functions.similarity import IncrementalIVF, IncrementalSemDedup

        df = spark.createDataFrame(
            [(i, [float(i), 1.0]) for i in range(5)], "vec_id long, embedding array<double>"
        )
        sd = IncrementalSemDedup(spark, str(tmp_path / "sd"), n_centroids=8)
        with pytest.raises(ValueError, match="n_centroids"):
            sd.init(df)
        ivf = IncrementalIVF(spark, str(tmp_path / "ivf"), n_centroids=8)
        with pytest.raises(ValueError, match="n_centroids"):
            ivf.init(df)

    def test_incremental_matches_batch_on_sparse_offset_ids(self, spark, tmp_path):
        """The r8 ADVICE failure shape: ids sparse and offset (not dense
        from 0). Percentile-derived cuts must still give chunk 0 enough
        rows to pin the global lowest-n centroids, and the incremental
        sweep must stay bit-equal to the batch sweep."""
        import random

        from xxt_cdc_spark.functions.similarity import IncrementalSemDedup, semantic_dedup

        rng = random.Random(7)
        # 60 vectors, ids start at 100_000 with erratic gaps
        ids, cur = [], 100_000
        for _ in range(60):
            cur += rng.randint(1, 997)
            ids.append(cur)
        rows = [
            (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in ids
        ]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        n_cen, thr = 8, 0.45
        batch = {
            (r["vec_id"], r["kept"])
            for r in semantic_dedup(emb, thr, n_centroids=n_cen, strategy="fold")
            .select("vec_id", "kept")
            .collect()
        }
        # ordered-percentile cuts, exactly like dedup_semantic_family
        b = emb.agg(
            F.min("vec_id").alias("lo"),
            F.expr("percentile(vec_id, array(1.0D/3, 2.0D/3))").alias("p"),
            F.max("vec_id").alias("hi"),
        ).first()
        cuts = [b["lo"], int(b["p"][0]) + 1, int(b["p"][1]) + 1, b["hi"] + 1]
        counts = [
            emb.filter((F.col("vec_id") >= cuts[k]) & (F.col("vec_id") < cuts[k + 1])).count()
            for k in range(3)
        ]
        assert min(counts) >= n_cen, f"tertile cuts must balance chunks, got {counts}"
        sd = IncrementalSemDedup(spark, str(tmp_path / "sp"), threshold=thr, n_centroids=n_cen)
        sd.init(emb.filter(F.col("vec_id") < cuts[1]))
        for k in range(3):
            sd.update(
                emb.filter(
                    (F.col("vec_id") >= cuts[k]) & (F.col("vec_id") < cuts[k + 1])
                ),
                chunk_id=k,
            )
        inc = {
            (r["vec_id"], r["kept"])
            for r in sd.state().select("vec_id", "kept").collect()
        }
        # kept flags must agree per id (cluster labelings differ by mode)
        assert {i for i, k in inc if k} == {i for i, k in batch if k}
