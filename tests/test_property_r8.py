"""Property tests for the round-8 code paths.

1. apply_ordered_params ≡ apply_rows on randomized keyless op
   sequences (the order-preserving fanout path must apply EXACTLY the
   statements the row-iterator path applies, in the same order — a
   pure-sqlite fold is the reference semantics).
2. multi_values flush splitting: for random widths/row counts, the
   budgeted multi-VALUES statements apply the same converged state as
   plain executemany and never exceed the bind-parameter cap.
3. IncrementalSemDedup ≡ batch semantic_dedup for RANDOM id-ordered
   chunkings of a random corpus (one seeded Spark run per example
   class — JVM round trips are too slow for per-example hypothesis;
   the pure-Python statement fold gets real hypothesis fuzzing).
"""

from __future__ import annotations

import random
import sqlite3

from hypothesis import given, settings
from hypothesis import strategies as st

from xxt_cdc_spark.sinks.upsert import JdbcUpsertWriter


def _mk(tmpdir, name):
    db = f"{tmpdir}/{name}.db"
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE t (k INTEGER PRIMARY KEY, v INTEGER)")
    con.commit()
    con.close()
    return db


def _state(db):
    con = sqlite3.connect(db)
    rows = sorted(con.execute("SELECT k, v FROM t").fetchall())
    con.close()
    return rows


def _writer(db, **kw):
    return JdbcUpsertWriter(
        connect_fn=lambda: sqlite3.connect(db, timeout=30),
        table="t", columns=["k", "v"], key_cols=["k"], dialect="sqlite", **kw,
    )


class TestOrderedParamsProperty:
    @given(seed=st.integers(0, 10_000), batch_size=st.integers(1, 7))
    @settings(max_examples=25, deadline=None)
    def test_ordered_equals_row_iterator(self, seed, batch_size, tmp_path_factory):
        """Random interleaved upsert/delete sequences over a small key
        space (so same-row interleavings are common): the tuple-fed
        ordered path and the dict-row path must converge identically
        at every batch_size (flush-boundary independence)."""
        rng = random.Random(seed)
        seq, rows = [], []
        for _ in range(rng.randrange(1, 60)):
            k = rng.randrange(5)
            if rng.random() < 0.3:
                seq.append(("delete", (k,)))
                rows.append({"op": "D", "k": k, "v": None})
            else:
                v = rng.randrange(100)
                seq.append(("upsert", (k, v)))
                rows.append({"op": "I", "k": k, "v": v})
        tmp = tmp_path_factory.mktemp("op")
        db_a, db_b = _mk(tmp, f"a{seed}_{batch_size}"), _mk(tmp, f"b{seed}_{batch_size}")
        _writer(db_a, batch_size=batch_size).apply_ordered_params(seq)
        _writer(db_b, batch_size=batch_size).apply_rows(rows)
        assert _state(db_a) == _state(db_b)

    @given(seed=st.integers(0, 10_000), batch_size=st.integers(1, 9))
    @settings(max_examples=15, deadline=None)
    def test_multi_values_split_converges(self, seed, batch_size, tmp_path_factory):
        """multi_values=True (with the 999-placeholder budget forcing
        splits at tiny row caps) must converge like executemany for
        random ordered sequences — VALUES-order application within one
        statement preserves same-key runs."""
        rng = random.Random(seed)
        seq = []
        for _ in range(rng.randrange(1, 80)):
            k = rng.randrange(4)
            if rng.random() < 0.25:
                seq.append(("delete", (k,)))
            else:
                seq.append(("upsert", (k, rng.randrange(100))))
        tmp = tmp_path_factory.mktemp("mv")
        db_a, db_b = _mk(tmp, f"a{seed}_{batch_size}"), _mk(tmp, f"b{seed}_{batch_size}")
        wa = _writer(db_a, batch_size=batch_size, multi_values=True)
        # force tiny statements so splits happen constantly
        wa._multi_rows_cap = 2
        wa.apply_ordered_params(seq)
        _writer(db_b, batch_size=batch_size).apply_ordered_params(seq)
        assert _state(db_a) == _state(db_b)
        assert wa.stats["failures"] == 0 and not wa.dead_letters


class TestIncrementalSemDedupProperty:
    def test_random_chunkings_equal_batch(self, spark, tmp_path):
        """One seeded Spark pass over several RANDOM id-ordered
        chunkings of a random unit-vector corpus: every chunking's
        incremental result equals the batch sweep (the id-keyed rule's
        chunking-independence, beyond the registered 3-chunk shape)."""
        import shutil
        import tempfile

        import numpy as np
        from pyspark.sql import functions as F

        from xxt_cdc_spark.functions import similarity as S

        rng = np.random.default_rng(7)
        n, d = 120, 8
        base = rng.normal(size=(30, d))
        # planted near-dups: each vector is a base row + small noise
        vecs = [
            base[rng.integers(0, 30)] + rng.normal(scale=0.05, size=d)
            for _ in range(n)
        ]
        emb = spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
            "vec_id long, embedding array<double>",
        ).cache()
        t, c = 0.9, 6
        batch = {
            (r.vec_id, r.kept)
            for r in S.semantic_dedup(emb, t, n_centroids=c, strategy="fold").collect()
        }
        assert any(k == 0 for _, k in batch), "corpus must contain planted dups"
        pyrng = random.Random(11)
        for trial in range(3):
            n_chunks = pyrng.randrange(2, 6)
            cuts = sorted(pyrng.sample(range(1, n), n_chunks - 1))
            spans = list(zip([0, *cuts], [*cuts, n]))
            state = tempfile.mkdtemp(prefix=f"semdd_prop{trial}_")
            try:
                idx = S.IncrementalSemDedup(spark, state, threshold=t, n_centroids=c)
                idx.init(emb)  # seeds = lowest ids, same as batch
                for k, (lo, hi) in enumerate(spans):
                    idx.update(
                        emb.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi)),
                        chunk_id=k,
                    )
                inc = {(r.vec_id, r.kept) for r in idx.state().collect()}
                assert inc == batch, (trial, spans)
            finally:
                shutil.rmtree(state, ignore_errors=True)
