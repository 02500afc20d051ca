"""IncrementalSemDedup — the streaming form of semantic_dedup.

The load-bearing property: because the greedy sweep keys on id (not
arrival), folding id-ordered chunks into the persistent store yields
kept flags BIT-EQUAL to the batch sweep of the full corpus. The
registered dedup_semantic_family query gates this equivalence in the
driver's value hash; these tests gate the mechanics (replay no-op,
bucket pruning, init contract, the out-of-order caveat's exact shape).
"""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from xxt_cdc_spark.functions import similarity as S

T, C = 0.38, 8


@pytest.fixture()
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _chunks(emb):
    mx = emb.agg(F.max("vec_id")).first()[0]
    cuts = [0, (mx + 1) // 3, 2 * (mx + 1) // 3, mx + 1]
    return [(cuts[k], cuts[k + 1]) for k in range(3)]


class TestIncrementalSemDedup:
    def test_equals_batch_and_replay_noop(self, spark, emb):
        batch = {
            (r.vec_id, r.kept)
            for r in S.semantic_dedup(emb, T, n_centroids=C, strategy="fold").collect()
        }
        state = tempfile.mkdtemp(prefix="semdd_t_")
        try:
            idx = S.IncrementalSemDedup(spark, state, threshold=T, n_centroids=C)
            spans = _chunks(emb)
            idx.init(emb.filter(F.col("vec_id") < spans[0][1]))
            for k, (lo, hi) in enumerate(spans):
                idx.update(
                    emb.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi)),
                    chunk_id=k,
                )
            before = {(r.vec_id, r.kept) for r in idx.state().collect()}
            assert before == batch
            # replay chunk 1: keyed LWW merge + id<-filter recompute →
            # flags and row count unchanged
            lo, hi = spans[1]
            stats = idx.update(
                emb.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi)), chunk_id=1
            )
            after = {(r.vec_id, r.kept) for r in idx.state().collect()}
            assert after == before
            assert stats["touched_buckets"], "replay should still report its buckets"
        finally:
            shutil.rmtree(state, ignore_errors=True)

    def test_update_touches_only_probed_buckets(self, spark, emb):
        """An update rewrites ONLY the centroid partitions its chunk
        assigns into — the partition-pruning scale argument."""
        state = tempfile.mkdtemp(prefix="semdd_p_")
        try:
            idx = S.IncrementalSemDedup(spark, state, threshold=T, n_centroids=C)
            spans = _chunks(emb)
            idx.init(emb.filter(F.col("vec_id") < spans[0][1]))
            one = emb.filter(F.col("vec_id") < 10)
            stats = idx.update(one, chunk_id=0)
            assert set(stats["touched_buckets"]) <= set(range(C))
            # a 10-vector chunk cannot touch more than 10 clusters
            assert len(stats["touched_buckets"]) <= 10
        finally:
            shutil.rmtree(state, ignore_errors=True)

    def test_requires_init(self, spark, emb):
        state = tempfile.mkdtemp(prefix="semdd_u_")
        try:
            idx = S.IncrementalSemDedup(spark, state, threshold=T, n_centroids=C)
            with pytest.raises(RuntimeError, match="not initialized"):
                idx.update(emb.limit(5), chunk_id=0)
        finally:
            shutil.rmtree(state, ignore_errors=True)

    def test_out_of_order_caveat_shape(self, spark, emb):
        """The documented caveat, pinned exactly: a late-arriving
        SMALLER id is flagged correctly against the store, but an
        already-stored larger id is NOT revisited — its flag may be
        stale (kept=1) relative to the batch answer. Replaying the
        larger id's chunk afterwards heals it."""
        # find a dropped pair (i < j, j dropped because of i) in batch
        batch = S.semantic_dedup(emb, T, n_centroids=C, strategy="fold").collect()
        dropped = [r.vec_id for r in batch if r.kept == 0]
        if not dropped:
            pytest.skip("corpus has no semantic dups at this sf")
        j = min(dropped)
        state = tempfile.mkdtemp(prefix="semdd_o_")
        try:
            idx = S.IncrementalSemDedup(spark, state, threshold=T, n_centroids=C)
            idx.init(emb)  # seeds from the full frame's lowest ids
            # deliver j's SUCCESSORS + j first (so none of j's smaller-id
            # neighbors are stored), then the smaller ids late
            idx.update(emb.filter(F.col("vec_id") >= j), chunk_id=0)
            first = {r.vec_id: r.kept for r in idx.state().collect()}
            assert first[j] == 1, "without its smaller-id neighbors j must be kept"
            idx.update(emb.filter(F.col("vec_id") < j), chunk_id=1)
            stale = {r.vec_id: r.kept for r in idx.state().collect()}
            assert stale[j] == 1, "stored ids are not revisited (the documented caveat)"
            # healing: replay j's chunk — now the store holds the
            # smaller ids, so the recompute flags j correctly
            idx.update(emb.filter(F.col("vec_id") >= j), chunk_id=2)
            healed = {r.vec_id: r.kept for r in idx.state().collect()}
            assert healed[j] == 0
            assert healed == {r.vec_id: r.kept for r in batch}
        finally:
            shutil.rmtree(state, ignore_errors=True)


class TestStreamingIntegration:
    def test_foreachbatch_stream_equals_batch(self, spark, emb, tmp_path):
        """The production wiring: documents' embeddings ARRIVE as a
        stream and foreachBatch folds each micro-batch into the
        persistent store — the final kept flags must equal the batch
        sweep (same id-keyed rule; ids arrive nondecreasing)."""
        import json as _json

        rows = sorted(
            ((r.vec_id, list(r.embedding)) for r in emb.collect()),
        )
        src = tmp_path / "src"
        src.mkdir()
        cuts = [0, len(rows) // 3, 2 * len(rows) // 3, len(rows)]
        for i in range(3):
            with open(src / f"c{i}.json", "w") as f:
                for vid, vec in rows[cuts[i]:cuts[i + 1]]:
                    f.write(_json.dumps({"vec_id": vid, "embedding": vec}) + "\n")
        from conftest import stamp_feed

        stamp_feed(src)

        state = tempfile.mkdtemp(prefix="semdd_s_")
        try:
            idx = S.IncrementalSemDedup(spark, state, threshold=T, n_centroids=C)
            idx.init(emb.filter(F.col("vec_id") < rows[cuts[1]][0]))

            vec_type = emb.schema["embedding"].dataType.simpleString()

            def fold(batch_df, batch_id):
                # align the wire type to the store's (JSON floats read
                # as double; the store's add-only evolution guard
                # correctly REFUSES a same-name type drift — typed-cast
                # at the ingress is the caller's contract)
                if batch_df.count():
                    idx.update(
                        batch_df.withColumn(
                            "embedding", F.col("embedding").cast(vec_type)
                        ),
                        chunk_id=batch_id,
                    )

            q = (
                spark.readStream.schema("vec_id long, embedding array<double>")
                .option("maxFilesPerTrigger", "1")
                .json(str(src))
                .writeStream.foreachBatch(fold)
                .option("checkpointLocation", str(tmp_path / "ck"))
                .trigger(availableNow=True)
                .start()
            )
            assert q.awaitTermination(300)
            inc = {(r.vec_id, r.kept) for r in idx.state().collect()}
            batch = {
                (r.vec_id, r.kept)
                for r in S.semantic_dedup(emb, T, n_centroids=C, strategy="fold").collect()
            }
            assert inc == batch
        finally:
            shutil.rmtree(state, ignore_errors=True)
