"""Corpus analytics operators: TF-IDF, BM25, deterministic splits,
quantiles, histogram (queries/corpus.py, functions/text.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from xxt_cdc_spark.functions import text as TX
from xxt_cdc_spark.queries import corpus


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


class TestTfidf:
    def test_topk_per_doc_and_rank_contract(self, spark, sf_dir):
        out = corpus.text_tfidf_topk(spark, sf_dir)
        per_doc = out.groupBy("doc_id").agg(
            F.count("*").alias("n"), F.max("rank").alias("maxr")
        )
        bad = per_doc.filter(
            (F.col("n") > corpus.TFIDF_K) | (F.col("maxr") != F.col("n"))
        )
        assert bad.count() == 0

    def test_rare_term_outscores_common_at_equal_tf(self, spark):
        df = spark.createDataFrame(
            [(1, "common rare"), (2, "common other"), (3, "common more")],
            "doc_id long, text string",
        )
        out = {
            (r.doc_id, r.term): r.tfidf
            for r in TX.tfidf_topk(df, "text", "doc_id", 5).collect()
        }
        assert out[(1, "rare")] > out[(1, "common")]

    def test_plan_one_text_scan_no_cartesian(self, spark, sf_dir):
        plan = _plan(corpus.text_tfidf_topk(spark, sf_dir))
        assert "CartesianProduct" not in plan
        # the single-row corpus-count side must broadcast
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


class TestBM25:
    def test_only_matching_docs_scored_positive(self, spark, sf_dir):
        out = corpus.text_bm25_search(spark, sf_dir)
        rows = out.collect()
        assert 0 < len(rows) <= corpus.BM25_K
        assert all(r.score > 0 for r in rows)
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
        # every ranked doc really contains a query term
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        hit_ids = {
            r.doc_id
            for r in docs.filter(
                F.arrays_overlap(
                    TX.tokens("text"),
                    F.array(*[F.lit(t) for t in corpus.BM25_TERMS]),
                )
            ).collect()
        }
        assert {r.doc_id for r in rows} <= hit_ids

    def test_term_filter_precedes_aggregation(self, spark, sf_dir):
        # the hit-set filter must run before the (doc, term) aggregation
        # — shuffling the whole corpus to then drop non-query terms is
        # the 100 TB anti-pattern
        plan = _plan(corpus.text_bm25_search(spark, sf_dir))
        assert "CartesianProduct" not in plan
        filter_pos = plan.find(corpus.BM25_TERMS[0])
        agg_pos = plan.find("HashAggregate")
        assert filter_pos != -1 and (agg_pos == -1 or filter_pos < agg_pos or "Filter" in plan)


class TestSplit:
    def test_deterministic_and_partition_invariant(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        a = docs.select("doc_id", TX.split_assign("doc_id").alias("s"))
        b = docs.repartition(13).select("doc_id", TX.split_assign("doc_id").alias("s"))
        assert a.join(b, "doc_id").filter(a.s != b.s).count() == 0

    def test_ratios_near_design(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        n = docs.count()
        counts = {
            r.s: r.c
            for r in docs.select(TX.split_assign("doc_id").alias("s"))
            .groupBy("s")
            .agg(F.count("*").alias("c"))
            .collect()
        }
        assert set(counts) == {"train", "val", "test"}
        assert 0.70 <= counts["train"] / n <= 0.86
        assert 0.05 <= counts["val"] / n <= 0.18
        assert 0.05 <= counts["test"] / n <= 0.18


class TestDistributions:
    def test_quantiles_monotone(self, spark, sf_dir):
        for r in corpus.corpus_token_quantiles(spark, sf_dir).collect():
            assert r.p10 <= r.p50 <= r.p90 <= r.p99

    def test_stats_partition_corpus(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        out = corpus.corpus_stats(spark, sf_dir)
        assert out.agg(F.sum("n_docs")).first()[0] == docs.count()
        # bucket floors are multiples of the bucket width
        assert out.filter(F.col("len_bucket") % corpus.HIST_BUCKET != 0).count() == 0
        assert {r.split for r in out.select("split").distinct().collect()} == {
            "train", "val", "test",
        }
