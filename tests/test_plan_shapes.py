"""Physical-plan regression guards: the properties SCALING.md claims
must stay visible in the plans (pushdown, pruning, broadcast, partial
aggregation). Plan text is version-sensitive, so assertions target
stable markers only."""

from __future__ import annotations

from xxt_cdc_spark.queries import QUERIES


def _plan(spark, sf_dir, name: str) -> str:
    df = QUERIES[name](spark, sf_dir)
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


class TestPlanShapes:
    def test_q1_filter_pushdown_and_pruning(self, spark, sf_dir):
        plan = _plan(spark, sf_dir, "q1_pricing_summary")
        assert "PushedFilters" in plan and "l_shipdate" in plan.split("PushedFilters", 1)[1][:200]
        # column pruning: payload columns only, never the full table
        read_schema = plan.split("ReadSchema", 1)[1][:400]
        assert "l_orderkey" not in read_schema  # not needed by q1
        assert "partial_sum" in plan  # map-side combine

    def test_q3_dimensions_broadcast(self, spark, sf_dir):
        plan = _plan(spark, sf_dir, "q3_top_orders")
        assert plan.count("BroadcastHashJoin") >= 2
        assert "SortMergeJoin" not in plan

    def test_q5_no_fact_side_shuffle_before_agg(self, spark, sf_dir):
        plan = _plan(spark, sf_dir, "q5_region_revenue")
        assert plan.count("BroadcastHashJoin") >= 3

    def test_lww_uses_window_group_limit(self, spark, sf_dir):
        plan = _plan(spark, sf_dir, "cdc_lww_collapse")
        # rank<=1 must be pushed into WindowGroupLimit (truncated sort)
        assert "WindowGroupLimit" in plan

    def test_changefeed_filter_pushdown(self, spark, sf_dir):
        plan = _plan(spark, sf_dir, "cdc_catchup_range")
        # the pos bound must prune at the scan level of the derived feed
        assert "PushedFilters" in plan

    def test_simhash_joins_on_integers_no_cartesian(self, spark, sf_dir):
        plan = _plan(spark, sf_dir, "dedup_simhash")
        assert "CartesianProduct" not in plan
        # hamming must be one bit_count(xor), not per-bit substring compares
        assert "bit_count" in plan and "substring(sig_i" not in plan

    def test_jaccard_self_join_keys_on_shingle_hash(self, spark, sf_dir):
        plan = _plan(spark, sf_dir, "dedup_ngram_jaccard")
        assert "xxhash64" in plan  # 8-byte join key, not the shingle string
        assert "CartesianProduct" not in plan

    def test_minhash_verification_has_no_pair_fanout(self, spark, sf_dir):
        plan = _plan(spark, sf_dir, "dedup_minhash_lsh")
        assert "CartesianProduct" not in plan
        # shared-shingle counting joins on (doc, shingle-hash) — the
        # hash key must reach the join, not a post-join filter
        assert "xxhash64" in plan

    def test_pq_uses_broadcast_joins_only(self, spark, sf_dir):
        # ann_pq_topk folded into ann_flat_family (r5) — the plan guard
        # targets the module function directly
        from xxt_cdc_spark.queries.vector import ann_pq_topk

        df = ann_pq_topk(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        # codebook/table sides are broadcast; the code scan must never
        # degrade to a nested-loop or cartesian pair join
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_repetition_stats_prunes_and_partially_aggregates(self, spark, sf_dir):
        plan = _plan(spark, sf_dir, "text_quality_gates")
        # only (doc_id, text) may be read — lang/source/n_chars pruned
        read_schema = plan.split("ReadSchema", 1)[1][:200]
        assert "doc_id" in read_schema and "text" in read_schema
        assert "lang" not in read_schema and "source" not in read_schema
        assert "partial_count" in plan or "partial_sum" in plan  # map-side combine
        assert "CartesianProduct" not in plan

    def test_pii_redact_is_scan_shaped(self, spark, sf_dir):
        plan = _plan(spark, sf_dir, "text_pii_redact")
        # one scan → projection → partial-aggregated groupBy; no joins
        assert "Join" not in plan
        assert "partial_count" in plan or "partial_sum" in plan

    def test_pack_sequences_windows_by_shard_not_globally(self, spark, sf_dir):
        plan = _plan(spark, sf_dir, "corpus_pack_sequences")
        # the cumsum window must partition by shard: a global window
        # shows up as a single-partition Exchange
        assert "SinglePartition" not in plan.split("Window", 1)[0]

    def test_decontaminate_semi_joins_on_hash(self, spark, sf_dir):
        plan = _plan(spark, sf_dir, "corpus_decontaminate")
        assert "xxhash64" in plan  # 8-byte gram key, not the string
        assert "LeftSemi" in plan
        assert "CartesianProduct" not in plan

    def test_binned_range_join_is_hash_join(self, spark, sf_dir):
        """The keyless containment join must execute as a hash join on
        the bin id — the naive form degenerates to a nested-loop
        (operators/range_join.py docstring)."""
        plan = _plan(spark, sf_dir, "range_join_binned_global")
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan
        assert "Join" in plan  # still a join, keyed on the bin

    def test_naive_keyless_range_join_would_nested_loop(self, spark, sf_dir):
        """Documents WHY the binned operator exists: the same join
        written naively has no equi-key and Catalyst nested-loops it."""
        from xxt_cdc_spark.session import load_tables

        t = load_tables(spark, sf_dir)
        from pyspark.sql import functions as F

        iv = t["orders"].limit(100).select(
            "o_orderkey", F.col("o_orderdate").alias("lo"),
            (F.col("o_orderdate") + F.expr("INTERVAL 3 DAY")).alias("hi"))
        ev = t["events"].select("event_id", "ts")
        naive = ev.join(iv, (ev.ts >= iv.lo) & (ev.ts < iv.hi))
        plan = naive._sc._jvm.PythonSQLUtils.explainString(
            naive._jdf.queryExecution(), "formatted")
        assert "BroadcastNestedLoopJoin" in plan or "CartesianProduct" in plan

    def test_fuzzy_join_grams_are_equi_join_keyed(self, spark, sf_dir):
        """The fuzzy join's data-sized path must be the gram-keyed
        equi-join (hash/sort-merge); the pair space is never enumerated.
        The short-string branch is a length-bounded residual cross join
        of two (here empty) filtered sides — it may appear as a
        BroadcastNestedLoopJoin node, but never as a CartesianProduct
        over the full inputs."""
        plan = _plan(spark, sf_dir, "fuzzy_join_part_names")
        assert "CartesianProduct" not in plan
        assert "HashJoin" in plan or "SortMergeJoin" in plan

    def test_stream_interval_join_is_equi_hash_join(self, spark, sf_dir):
        """The stream-stream interval join's batch twin must key on
        user_id (hash or sort-merge join) with the time range as a
        residual predicate — never a nested loop over the pair space."""
        plan = _plan(spark, sf_dir, "stream_interval_join")
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan
        assert "HashJoin" in plan or "SortMergeJoin" in plan

    def test_lsh_multitable_is_equi_join_only(self, spark, sf_dir):
        """OR-amplified LSH must stay a (table_id, bucket) equi-join —
        L tables via explode, never an OR-of-equalities nested loop."""
        from pyspark.sql import functions as F

        from xxt_cdc_spark.functions import similarity as S

        e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        out = S.lsh_multitable_topk(e, e.filter(F.col("vec_id") < 3), 5)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_incremental_semdedup_candidates_equi_join_on_centroid(self, spark, sf_dir):
        """IncrementalSemDedup.update's dup-candidate join must key on
        the centroid (equi-join, Σsz² within clusters) — the only
        CartesianProduct-shaped node allowed anywhere in the update is
        the BROADCAST centroid-assignment crossJoin (O(N·C) routing,
        documented), never an all-pairs corpus join."""
        import shutil
        import tempfile

        from pyspark.sql import functions as F

        from xxt_cdc_spark.functions import similarity as S

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        state = tempfile.mkdtemp(prefix="semdd_plan_")
        try:
            idx = S.IncrementalSemDedup(spark, state, threshold=0.38, n_centroids=8)
            idx.init(emb)
            idx.update(emb.filter(F.col("vec_id") < 50), chunk_id=0)
            # rebuild the flagged plan the way update() does, and
            # inspect it (update() itself materializes through the
            # store apply, so re-derive the candidate join plan)
            assigned = S._nearest_centroids(
                emb.filter(F.col("vec_id") < 50).select("vec_id", "embedding"),
                idx._centroids_df(), 1, "vec_id", "embedding", "vec_id", "embedding",
            )
            others = assigned.select(
                F.col("vec_id").alias("j"), F.col("embedding").alias("vb"), "centroid"
            ).unionByName(
                idx.store.read_buckets(list(range(8))).select(
                    F.col("vec_id").alias("j"), F.col("embedding").alias("vb"), "centroid"
                )
            )
            dups = (
                assigned.select("centroid", F.col("vec_id").alias("i"),
                                F.col("embedding").alias("va"))
                .join(others, "centroid")
                .filter(F.col("j") < F.col("i"))
                .filter(S.cosine("va", "vb") >= 0.38)
            )
            plan = dups._sc._jvm.PythonSQLUtils.explainString(
                dups._jdf.queryExecution(), "formatted"
            )
            # centroid equi-join for candidates; the only cross-shaped
            # node is the broadcast centroid assignment (tiny side)
            assert "CartesianProduct" not in plan
            joins = plan.count("BroadcastHashJoin") + plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin")
            assert joins >= 1
        finally:
            shutil.rmtree(state, ignore_errors=True)
