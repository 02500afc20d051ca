"""Distributed Bloom filter: build, membership, FPP, and the exact
two-phase decontamination composition."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from xxt_cdc_spark.functions.bloom import bloom_params, build_bloom, might_contain

SF = "/root/testdata/sf0.001"


class TestBloomFilter:
    def test_params(self):
        m, k = bloom_params(10_000, 0.01)
        assert m % 64 == 0
        assert 9.0 <= m / 10_000 <= 10.5  # ~9.6 bits/key at 1%
        assert k == 7
        with pytest.raises(ValueError):
            bloom_params(0)
        with pytest.raises(ValueError):
            bloom_params(10, 1.5)

    def test_no_false_negatives(self, spark):
        members = spark.range(5000).select(F.col("id"))
        bloom = build_bloom(members, "id", expected_items=5000)
        got = members.filter(might_contain(spark, bloom, F.col("id"))).count()
        assert got == 5000  # every inserted key answers true

    def test_fpp_near_target(self, spark):
        members = spark.range(5000)
        bloom = build_bloom(members, "id", expected_items=5000, fpp=0.01)
        non = spark.range(1_000_000, 1_020_000)
        fp = non.filter(might_contain(spark, bloom, F.col("id"))).count()
        assert fp / 20_000 < 0.05  # 5x headroom over the 1% target

    def test_string_keys(self, spark):
        df = spark.createDataFrame([(f"gram {i}",) for i in range(300)], "g string")
        bloom = build_bloom(df, "g", expected_items=300)
        assert df.filter(might_contain(spark, bloom, F.col("g"))).count() == 300

    def test_bitmap_size_economics(self, spark):
        """The point: ~1.2 bytes/key at 1% FPP vs ~60 B/key for a
        broadcast join hash table."""
        bloom = build_bloom(spark.range(10_000), "id", 10_000, fpp=0.01)
        assert bloom["words"].nbytes <= 2.0 * 10_000  # < 2 B/key

    def test_two_phase_decontaminate_is_exact(self, spark):
        """Bloom prefilter + semi-join verify must equal the exact
        path document for document (the composition has no FPs or
        FNs), on the real corpus table."""
        from xxt_cdc_spark.functions.curation import decontaminate, decontaminate_bloom
        from xxt_cdc_spark.functions.text import split_assign

        d = (
            spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", "text")
            .withColumn("split", split_assign("doc_id"))
        )
        exact = decontaminate(d, "text", "doc_id", "split")
        fast = decontaminate_bloom(d, "text", "doc_id", "split")
        a = sorted((r.doc_id, r.contaminated) for r in exact.select("doc_id", "contaminated").collect())
        b = sorted((r.doc_id, r.contaminated) for r in fast.select("doc_id", "contaminated").collect())
        assert a == b and len(a) > 100
