"""Streaming temporal enrichment: a fact stream joined per micro-batch
against the INCREMENTALLY-maintained SCD2 dimension (Scd2Table +
temporal_join) — the CDC enrichment topology (clicks enriched with the
customer record as-of the click).

Correctness contract exercised here: a fact probing position p is
STABLE once the dimension has applied every change ≤ p — later
dimension changes only close the open version AFTER p (valid_from ≤ p
is immutable, valid_to only moves from ∞ to q > p), so per-batch
enrichment of the completed position range accumulates to exactly the
one-shot temporal join over the final history."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from xxt_cdc_spark.changefeed import orders_changefeed
from xxt_cdc_spark.operators.scd2 import Scd2Table, scd2_history
from xxt_cdc_spark.operators.temporal_join import temporal_join

SF = "/root/testdata/sf0.001"
KEYS = ["o_orderkey"]
POS = ["pos_file", "pos_offset"]
CUTS = (500, 1000)  # orderkey ranges per batch (position = key*10 + phase)


class TestStreamingTemporalEnrich:
    def test_per_batch_enrichment_accumulates_to_oneshot(self, spark):
        cf = orders_changefeed(spark, SF).select(
            "op", *POS, "o_orderkey", "o_orderstatus", "o_totalprice"
        )
        # facts: every changefeed position probes at itself and +4
        # (mid-interval and post-delete gaps), deduped like the oracle
        facts = (
            cf.select("o_orderkey", "pos_file", "pos_offset")
            .union(
                cf.select(
                    "o_orderkey", "pos_file", (F.col("pos_offset") + 4).alias("pos_offset")
                )
            )
            .distinct()
        )

        root = tempfile.mkdtemp(prefix="xxt_enrich_")
        try:
            dim = Scd2Table(spark, root, KEYS, POS, n_buckets=8)
            k = F.col("o_orderkey")
            ranges = [
                k < CUTS[0],
                (k >= CUTS[0]) & (k < CUTS[1]),
                k >= CUTS[1],
            ]
            enriched_parts = []
            for i, rng in enumerate(ranges):
                dim.apply_batch(cf.filter(rng), i)
                if i == 1:
                    dim.apply_batch(cf.filter(rng), 1)  # replay: no-op
                # the newly COMPLETED position range is exactly this
                # key range (position = key*10 + phase): those facts
                # are now stable — enrich and emit them
                batch_facts = facts.filter(rng)
                enriched_parts.append(
                    temporal_join(batch_facts, dim.history(), KEYS, POS)
                    .localCheckpoint(eager=True)
                )
            got = sorted(
                (r.o_orderkey, r.pos_offset, r.o_orderstatus, round(r.o_totalprice, 4))
                for part in enriched_parts
                for r in part.select(
                    "o_orderkey", "pos_offset", "o_orderstatus", "o_totalprice"
                ).collect()
            )
        finally:
            shutil.rmtree(root, ignore_errors=True)

        oneshot = temporal_join(
            facts, scd2_history(cf.dropDuplicates(), KEYS, POS), KEYS, POS
        )
        want = sorted(
            (r.o_orderkey, r.pos_offset, r.o_orderstatus, round(r.o_totalprice, 4))
            for r in oneshot.select(
                "o_orderkey", "pos_offset", "o_orderstatus", "o_totalprice"
            ).collect()
        )
        assert got == want and len(want) > 1000
