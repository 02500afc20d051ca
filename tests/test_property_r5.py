"""Property-style invariants for the r5 operators (the repo's seeded
large-history convention — one big randomized case drives Spark once,
a pure-Python oracle replays it; see test_property_lww.py)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from xxt_cdc_spark.operators.reconcile import reconcile
from xxt_cdc_spark.operators.scd2 import scd2_history
from xxt_cdc_spark.operators.temporal_join import temporal_join


def _random_history(seed: int, n_keys: int = 120, max_events: int = 10):
    rng = random.Random(seed)
    events, pos = [], 0
    for key in range(n_keys):
        alive = False
        for _ in range(rng.randint(1, max_events)):
            pos += rng.randint(1, 3)
            if not alive:
                op, alive = "I", True
            else:
                op = rng.choice(["U", "U", "D"])
                alive = op != "D"
            events.append((op, "f1", pos, key, rng.randint(0, 9999)))
    return events


class TestTemporalJoinProperty:
    def test_random_history_random_probes_match_bruteforce(self, spark):
        events = _random_history(seed=7)
        rng = random.Random(99)
        max_pos = max(e[2] for e in events)
        probes = [
            (rng.randrange(120), "f1", rng.randint(0, max_pos + 3))
            for _ in range(2000)
        ]

        hist = scd2_history(
            spark.createDataFrame(events, "op string, pos_file string, pos_offset long, k long, v long"),
            ["k"],
            ["pos_file", "pos_offset"],
        )
        got = sorted(
            (r.k, r.pos_offset, r.v)
            for r in temporal_join(
                spark.createDataFrame(sorted(set(probes)), "k long, pos_file string, pos_offset long"),
                hist,
                ["k"],
                ["pos_file", "pos_offset"],
            ).collect()
        )

        # brute force: per key, versions = [from, to) intervals over the
        # position-sorted event list; deletes close without creating
        versions: dict[int, list[tuple[int, float, int]]] = {}
        by_key: dict[int, list] = {}
        for op, _f, p, k, v in sorted(events, key=lambda e: e[2]):
            by_key.setdefault(k, []).append((p, op, v))
        for k, evs in by_key.items():
            for i, (p, op, v) in enumerate(evs):
                if op == "D":
                    continue
                to = evs[i + 1][0] if i + 1 < len(evs) else float("inf")
                versions.setdefault(k, []).append((p, to, v))
        want = sorted(
            (k, p, v)
            for (k, _f, p) in set(probes)
            for (frm, to, v) in versions.get(k, [])
            if frm <= p < to
        )
        assert got == want and len(want) > 500


class TestReconcileProperty:
    def test_random_drift_is_reported_exactly(self, spark):
        rng = random.Random(11)
        rows = [(i, rng.randint(0, 99), f"s{rng.randint(0, 999)}") for i in range(3000)]
        expected: list[tuple[int, str]] = []
        dst = []
        for (i, a, b) in rows:
            roll = rng.random()
            if roll < 0.01:
                expected.append((i, "missing_in_target"))  # dropped
            elif roll < 0.02:
                dst.append((i, a + 1, b))
                expected.append((i, "differs"))
            else:
                dst.append((i, a, b))
        for j in range(30):  # spurious target-only rows
            dst.append((10_000 + j, 0, "ghost"))
            expected.append((10_000 + j, "missing_in_source"))

        src_df = spark.createDataFrame(rows, "id long, a int, b string")
        dst_df = spark.createDataFrame(dst, "id long, a int, b string")
        got = sorted((r.id, r.status) for r in reconcile(src_df, dst_df, ["id"], 64).collect())
        assert got == sorted(expected) and len(expected) > 50


class TestTopKStoreProperty:
    def test_random_batch_splits_equal_one_shot(self, spark, tmp_path):
        from xxt_cdc_spark.operators.topk_store import WindowedTopK

        rng = random.Random(5)
        rows = [
            (f"k{rng.randint(0, 12)}", f"2024-01-01 {rng.randint(0, 23):02d}:{rng.randint(0, 59):02d}:00")
            for _ in range(4000)
        ]
        # random 5-way split, one replayed batch
        batches: list[list] = [[] for _ in range(5)]
        for r in rows:
            batches[rng.randrange(5)].append(r)
        store = WindowedTopK(spark, str(tmp_path / "st"), key_col="event_type")
        for i, b in enumerate(batches):
            df = spark.createDataFrame(b, "event_type string, ts string").select(
                "event_type", F.col("ts").cast("timestamp").alias("ts")
            )
            store.apply_batch(df, i)
            if i == 2:
                store.apply_batch(df, 2)  # replay must not double-count

        # python oracle: exact counts → rank by (-n, key) → top 3
        counts: dict[tuple[int, str], int] = {}
        for k, ts in rows:
            h = int(ts[11:13])
            counts[(h, k)] = counts.get((h, k), 0) + 1
        want = []
        for h in sorted({w for (w, _k) in counts}):
            top = sorted(
                ((kk, n) for (w, kk), n in counts.items() if w == h),
                key=lambda it: (-it[1], it[0]),
            )[:3]
            for rank, (kk, n) in enumerate(top, 1):
                want.append((h, rank, kk, n))

        got = sorted(
            (r.window_start.hour, r.rank, r.event_type, r.n)
            for r in store.topk(3, include_open=True).collect()
        )
        assert got == sorted(want) and len(want) > 60
