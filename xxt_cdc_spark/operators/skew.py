"""Skew mitigation: salted two-phase aggregation.

The reference's hash router sends every event for one hot key to one
partition (router/EventRouter.scala:28-31) — at 100 TB a hot key is a
straggler. For aggregations the standard fix is salting: scatter each
key across ``salt_buckets`` partitions, partially aggregate, then
aggregate the partials. Results are identical to the direct plan (we
register an oracle-checked query proving it); the first shuffle is
uniform even when the key distribution isn't.

AQE's skew-join splitting (enabled in session.py) handles the join
case; this helper covers aggregations, where AQE can't repartition a
running aggregation mid-stage.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_agg(
    df: DataFrame,
    group_cols: list[str],
    aggs: Sequence[tuple[Column, Column, str]],
    salt_buckets: int = 16,
    salt_source: str | None = None,
) -> DataFrame:
    """Two-phase aggregation with salted first phase.

    ``aggs``: (partial_agg, final_agg_over_partial, out_name) triples,
    e.g. ``(F.count(F.lit(1)), F.sum("partial_0"), "n_events")`` —
    the partial runs within (keys, salt), the final runs over the
    partials per key. Only decomposable aggregates apply (sum/count/
    min/max — count→sum, sum→sum, min→min, max→max).

    ``salt_source``: deterministic salt column (for reproducible tests);
    default sprays via ``rand``-free monotonically increasing id.
    """
    salt = (
        F.pmod(F.col(salt_source), F.lit(salt_buckets))
        if salt_source
        else F.pmod(F.monotonically_increasing_id(), F.lit(salt_buckets))
    )
    partials = [p.alias(f"partial_{i}") for i, (p, _f, _n) in enumerate(aggs)]
    finals = [f.alias(n) for _p, f, n in aggs]
    phase1 = df.withColumn(_SALT, salt).groupBy(*group_cols, _SALT).agg(*partials)
    return phase1.groupBy(*group_cols).agg(*finals)
