"""Query registry — the engine's operator coverage surface.

Every implemented operator from SURVEY.md §2 (plus the north-star
data-pipeline operators) registers here as a pair:

- ``QUERIES[name]``: callable (spark, sf_dir) → DataFrame, built with
  the engine's operator modules;
- ``ORACLE[name]``: equivalent ANSI SQL for the DuckDB oracle (same
  column names — aggregates are aliased identically on both sides).

Aggregate determinism: float sums are computed through exact decimal
arithmetic and cast to double at the end, so results are bit-identical
across engines regardless of partition/summation order.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from xxt_cdc_spark.queries import (
    cdc,
    corpus,
    curation,
    layout,
    quality,
    relational,
    relational2,
    sketches,
    sketches2,
    streaming,
    text,
    vector,
)


def _pinned(fn: Callable[[SparkSession, str], DataFrame]) -> Callable[[SparkSession, str], DataFrame]:
    """Pin session confs the oracle comparison depends on.

    The driver runs queries in ITS OWN session: a non-UTC timezone
    would shift window/timestamp results relative to DuckDB's naive
    timestamps, and the nanos-timestamp events table needs the legacy
    read conf. Both are runtime-settable, so every query self-pins.
    """

    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # parquet annotated isAdjustedToUTC=false must read as LTZ
        # (TIMESTAMP), not NTZ: unix_micros()/withWatermark() require
        # it, and under UTC the two are value-identical (r2 verdict #1)
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        spark.conf.set("spark.sql.timestampType", "TIMESTAMP_LTZ")
        return fn(spark, sf_dir)

    wrapped.__name__ = getattr(fn, "__name__", "query")
    wrapped.__doc__ = fn.__doc__
    return wrapped


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}

# Sweep order matters: the driver verifies the FIRST 50 registry entries
# per round (the cap observed in r1-r4). Rotation is MECHANICAL from
# round 5 on: the registry is split into two groups, each ≤ 50 queries,
# and the group that leads alternates with round parity — so every
# registry entry holds a driver row at most 2 rounds old BY
# CONSTRUCTION, regardless of registry growth (up to 100 queries).
#
#   group A (50): relational2 14 + cdc 21 + text 11 + layout 1 +
#                 sketches2 2 + quality 1 — swept when _ROUND is odd.
#   group B (50): vector 12 + streaming 14 + sketches 5 + corpus 4 +
#                 curation 9 + relational 6 — swept when _ROUND is
#                 even. (r9 state: 100 total — BOTH groups at the 50
#                 cap; additions must fold into a family or displace a
#                 named key per the registry-at-cap policy in ROADMAP.)
# tests/test_registry_rotation.py asserts both groups stay ≤ 50 so
# these counts can never silently drift past the sweep cap.
# New queries join the group whose lead round comes next (keeps their
# first driver row ≤1 round away) as long as that group stays ≤ 50.
#
# Within group A, `grouping_analytics` and `orders_priority_profile`
# stay pinned at positions 1-2 (the only 2 of 85 queries with no driver
# row through r4 — r4 VERDICT item 1). The trailing group still fills
# the remaining sweep slots (50 − |lead|), giving its head a bonus
# refresh. Bump _ROUND once per driver round when rotating.
_ROUND = 14
_GROUP_A = (relational2, cdc, text, layout, sketches2, quality)
_GROUP_B = (vector, streaming, sketches, corpus, curation, relational)
_ORDERED = _GROUP_A + _GROUP_B if _ROUND % 2 == 1 else _GROUP_B + _GROUP_A
for mod in _ORDERED:
    QUERIES.update({name: _pinned(fn) for name, fn in mod.QUERIES.items()})
    ORACLE.update(mod.ORACLE)
