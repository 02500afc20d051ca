"""Temporal (point-in-time) join: each fact row matches the dimension
VERSION that was valid at the fact's own position — Flink's temporal
table join (`FOR SYSTEM_TIME AS OF fact.t`) over an SCD2 history
(operators/scd2.py), and the per-row generalization of
``Scd2Table.as_of`` (which reads the whole table at ONE position).

Spark has no native as-of/temporal join, and the naive formulation is
a non-equi range join (key equal, valid_from ≤ p < valid_to) that
degenerates to a per-key cartesian between facts and versions. The
scalable shape — same trick as the registry's as-of join
(queries/streaming.py: union-tag + running last) — is ONE shuffle+sort:

1. tag version rows at t = valid_from carrying the version payload as
   a struct; tag fact rows at t = fact position with a null payload;
2. sort per key by (t, is_fact) — versions sort before facts at the
   same instant, making valid_from INCLUSIVE;
3. the running ``last(version, ignorenulls)`` hands every fact the
   newest version at or before it — O(n log n) distributed sort, no
   pair blowup, whole-stage-codegen window;
4. validate the candidate's valid_to (deletes leave gaps in the
   history: a fact probing past a delete must match NOTHING, which the
   running-last alone would get wrong).

Positions are vectors (the engine's logical clock is
(pos_file, pos_offset) — model/positions.py); ordering and validity
use struct comparisons exactly like ``Scd2Table.as_of``.

NOTE: position structs compare pos_file as a STRING, which matches the
oracle mirrors and is correct while the binlog suffix width is constant;
a history spanning a rotation-suffix WIDENING (binlog.999999 →
binlog.1000000, see collapse.order_exprs) would need a length field in
the struct — normalize file names (or renumber positions) upstream if a
production history crosses that boundary. Like the sort paths
(collapse/scd2/routing), the comparison structs here prefix ``pos_file``
with a LENGTH field, so (length, string) ordering keeps as-of semantics
and sort semantics in agreement across a suffix widening.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def temporal_join(
    facts: DataFrame,
    history: DataFrame,
    key_cols: list[str],
    pos_cols: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join each fact to its as-of version.

    ``history`` is an SCD2 table shaped like ``scd2_history`` output:
    key + payload + ``valid_from_<c>``/``valid_to_<c>`` per position
    column (valid_to null on open versions). ``facts`` carries
    key_cols + pos_cols + any payload. Output: every fact column plus
    the matched version's columns; ``how="inner"`` drops facts with no
    valid version (before the key existed, or probing past a delete),
    ``how="left"`` keeps them with nulls.
    """
    if how not in ("inner", "left"):
        raise ValueError("how must be 'inner' or 'left'")
    vfrom = [f"valid_from_{c}" for c in pos_cols]
    payload = [c for c in history.columns if c not in key_cols]
    ver_struct = F.struct(*payload)

    def _pos_struct(srcs: list, alias_prefix: str = "") -> F.Column:
        # Widening-safe position struct: pos_file compares as
        # (length, value) — same convention as collapse.order_exprs.
        fields = []
        for src, c in zip(srcs, pos_cols):
            name = f"{alias_prefix}{c}"
            if c == "pos_file":
                fields.append(F.length(F.col(src)).alias(f"_len_{name}"))
            fields.append(F.col(src).alias(name))
        return F.struct(*fields)

    h = history.select(
        *key_cols,
        _pos_struct(vfrom).alias("_t"),
        ver_struct.alias("_ver"),
        F.lit(0).alias("_is_fact"),
    )
    fact_payload = [c for c in facts.columns if c not in key_cols]
    f_ = facts.select(
        *key_cols,
        _pos_struct(list(pos_cols)).alias("_t"),
        F.lit(None).cast(h.schema["_ver"].dataType).alias("_ver"),
        F.lit(1).alias("_is_fact"),
        F.struct(*fact_payload).alias("_fact"),
    )
    h = h.withColumn("_fact", F.lit(None).cast(f_.schema["_fact"].dataType))

    w = (
        Window.partitionBy(*key_cols)
        .orderBy("_t", "_is_fact")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = (
        h.unionByName(f_)
        .withColumn("_cand", F.last("_ver", ignorenulls=True).over(w))
        .filter(F.col("_is_fact") == 1)
    )
    # validity: candidate exists and its valid_to is open or after the
    # fact position (struct-compare with aligned field names)
    def _vto_struct(col_of) -> F.Column:
        fields = []
        for c in pos_cols:
            name = f"valid_to_{c}"
            if c == "pos_file":
                fields.append(F.length(col_of(c)).alias(f"_len_{name}"))
            fields.append(col_of(c).alias(name))
        return F.struct(*fields)

    pos_as_vto = _vto_struct(lambda c: F.col(f"_t.{c}"))
    cand_vto = _vto_struct(lambda c: F.col(f"_cand.valid_to_{c}"))
    open_version = F.col(f"_cand.valid_to_{pos_cols[0]}").isNull()
    is_valid = F.col("_cand").isNotNull() & (open_version | (pos_as_vto < cand_vto))

    out = matched.withColumn(
        "_cand", F.when(is_valid, F.col("_cand"))  # null out stale candidates
    )
    if how == "inner":
        out = out.filter(F.col("_cand").isNotNull())
    return out.select(
        *key_cols,
        *[F.col(f"_t.{c}").alias(c) for c in pos_cols],
        *[F.col(f"_fact.{c}").alias(c) for c in fact_payload if c not in pos_cols],
        *[F.col(f"_cand.{c}").alias(c) for c in payload],
    )
