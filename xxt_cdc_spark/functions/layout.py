"""Z-order (Morton) data layout: multi-dimensional clustering so that
selective filters on ANY of the clustered columns prune files and
parquet row groups, not just the single leading sort column.

Why this is a first-class 100 TB operator: at scale the dominant cost
of a selective query is the scan, and the scan's cost is set by DATA
LAYOUT, not by the plan — a table linearly sorted on `a` answers
`a BETWEEN …` by reading a sliver but `b BETWEEN …` by reading
everything. Interleaving the bits of the clustered columns (the Morton
curve) keeps rows that are close in ANY dimension close on disk, so
min/max footer stats make every file/row-group a candidate for skipping
on every clustered dimension (each 1-D selectivity s prunes to roughly
s^(1/d) of the files instead of 1). This is the layout step behind
Delta/Iceberg's ``OPTIMIZE ZORDER BY`` — here expressed as plain
DataFrame ops: bin → interleave (bitwise expressions, whole-stage
codegen) → ``repartitionByRange`` on the z-value → sorted parquet.

Everything runs JVM-side: binning is `width_bucket`-style arithmetic,
the interleave is a fixed unrolled series of shift/or terms (bits ×
columns ≤ 64 terms), the range partitioning is Spark's own sampled
range exchange. No UDFs.

The reference has no storage-layout surface (its sinks stream rows to
OLTP targets); this belongs to the analytics/lake surface the Spark
engine adds alongside the MOR store.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interleave_bits(cols: list[Column], bits: int = 16) -> Column:
    """Morton-interleave ``bits`` low bits of each (non-negative int)
    column: result bit ``i*len(cols)+j`` = bit ``i`` of ``cols[j]``.
    ``bits * len(cols)`` must fit in a signed 64-bit long (≤ 63)."""
    n = len(cols)
    if n < 2:
        raise ValueError("interleave_bits needs >= 2 columns")
    if bits * n > 63:
        raise ValueError(f"bits*cols = {bits * n} > 63 overflows a long")
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cols):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1)), i * n + j)
            )
    return z


def _linear_bin_expr(c: Column, lo: float, hi: float, bits: int) -> Column:
    """Scale a numeric column into [0, 2^bits) integer bins by min/max
    linear scaling. Cheap (no quantile pass) but WRONG under skew: a
    heavy-tailed column packs most rows into few bins, the equal-row
    range partitions then split almost entirely by the other dimensions,
    and pruning on this one collapses (measured: 81% file overlap for a
    10%-mass predicate on the events value column). Offered as the
    ``binning="linear"`` option for uniform columns only."""
    buckets = (1 << bits) - 1
    if hi <= lo:
        return F.lit(0).cast("long")
    scaled = (c.cast("double") - F.lit(float(lo))) / F.lit(float(hi - lo)) * buckets
    return F.least(F.greatest(F.round(scaled).cast("long"), F.lit(0)), F.lit(buckets))


def _quantile_bin_expr(c: Column, boundaries: list[float]) -> Column:
    """Rank-based bin: the number of quantile boundaries ≤ value,
    built as a BALANCED comparison tree (depth log2(bins), all
    literals, whole-stage codegen) — the expression form of Delta's
    ``range_partition_id`` sampling. Equal row mass per bin by
    construction, so the z-curve's cells carry comparable weight no
    matter how skewed the column."""

    def tree(bounds: list[float], lo_bin: int) -> Column:
        if not bounds:
            return F.lit(lo_bin).cast("long")
        mid = len(bounds) // 2
        return (
            F.when(c < F.lit(bounds[mid]), tree(bounds[:mid], lo_bin))
            .otherwise(tree(bounds[mid + 1 :], lo_bin + mid + 1))
        )

    # NULLs bin to 0 EXPLICITLY: inside the tree a NULL comparison
    # makes every when() fall through to otherwise(), landing at the
    # deepest non-null leaf — i.e. nulls would silently cluster with
    # the MAX values and the trailing coalesce would never fire
    # (r5 ADVICE item 4). SQL sorts NULLS FIRST; bin 0 matches.
    return F.when(c.isNull(), F.lit(0).cast("long")).otherwise(tree(boundaries, 0))


def zorder_write(
    df: DataFrame,
    cols: list[str],
    path: str,
    num_files: int = 16,
    bins: int = 256,
    binning: str = "quantile",
) -> dict:
    """Rewrite ``df`` as z-ordered parquet at ``path``.

    One stats pass over the clustered columns (approxQuantile
    boundaries — Greenwald-Khanna, O(rows), driver holds only
    ``bins`` floats per column), one range shuffle on the z-value,
    one write — O(rows) end to end, no data rows on the driver.
    ``num_files`` sets the range-partition count (≈ files); at 100 TB
    this is files-per-partition of an outer partitioning (date,
    tenant), exactly like OPTIMIZE's per-partition clustering.

    ``binning="quantile"`` (default) is rank-based — equal row mass
    per bin, skew-proof (see _quantile_bin_expr); ``"linear"`` is the
    min/max scaling for known-uniform columns (one cheaper stats agg).

    Returns per-column binning stats: quantile boundary lists, or
    (min, max) tuples under linear.
    """
    bits = max(1, (bins - 1).bit_length())
    eff_bits = min(bits, 63 // len(cols))  # what the interleave can carry
    if binning == "quantile":
        n_bounds = (1 << eff_bits) - 1
        probs = [i / (n_bounds + 1) for i in range(1, n_bounds + 1)]
        quantiles = df.stat.approxQuantile(
            [c for c in cols], probs, 1.0 / (4 * (n_bounds + 1))
        )
        stats = {c: q for c, q in zip(cols, quantiles)}
        binned = [_quantile_bin_expr(F.col(c), stats[c]) for c in cols]
    elif binning == "linear":
        stats_row = df.agg(
            *[F.min(c).cast("double").alias(f"{c}_min") for c in cols],
            *[F.max(c).cast("double").alias(f"{c}_max") for c in cols],
        ).collect()[0]
        stats = {c: (stats_row[f"{c}_min"], stats_row[f"{c}_max"]) for c in cols}
        binned = [
            _linear_bin_expr(F.col(c), stats[c][0], stats[c][1], eff_bits) for c in cols
        ]
    else:
        raise ValueError(f"unknown binning {binning!r}")
    z = interleave_bits(binned, bits=eff_bits)
    (
        df.withColumn("_z", z)
        .repartitionByRange(num_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
    return stats


def file_overlap_fraction(path: str, col: str, lo: float, hi: float) -> float:
    """Fraction of parquet files whose [min, max] footer range for
    ``col`` overlaps [lo, hi] — the share of the table a selective scan
    must read under this layout (Spark's scan applies the same skip at
    row-group granularity via the pushed filter). Driver-side metadata
    read: O(files) footers, no data pages."""
    import glob
    import os

    import pyarrow.parquet as pq

    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    if not files:
        raise ValueError(f"no parquet files under {path}")
    overlapping = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        fmin, fmax = None, None
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}[col]
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                fmin, fmax = float("-inf"), float("inf")
                break
            fmin = st.min if fmin is None else min(fmin, st.min)
            fmax = st.max if fmax is None else max(fmax, st.max)
        if fmax >= lo and fmin <= hi:
            overlapping += 1
    return overlapping / len(files)
