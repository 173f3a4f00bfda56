"""Z-order (Morton) clustering: a write layout under which parquet
min/max statistics prune multi-dimensional predicates.

A date-partitioned, ts-sorted table skips beautifully on time but not
at all on a second column: every file spans the full user range, so a
``user_id = X AND ts BETWEEN ..`` scan reads every file of the day.
Interleaving the bits of both dimensions' quantile ranks and laying
files out in z-value ranges makes every file a small axis-aligned box
in (user, time) space — the same reason Delta/Iceberg expose OPTIMIZE
ZORDER (public design; re-derived here on plain parquet).

Scale shape (100 TB): quantile cuts come from ONE approx_percentile
aggregate (mergeable sketch, map-side) collected as a ~2^bits-element
broadcast literal — never a global sort/ntile, which would funnel the
table through one partition. Bucketing is a JVM-side filter-count over
the cuts array per row; the final ``repartitionByRange(z)`` is the
one unavoidable shuffle any clustering rewrite pays.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interleave_bits(a_col: str, b_col: str, bits: int) -> Column:
    """Morton code of two ``bits``-wide non-negative int COLUMNS (by
    name): bit i of ``a_col`` lands at position 2i, bit i of ``b_col``
    at 2i+1. A SQL fold — the DataFrame ``shiftleft`` helper only
    accepts literal shift amounts, the SQL expression form shifts by
    the loop variable."""
    return F.expr(
        f"aggregate(sequence(0, {bits - 1}), CAST(0 AS BIGINT), (acc, i) -> "
        f"acc | shiftleft(shiftright({a_col}, i) & 1, 2*i) "
        f"    | shiftleft(shiftright({b_col}, i) & 1, 2*i + 1))"
    )


def quantile_cuts(df: DataFrame, col: str, bits: int) -> list[float]:
    """2^bits - 1 approximate quantile boundaries for ``col`` (numeric
    or castable): the skew-robust normalization (equal-POPULATION
    buckets, like Delta's range ids — a linear min/max scale would
    collapse under skew)."""
    n = (1 << bits) - 1
    fracs = [i / (n + 1) for i in range(1, n + 1)]
    row = df.agg(
        F.percentile_approx(F.col(col).cast("double"), fracs, 10_000).alias("c")
    ).collect()[0]  # collect-bound: 1-row agg
    return list(row["c"])


def bucket_by_cuts(col, cuts: list[float]) -> Column:
    """Rank of ``col`` against the broadcast cuts literal: the number
    of boundaries <= x (0..len(cuts)). A per-row filter-count over a
    few hundred doubles, whole-stage-codegen'd."""
    c = (F.col(col) if isinstance(col, str) else col).cast("double")
    arr = F.array(*[F.lit(float(x)) for x in cuts])
    return F.size(F.filter(arr, lambda cut: cut <= c)).cast("long")


def zorder_value(
    df: DataFrame, col_a: str, col_b: str, bits: int = 8
) -> DataFrame:
    """Append the z-value column ``_z`` for (col_a, col_b)."""
    cuts_a = quantile_cuts(df, col_a, bits)
    cuts_b = quantile_cuts(df, col_b, bits)
    return (
        df.withColumn("_ba", bucket_by_cuts(col_a, cuts_a))
        .withColumn("_bb", bucket_by_cuts(col_b, cuts_b))
        .withColumn("_z", interleave_bits("_ba", "_bb", bits))
        .drop("_ba", "_bb")
    )


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int,
    bits: int = 8,
) -> None:
    """Rewrite ``df`` as ``n_files`` parquet files laid out in z-value
    ranges: each file covers a contiguous z-range = a small box in
    (col_a, col_b) space, so BOTH columns' footer min/max stats are
    narrow and either predicate prunes files. The maintenance-rewrite
    analog of OPTIMIZE ZORDER; run it like compaction, off the write
    path."""
    (
        zorder_value(df, col_a, col_b, bits)
        .repartitionByRange(n_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
