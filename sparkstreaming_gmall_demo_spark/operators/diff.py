"""Corpus snapshot diff — the dataset-versioning primitive a 100 TB
training pipeline needs between refreshes: given two snapshots of a
keyed table (two txn-table versions via ``streaming.txn.snapshot``, or
any two DataFrames), classify every key as added / removed / changed /
unchanged without ever comparing full payloads across the wire.

Design for scale: each side first collapses to (key, fingerprint) —
a narrow map (md5 over the compared columns) — so the full-outer join
shuffles 2×16-byte digests per row, never document text. The reference
has no versioned storage at all (its Phoenix/Redis sinks overwrite in
place, gmall2021-realtime/../DauApp.scala sink path); this operator +
streaming/txn.py time travel is the Spark-first upgrade of that
surface.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Unit separator: cannot appear in the fixture text columns, so
# concat_ws cannot alias ("ab","c") with ("a","bc").
_SEP = "\x1f"


def row_fingerprint(compare_cols: Sequence[str]) -> Column:
    """md5 over the compared columns, null-safe: NULL encodes as the
    empty string WITH its separator kept, so ("a", NULL) != ("a",) and
    column order is significant. Oracle form:
    ``md5(concat_ws(chr(31), coalesce(CAST(c AS VARCHAR), '') ...))``."""
    parts = [F.coalesce(F.col(c).cast("string"), F.lit("")) for c in compare_cols]
    return F.md5(F.concat_ws(_SEP, *parts))


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str,
    compare_cols: Sequence[str],
    include_unchanged: bool = False,
) -> DataFrame:
    """(key, change, old_fp, new_fp) for every key in either snapshot.

    change ∈ {'added', 'removed', 'changed', 'unchanged'} — unchanged
    rows are dropped by default (at 100 TB the diff output should be
    proportional to the churn, not to the corpus).
    """
    o = old.select(F.col(key), row_fingerprint(compare_cols).alias("old_fp"))
    n = new.select(F.col(key), row_fingerprint(compare_cols).alias("new_fp"))
    j = o.join(n, key, "full_outer")
    change = (
        F.when(F.col("old_fp").isNull(), F.lit("added"))
        .when(F.col("new_fp").isNull(), F.lit("removed"))
        .when(F.col("old_fp") != F.col("new_fp"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = j.select(F.col(key), change.alias("change"), "old_fp", "new_fp")
    if not include_unchanged:
        out = out.filter(F.col("change") != "unchanged")
    return out


def diff_summary(diff: DataFrame) -> DataFrame:
    """Churn roll-up: one row per change kind. The input is already
    digest-sized, so this is a bounded agg over at most 4 groups."""
    return diff.groupBy("change").agg(F.count("*").alias("n")).orderBy("change")
