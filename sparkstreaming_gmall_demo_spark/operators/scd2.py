"""SCD2 (slowly-changing-dimension, type 2) history: turn a stream of
keyed observations into validity-interval versions.

The reference keeps dimensions last-write-wins only (UserInfoApp ->
Redis KV; our streaming/sinks.py:merge_last_write_wins reproduces it,
with tombstones). LWW answers "what is the value NOW"; an analytics
engine also needs "what was the value WHEN THE FACT HAPPENED" — the
classic warehouse SCD2 pattern, which composes with the as-of join
(operators/asof.py) for point-in-time-correct enrichment.

Plan shape: ONE hash partition on the key and one sort per partition
serve both windows (change detection via lag, interval close via
lead) — Catalyst plans a single Exchange and reuses the sort, so the
whole history build is one shuffle regardless of version counts. No
state, no iteration: history is a pure function of the observation
set, so replays and backfills are idempotent by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    observations: DataFrame,
    key: str,
    ts_col: str,
    attr_cols: list[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """Collapse per-key observations into change versions:
    one row per (key, run of equal attrs), with ``valid_from`` = first
    observation of the run and ``valid_to`` = next version's
    valid_from (NULL for the current version — the half-open interval
    convention, so ``valid_from <= t < valid_to`` partitions time).

    ``tiebreak`` orders same-instant observations deterministically
    (use the source PK); required for engine-portable version
    boundaries.
    """
    order = [F.col(ts_col).asc()] + ([F.col(tiebreak).asc()] if tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order)
    attrs = F.struct(*[F.col(c) for c in attr_cols])
    marked = observations.withColumn(
        "_changed",
        F.lag(attrs).over(w).isNull() | (F.lag(attrs).over(w) != attrs),
    ).filter(F.col("_changed"))
    w2 = Window.partitionBy(key).orderBy(*order)
    return (
        marked.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(ts_col).over(w2))
        .select(key, *attr_cols, "valid_from", "valid_to")
    )


def asof_lookup(
    history: DataFrame,
    facts: DataFrame,
    key: str,
    ts_col: str,
) -> DataFrame:
    """Point-in-time enrichment: each fact row joined to the history
    version valid at its timestamp (``valid_from <= ts < valid_to``,
    current version open-ended). Equi-join on the key plus the
    interval predicate — for a dimension, the history side is small
    enough to broadcast, so this stays a broadcast hash join with a
    residual range filter, never a nested loop over facts."""
    h = F.broadcast(history.withColumnRenamed(key, "_hk"))
    return facts.join(
        h,
        (facts[key] == h["_hk"])
        & (h["valid_from"] <= facts[ts_col])
        & (h["valid_to"].isNull() | (facts[ts_col] < h["valid_to"])),
        "left",
    ).drop("_hk")
