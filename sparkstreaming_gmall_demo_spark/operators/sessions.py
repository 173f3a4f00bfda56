"""Batch gap-based sessionization — the offline twin of
``streaming/stateful.py:sessionize`` (same semantics: per key, events
within ``gap_seconds`` of the previous event share a session).

Where the streaming form needs ``applyInPandasWithState`` (session
extent depends on data, so no fixed window works — SURVEY §2.7), the
batch form is pure built-ins: a lag() to mark session starts and a
running sum to number them. Both window functions share one window
spec (partition by key, order by ts), so Catalyst plans a SINGLE
shuffle + sort and evaluates the whole thing in one pass — no Python,
no second exchange.

Scale: one hash partition on the key, one sort per partition. Skewed
keys (one device with millions of events) serialize within their
partition like any windowed computation; the events-per-key bound in a
day of clickstream keeps this safe, and AQE skew splitting does not
apply to windows — if a key genuinely exceeds a partition, split the
key by day first (sessions never span the grain you split on if the
gap is below it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import epoch_micros


def sessionize_batch(
    df: DataFrame,
    key: str,
    ts_col: str,
    gap_seconds: int,
    tiebreak: str | None = None,
) -> DataFrame:
    """Assign a per-key session id (1-based, in time order) to every
    row. A row starts a new session when it is the key's first event
    or arrives strictly more than ``gap_seconds`` after the previous
    one (microsecond-exact comparison — second-truncated epochs would
    misjudge sub-second gaps at the boundary).

    ``tiebreak`` orders same-instant events deterministically (use the
    record PK); required for an engine-portable session numbering.
    """
    order = [F.col(ts_col).asc()] + ([F.col(tiebreak).asc()] if tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order)
    ep = epoch_micros(ts_col)
    is_new = (
        F.when(
            ep - F.lag(ep).over(w) > F.lit(gap_seconds * 1_000_000), 1
        )
        .otherwise(0)
        # lag is NULL on the key's first row -> when() yields 0; fix to 1
    )
    first_fix = F.when(F.lag(ep).over(w).isNull(), 1).otherwise(is_new)
    return df.withColumn(
        "session_id",
        F.sum(first_fix).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )


def session_stats(
    df: DataFrame,
    key: str,
    ts_col: str,
    gap_seconds: int,
    tiebreak: str | None = None,
) -> DataFrame:
    """One row per (key, session): start/end timestamps and event
    count. Two aggregations on top of ``sessionize_batch`` but still a
    single shuffle: the groupBy key (key, session_id) is a prefix
    extension of the window partitioning, so the hash aggregate reuses
    the existing distribution."""
    return (
        sessionize_batch(df, key, ts_col, gap_seconds, tiebreak)
        .groupBy(key, "session_id")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count("*").alias("n_events"),
        )
    )
