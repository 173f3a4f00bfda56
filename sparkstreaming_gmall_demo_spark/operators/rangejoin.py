"""Range (interval) join: pairs of rows whose timestamps fall within a
bounded gap, keyed by an equality column.

Not in the reference (SURVEY §2.5 notes range joins absent), but it is
the temporal-correlation primitive an event pipeline needs (session
stitching, attribution windows, co-occurrence mining) — and the naive
formulation ``JOIN ON key AND r.ts BETWEEN l.ts AND l.ts + gap`` is a
trap at scale: Spark plans inequality-only conditions as a nested-loop
join, and even with the key equality the per-key work is quadratic in
the key's row count.

Scale strategy — bucketize the time axis: assign every row to a
``gap``-wide epoch bucket; a qualifying pair is then ALWAYS in the
same or adjacent buckets, so the join becomes an equi-join on
(key, bucket) with each left row probing exactly two buckets, followed
by the exact gap filter. Shuffle keys are (key, bucket) — time spreads
hot keys across partitions, so a heavy user degrades gracefully
instead of concentrating in one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import epoch_micros


def interval_self_pairs(
    df: DataFrame,
    key: str,
    ts_col: str,
    gap_seconds: int,
    payload_cols: list | None = None,
) -> DataFrame:
    """All ordered pairs (a, b) of rows sharing ``key`` with
    ``0 < ts_b - ts_a <= gap_seconds`` (strictly-later b, so each
    unordered pair appears once and same-instant pairs are excluded).

    Output: key, a_ts, b_ts + ``a_<c>``/``b_<c>`` for payload columns.
    """
    payload_cols = payload_cols or []
    reserved = {"k", "ts", "ep", "bucket", "rk", "rb", "jb", "a_ts", "b_ts"}
    clash = reserved & set(payload_cols)
    if clash:
        raise ValueError(
            f"payload_cols {sorted(clash)} collide with the operator's "
            f"internal aliases; rename them before the join"
        )
    # microsecond epoch: the gap compare must be exact at full
    # timestamp precision (unix_timestamp would truncate to seconds)
    gap_us = gap_seconds * 1_000_000
    epoch = epoch_micros(ts_col)
    base = df.select(
        F.col(key).alias("k"),
        F.col(ts_col).alias("ts"),
        epoch.alias("ep"),
        F.floor(epoch / gap_us).alias("bucket"),
        *[F.col(c) for c in payload_cols],
    )
    left = base.select(
        F.col("k"),
        F.col("ts").alias("a_ts"),
        F.col("ep").alias("a_ep"),
        F.explode(F.array(F.col("bucket"), F.col("bucket") + 1)).alias("jb"),
        *[F.col(c).alias(f"a_{c}") for c in payload_cols],
    )
    right = base.select(
        F.col("k").alias("rk"),
        F.col("ts").alias("b_ts"),
        F.col("ep").alias("b_ep"),
        F.col("bucket").alias("rb"),
        *[F.col(c).alias(f"b_{c}") for c in payload_cols],
    )
    return (
        left.join(right, (F.col("k") == F.col("rk")) & (F.col("jb") == F.col("rb")))
        .filter(
            (F.col("b_ep") > F.col("a_ep"))
            & (F.col("b_ep") <= F.col("a_ep") + gap_us)
        )
        .select(
            F.col("k").alias(key),
            "a_ts",
            "b_ts",
            *[f"a_{c}" for c in payload_cols],
            *[f"b_{c}" for c in payload_cols],
        )
    )
