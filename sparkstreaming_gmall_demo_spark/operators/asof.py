"""As-of (point-in-time) join: for each left row, the single latest
right row at or before the left row's time, per key.

Not in the reference (SURVEY §2.5 notes as-of absent) and not a Spark
built-in — but it is THE lookup pattern a CDC dimension history needs
("which version of the user row was current when this event
happened?", the temporal generalization of the reference's Redis
dim-cache GET at SaleDetailApp.scala:142-157), and a training-data
staple (label joins, feature freshness).

Physical strategy — union-tag + running last(), not a join:
both sides are tagged and unioned, sorted once on (key, time, side),
and a running ``last(payload, ignorenulls=True)`` window carries the
most recent right payload forward onto each left row. ONE shuffle+sort
total; no join, so a hot key degrades into a bigger sort partition —
never the per-key quadratic blowup of the naive
``JOIN ON key AND r.ts <= l.ts`` + max() formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

ASOF_TS = "_asof_ts"  # matched right-side timestamp in the output


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str | list,
    left_ts: str = "ts",
    right_ts: str = "ts",
    payload_cols: list | None = None,
    strict: bool = False,
    tolerance: str | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Enrich ``left`` with the latest ``right`` row per ``key`` whose
    ``right_ts`` <= ``left_ts`` (``strict``: strictly earlier).

    Output = all left columns + ``prefix + c`` for each payload column
    + ``prefix + "ts"`` (the matched right timestamp); all-null when
    no right row qualifies (left rows are always kept).

    ``tolerance`` (e.g. ``"30 days"``) voids matches older than
    ``left_ts - tolerance`` — the as-of analog of the reference's
    TTL-bounded join buffer (SaleDetailApp.scala:93,131).

    Ties: several right rows at the same qualifying timestamp resolve
    to the greatest payload struct (deterministic, engine-independent).
    Null keys group together, like SQL window partitioning.
    """
    keys = [key] if isinstance(key, str) else list(key)
    payload_cols = payload_cols or []
    # side order decides visibility at ts ties: non-strict sorts right
    # rows first (same-instant versions visible), strict sorts them
    # after the left row (invisible to it)
    l_ord, r_ord = (0, 1) if strict else (1, 0)

    l = left.select(
        *[F.col(k).alias(f"_k{i}") for i, k in enumerate(keys)],
        F.col(left_ts).alias("_t"),
        F.lit(l_ord).alias("_o"),
        F.struct(*left.columns).alias("_l"),
    )
    r = right.select(
        *[F.col(k).alias(f"_k{i}") for i, k in enumerate(keys)],
        F.col(right_ts).alias("_t"),
        F.lit(r_ord).alias("_o"),
        F.struct(
            F.col(right_ts).alias(ASOF_TS),
            *[F.col(c) for c in payload_cols],
        ).alias("_p"),
    )
    u = l.unionByName(r, allowMissingColumns=True)

    w = (
        Window.partitionBy(*[f"_k{i}" for i in range(len(keys))])
        .orderBy(F.asc("_t"), F.asc("_o"), F.asc("_p"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn("_m", F.last("_p", ignorenulls=True).over(w)).filter(
        F.col("_l").isNotNull()
    )
    if tolerance is not None:
        matched = matched.withColumn(
            "_m",
            F.when(
                F.col(f"_m.{ASOF_TS}") >= F.col("_t") - F.expr(f"INTERVAL {tolerance}"),
                F.col("_m"),
            ),
        )
    return matched.select(
        F.col("_l.*"),
        *[F.col(f"_m.{c}").alias(prefix + c) for c in payload_cols],
        F.col(f"_m.{ASOF_TS}").alias(prefix + "ts"),
    )
