"""Batch fixture reader for the driver parquet tables.

Handles the one genuinely awkward ingestion detail: ``events.parquet``
stores TIMESTAMP(NANOS), which Spark 4.x rejects by default. With
``spark.sql.legacy.parquet.nanosAsLong=true`` the column arrives as a
nanos-since-epoch long; we convert with integer division (``ts DIV
1000`` -> micros) -- NOT float division, which loses precision at 1e18
magnitudes -- and ``timestamp_micros``.

Scan hygiene at 100 TB: this reader adds no projection/filter of its
own, so Catalyst pushes query-level filters and column pruning straight
into the parquet scan (verify with ``.explain``: PushedFilters /
ReadSchema). Nothing here materializes or collects.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..session import ensure_runtime_confs
from ..schemas import FIXTURE_TABLES

_DAY_NANOS = 86_400 * 10**9


def load_table(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Load one fixture table, normalizing timestamp encodings."""
    ensure_runtime_confs(spark)
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{table}.parquet")
    # Any nanos-long timestamp column (events.ts today) -> TimestampType.
    # Integer division keeps full precision; truncation toward zero
    # matches DuckDB's nanos->micros read behavior for positive epochs.
    # The raw long survives as ts_nanos: predicates on the CONVERTED
    # column cannot reach the parquet scan (Catalyst won't invert
    # timestamp_micros through a filter), but a range predicate on the
    # raw long pushes down to row-group statistics — see
    # events_date_filter. At 100 TB that's the difference between
    # skipping a year of row groups and decoding them.
    if table == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        df = df.withColumn("ts_nanos", F.col("ts")).withColumn(
            "ts", F.expr("timestamp_micros(ts DIV 1000)")
        )
    return df


def events_date_filter(df: DataFrame, date: str) -> Column:
    """Day-equality predicate on events that reaches the parquet scan.

    When the raw nanos long is available, the UTC day becomes a long
    range filter (PushedFilters: GreaterThanOrEqual/LessThan on
    ts_nanos) — exactly equivalent to ``to_date(ts) = date`` under the
    UTC session timezone, but row-group-skippable. Falls back to the
    timestamp expression for sources without the raw column.
    """
    if "ts_nanos" in df.columns:
        day = _dt.datetime.fromisoformat(date).replace(tzinfo=_dt.timezone.utc)
        start = int(day.timestamp()) * 10**9
        return (F.col("ts_nanos") >= F.lit(start)) & (
            F.col("ts_nanos") < F.lit(start + _DAY_NANOS)
        )
    return F.to_date("ts") == F.lit(date).cast("date")


def register_views(spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = FIXTURE_TABLES) -> None:
    """Register every fixture table as a temp view for spark.sql use."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
