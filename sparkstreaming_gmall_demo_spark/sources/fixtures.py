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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..session import ensure_runtime_confs
from ..schemas import FIXTURE_TABLES


def load_table(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Load one fixture table, normalizing timestamp encodings."""
    ensure_runtime_confs(spark)
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{table}.parquet")
    # Any nanos-long timestamp column (events.ts today) -> TimestampType.
    # Integer division keeps full precision; truncation toward zero
    # matches DuckDB's nanos->micros read behavior for positive epochs.
    if table == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        df = df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
    return df


def register_views(spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = FIXTURE_TABLES) -> None:
    """Register every fixture table as a temp view for spark.sql use."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
