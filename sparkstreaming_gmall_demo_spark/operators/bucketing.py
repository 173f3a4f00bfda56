"""Bucketed serving tables: co-located joins without a shuffle.

At 100 TB the dominant cost of the serving-side joins (orders x
lineitem, sale_detail x anything keyed the same way) is re-shuffling
both fact tables on every query. Writing them bucketed on the join key
moves that shuffle to write time, once: readers see a hash-distributed
layout and the planner elides BOTH exchanges (and, with sorted
buckets, the sort) from subsequent joins on that key.

This is the parquet/catalog analog of the reference's HBase rowkey
design — Phoenix tables are "bucketed" by rowkey prefix so point
queries never scan — generalized to any equi-join key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 8,
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) table on
    ``key``. ``path`` makes it an external table (tests); production
    uses the warehouse location. Bucket count should divide evenly
    into cluster cores and keep buckets near the target file size
    (128-512 MB) at the expected table volume."""
    writer = df.write.format("parquet").bucketBy(buckets, key)
    if sort:
        writer = writer.sortBy(key)
    if path is not None:
        writer = writer.option("path", path)
    writer.mode("overwrite").saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  key: str, how: str = "inner") -> DataFrame:
    """Join two same-bucketed tables on their bucket key. With equal
    bucket counts the physical plan has no Exchange on either side —
    verify with .explain (tests/test_bucketing.py pins this)."""
    return spark.table(left_table).join(spark.table(right_table), key, how)
