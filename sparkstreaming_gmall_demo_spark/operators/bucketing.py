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


def compact_to_bucketed(
    spark: SparkSession,
    src_path: str,
    table: str,
    key: str,
    buckets: int = 8,
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Day-close compaction: republish a streaming-append serving table
    (one small file per micro-batch per partition) as a single bucketed
    layout.

    This is the Spark analog of HBase major compaction behind the
    reference's Phoenix serving tables (app/DauApp.scala:56-63 upserts
    accumulate HFiles; compaction rewrites them sorted by rowkey). At
    100 TB the streaming sink's file count, not its byte count, is what
    kills serving scans — and the rewrite also buys hash-distribution
    on ``key`` so every later equi-join/anti-join on it skips the
    sink-side shuffle.
    """
    write_bucketed(spark.read.parquet(src_path), table, key, buckets, path, sort)


def idempotent_append_bucketed(
    batch_df: DataFrame,
    table: str,
    key: str,
    buckets: int = 8,
    path: str | None = None,
) -> None:
    """Bucketed variant of ``sinks.idempotent_append`` for sinks with a
    single high-cardinality key and no date partitioning (the
    sale_detail table: keyed ``sale_detail_id``, reference ES doc-id
    upsert at SaleDetailApp.scala:162-173).

    The plain sink's replay guard left-anti joins each batch against
    the FULL sink keyset — on an unpartitioned table that shuffles the
    entire accumulated sink every micro-batch, the one cost in this
    engine that grows without bound. Keeping the sink bucketed on the
    dedup key makes the probe scan hash-distributed already: only the
    (small) batch side shuffles, sink-side Exchange is gone from the
    plan (tests/test_bucketing.py pins this).
    """
    spark = batch_df.sparkSession
    batch = batch_df.dropDuplicates([key])
    if spark.catalog.tableExists(table):
        batch = batch.join(spark.table(table).select(key), on=key, how="left_anti")
        batch.write.format("parquet").bucketBy(buckets, key).sortBy(key).mode(
            "append"
        ).saveAsTable(table)
    else:
        write_bucketed(batch, table, key, buckets, path)
