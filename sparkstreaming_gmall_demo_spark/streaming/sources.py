"""Streaming sources: JSON topic streams.

The reference consumes one JSON-string-per-record Kafka topics through
a shared direct-stream helper (reference utils/MyKafkaUtil.scala:26-53,
topics in gmall-common constants/GmallConstants.java:6-21) and parses
each record with fastjson inside mapPartitions (reference
app/DauApp.scala:30-39 and the other four apps).

Here a "topic" is any streaming DataFrame of a single string column
``value`` — produced either by the Kafka source (production) or by a
file source over JSON-lines chunk files (tests / replay). Parsing is
declarative ``from_json`` with a fixed per-topic schema (SURVEY §1.3):
unknown JSON fields are dropped, unparseable records keep a
``_corrupt`` column instead of being silently lost (the reference's
fastjson parse would throw and kill the batch).

Scale: from_json runs JVM-side inside WholeStageCodegen — no Python in
the parse path; the Kafka source is receiver-less and offset-tracked
via checkpoint (exactly-once, unlike the reference's auto-commit
at-most/at-least-once posture, MyKafkaUtil.scala:34-37).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def kafka_topic_stream(
    spark: SparkSession,
    brokers: str,
    topic: str,
    starting_offsets: str = "latest",
) -> DataFrame:
    """Raw Kafka topic -> one-string-column stream (production path).

    Mirrors reference utils/MyKafkaUtil.scala:26-53 (direct stream,
    string deserialization); offset tracking moves from Kafka
    auto-commit to the query checkpoint.

    Requires the spark-sql-kafka connector on the classpath; not
    exercisable in this container (no Kafka), covered by the file
    source below which yields the identical ``value`` contract.
    """
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
        .select(F.col("value").cast("string").alias("value"))
    )


def file_topic_stream(spark: SparkSession, path: str) -> DataFrame:
    """JSON-lines files under ``path`` -> one-string-column stream.

    The replayable test/backfill source: dropping chunk files into the
    directory simulates Kafka batches; the file-source log provides the
    same no-reprocessing guarantee as checkpointed offsets.
    """
    return spark.readStream.format("text").load(path).select(
        F.col("value").cast("string").alias("value")
    )


def parse_topic(raw: DataFrame, schema: T.StructType, ts_from_millis: str | None = "ts") -> DataFrame:
    """JSON ``value`` column -> typed columns (operator P1).

    ``ts_from_millis`` names an epoch-millis LongType field to surface
    as an ``event_ts`` TimestampType column (the reference derives
    date/hour strings from it, app/DauApp.scala:34-35); pass None for
    topics without one.

    Unparseable records: PERMISSIVE mode with a corrupt-record column —
    bad rows arrive with ``_corrupt`` = raw text so sinks can route
    them to a dead-letter table (the reference would throw and kill
    the micro-batch).
    """
    with_corrupt = T.StructType(
        schema.fields + [T.StructField("_corrupt", T.StringType())]
    )
    parsed = raw.select(
        F.from_json(
            "value",
            with_corrupt,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"},
        ).alias("r")
    ).select("r.*")
    if ts_from_millis is not None and ts_from_millis in schema.fieldNames():
        parsed = parsed.withColumn(
            "event_ts", F.timestamp_millis(F.col(ts_from_millis))
        )
    return parsed


def drop_corrupt(df: DataFrame) -> DataFrame:
    """Remove corrupt-parse rows (and the marker column). Pipelines
    whose sinks don't quarantine call this BEFORE stateful stages so
    all-null ghost rows never enter aggregation state or join keys."""
    if "_corrupt" not in df.columns:
        return df
    return df.filter(F.col("_corrupt").isNull()).drop("_corrupt")
