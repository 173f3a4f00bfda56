"""Kafka option-contract tests (S1/K6).

No broker or spark-sql-kafka connector exists in this container, so the
Kafka reader/writer can't run end-to-end; every pipeline test rides the
file-topic twin instead. These tests pin the CONSTRUCTION contract —
the exact option maps and the value-deserialization projection — against
the reference's consumer/producer configuration
(gmall-realtime/utils/MyKafkaUtil.scala:26-53,
gamll-canal/utils/MyKafkaSender.java:14-32), so a regression in option
plumbing surfaces here rather than on first contact with a real broker:

- bootstrap.servers rides the ``kafka.``-prefixed passthrough namespace
- ConsumerStrategies.Subscribe(topic)     -> ``subscribe``
- auto.offset.reset=latest                -> ``startingOffsets=latest``
- String(De)serializer                    -> cast(value AS STRING)
- enable.auto.commit (reference: true)    -> replaced by the query
  checkpoint (exactly-once); the sink must therefore always set
  ``checkpointLocation``
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.readwriter import DataStreamWriter

from sparkstreaming_gmall_demo_spark.streaming import sinks, sources


class _RecordingReader:
    """Stands in for spark.readStream: records format/options, hands a
    static DataFrame with the Kafka wire schema to ``load`` so the
    post-source projection is exercised on realistic columns."""

    def __init__(self, wire_df):
        self._wire = wire_df
        self.fmt = None
        self.options = {}

    def format(self, fmt):
        self.fmt = fmt
        return self

    def option(self, k, v):
        self.options[k] = v
        return self

    def load(self, *a, **kw):
        return self._wire


def _kafka_wire_df(spark):
    # the Kafka source's fixed output schema (key/value are BINARY —
    # the StringDeserializer equivalence lives in the engine-side cast)
    return spark.createDataFrame(
        [
            (
                bytearray(b"m1"),
                bytearray('{"mid": "m1", "ts": 1}'.encode("utf8")),
                "gmall_startup",
                0,
                42,
            )
        ],
        "key binary, value binary, topic string, partition int, offset long",
    )


def test_kafka_reader_option_contract(spark, monkeypatch):
    rec = _RecordingReader(_kafka_wire_df(spark))
    monkeypatch.setattr(SparkSession, "readStream", property(lambda self: rec))
    out = sources.kafka_topic_stream(
        spark, "b1:9092,b2:9092", "gmall_startup", starting_offsets="earliest"
    )
    assert rec.fmt == "kafka"
    assert rec.options == {
        # MyKafkaUtil.scala:28 bootstrap.servers -> prefixed passthrough
        "kafka.bootstrap.servers": "b1:9092,b2:9092",
        # ConsumerStrategies.Subscribe (MyKafkaUtil.scala:49-51)
        "subscribe": "gmall_startup",
        "startingOffsets": "earliest",
    }
    # StringDeserializer analog: exactly one STRING `value` column with
    # the utf-8 decoded payload (MyKafkaUtil.scala:29-31)
    assert out.columns == ["value"]
    assert out.schema["value"].dataType.simpleString() == "string"
    assert out.collect()[0].value == '{"mid": "m1", "ts": 1}'


def test_kafka_reader_defaults_to_latest(spark, monkeypatch):
    """auto.offset.reset=latest (MyKafkaUtil.scala:33-34) is the
    default starting position."""
    rec = _RecordingReader(_kafka_wire_df(spark))
    monkeypatch.setattr(SparkSession, "readStream", property(lambda self: rec))
    sources.kafka_topic_stream(spark, "b1:9092", "gmall_event")
    assert rec.options["startingOffsets"] == "latest"


def test_kafka_sink_option_contract(spark, monkeypatch, tmp_path):
    calls = {"fmt": None, "options": {}}
    orig_format = DataStreamWriter.format
    orig_option = DataStreamWriter.option

    def rec_format(self, fmt):
        calls["fmt"] = fmt
        return orig_format(self, fmt)

    def rec_option(self, k, v):
        calls["options"][k] = v
        return orig_option(self, k, v)

    monkeypatch.setattr(DataStreamWriter, "format", rec_format)
    monkeypatch.setattr(DataStreamWriter, "option", rec_option)

    stream = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", "1")
        .load()
        .select(F.col("value").cast("string").alias("value"))
    )
    ckpt = str(tmp_path / "ckpt")
    writer = sinks.kafka_sink(stream, "b1:9092,b2:9092", "gmall_out", ckpt)
    assert writer is not None
    assert calls["fmt"] == "kafka"
    assert calls["options"] == {
        # MyKafkaSender.java:15 bootstrap.servers -> prefixed passthrough
        "kafka.bootstrap.servers": "b1:9092,b2:9092",
        # ProducerRecord(topic, msg) (MyKafkaSender.java:31)
        "topic": "gmall_out",
        # replaces the reference's fire-and-forget/auto-commit posture
        "checkpointLocation": ckpt,
    }


def test_kafka_sink_preserves_key_column_as_string(spark, monkeypatch):
    """Keyed produce: when the frame carries a `key` column it rides
    along, string-serialized like the value (partition affinity for
    e.g. order_id). The reference's send(topic, msg) is keyless, so
    key must be optional — pinned by the sibling test, which shows a
    keyless frame projects value only."""
    captured = {}
    orig_format = DataStreamWriter.format

    def rec_format(self, fmt):
        captured["df_schema"] = self._df.schema
        return orig_format(self, fmt)

    monkeypatch.setattr(DataStreamWriter, "format", rec_format)
    stream = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", "1")
        .load()
        .select(
            F.col("value").alias("key"),  # LONG: the sink must cast
            F.col("value"),
        )
    )
    sinks.kafka_sink(stream, "b:9092", "t", "/tmp/ck")
    fields = {f.name: f.dataType.simpleString() for f in captured["df_schema"].fields}
    assert fields == {"key": "string", "value": "string"}


BROKER = os.environ.get("SPARK_GRAFT_KAFKA_BROKER")


@pytest.mark.skipif(
    not BROKER,
    reason="no Kafka broker/connector in this container "
    "(set SPARK_GRAFT_KAFKA_BROKER=host:port to enable)",
)
def test_kafka_writer_reader_roundtrip_e2e(spark, tmp_path):
    """Broker-gated wire round-trip: produce through kafka_sink's
    option surface, consume through kafka_topic_stream, payloads must
    survive byte-for-byte (StringSerializer both ways)."""
    import uuid

    topic = f"gmall_e2e_{uuid.uuid4().hex[:8]}"
    payloads = ['{"mid": "m1", "ts": 1}', '{"mid": "m2", "ts": 2}']
    src = spark.createDataFrame([(p,) for p in payloads], ["value"])
    # batch produce via the same option surface the streaming sink pins
    (
        src.select(F.col("value").cast("string"))
        .write.format("kafka")
        .option("kafka.bootstrap.servers", BROKER)
        .option("topic", topic)
        .save()
    )
    got = (
        sources.kafka_topic_stream(spark, BROKER, topic, starting_offsets="earliest")
        .writeStream.format("memory")
        .queryName("kafka_e2e")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    got.awaitTermination()
    rows = {r.value for r in spark.sql("SELECT * FROM kafka_e2e").collect()}
    assert rows == set(payloads)


def test_kafka_sink_serializes_value_as_string(spark, monkeypatch):
    """StringSerializer analog: whatever column type arrives, the sink
    projects a single STRING `value` column (MyKafkaSender.java:16-17).
    Captured from the DataFrame the writer is built over."""
    captured = {}
    orig_format = DataStreamWriter.format

    def rec_format(self, fmt):
        captured["df_schema"] = self._df.schema
        return orig_format(self, fmt)

    monkeypatch.setattr(DataStreamWriter, "format", rec_format)
    stream = spark.readStream.format("rate").option("rowsPerSecond", "1").load()
    # rate source: value is LONG — the sink must cast, not forward
    sinks.kafka_sink(stream, "b:9092", "t", "/tmp/ck")
    fields = {f.name: f.dataType.simpleString() for f in captured["df_schema"].fields}
    assert fields == {"value": "string"}
