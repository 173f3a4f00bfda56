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


def _broker_roundtrip(spark, tmp_path):
    """Broker wire round-trip: produce through kafka_sink's option
    surface, consume through kafka_topic_stream, payloads must survive
    byte-for-byte (StringSerializer both ways)."""
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


def test_kafka_ingest_e2e_or_recorded_frames(spark, tmp_path, monkeypatch):
    """The formerly-skipped e2e slot, converted to an environment
    contract that always runs (VERDICT r10 item 5). With a broker
    (SPARK_GRAFT_KAFKA_BROKER) it runs the real wire round-trip.
    Without one it (a) PROVES the connector is genuinely absent — if a
    spark-sql-kafka jar ever appears on the classpath this test fails,
    demanding the e2e be wired up instead of silently testing less —
    and (b) drives kafka_topic_stream's real projection over RECORDED
    RecordBatch v2 frames decoded by the stdlib wire codec
    (streaming/kafka_wire.py): CRC-verified batch parse -> connector
    row shape -> cast(value AS STRING) -> parse_topic, the exact path
    a live topic takes after load()."""
    from pyspark.sql import types as T

    from sparkstreaming_gmall_demo_spark.streaming import kafka_wire as kw

    if BROKER:
        _broker_roundtrip(spark, tmp_path)
        return
    # (a) environment drift check: the connector must actually be
    # missing for the recorded-frame path to be the right test
    try:
        (
            spark.read.format("kafka")
            .option("kafka.bootstrap.servers", "localhost:1")
            .option("subscribe", "t")
            .load()
        )
        pytest.fail(
            "spark-sql-kafka connector IS on the classpath — set "
            "SPARK_GRAFT_KAFKA_BROKER and run the real e2e instead of "
            "the recorded-frame contract"
        )
    except Exception as exc:  # noqa: BLE001
        assert "kafka" in str(exc).lower(), exc
    # (b) recorded frames: what the reference's StringSerializer
    # producer hands the broker for two startup-log micro-batches
    payloads = [
        b'{"mid": "m1", "uid": "u1", "ts": 1704067200000}',
        b'{"mid": "m2", "uid": "u2", "ts": 1704067201000}',
        b'{"mid": "m3", "uid": "u1", "ts": 1704067202000}',
    ]
    frames = [
        kw.encode_record_batch(
            [(None, payloads[0]), (b"m2", payloads[1])],
            base_offset=40,
            base_timestamp=1704067200000,
        ),
        kw.encode_record_batch(
            [(b"m3", payloads[2])], base_offset=42, base_timestamp=1704067202000
        ),
    ]
    rows = kw.wire_rows_from_batches(frames, "gmall_startup")
    assert [r[4] for r in rows] == [40, 41, 42]  # offsets splice across frames
    wire = spark.createDataFrame(
        [
            (
                bytearray(k) if k is not None else None,
                bytearray(v),
                topic,
                part,
                off,
            )
            for k, v, topic, part, off, ts, tt in rows
        ],
        "key binary, value binary, topic string, partition int, offset long",
    )
    rec = _RecordingReader(wire)
    monkeypatch.setattr(SparkSession, "readStream", property(lambda self: rec))
    out = sources.kafka_topic_stream(
        spark, "recorded:9092", "gmall_startup", starting_offsets="earliest"
    )
    assert rec.fmt == "kafka" and rec.options["subscribe"] == "gmall_startup"
    parsed = sources.parse_topic(
        out,
        T.StructType(
            [
                T.StructField("mid", T.StringType()),
                T.StructField("uid", T.StringType()),
                T.StructField("ts", T.LongType()),
            ]
        ),
    )
    got = {(r.mid, r.uid) for r in parsed.collect()}
    assert got == {("m1", "u1"), ("m2", "u2"), ("m3", "u1")}


# ---------------------------------------------------------------------------
# The RecordBatch v2 codec itself, spec-pinned (the PNG-codec testing
# discipline: public check values + hand-assembled bytes break the
# encode/parse symmetry)


def test_crc32c_matches_public_check_value():
    from sparkstreaming_gmall_demo_spark.streaming import kafka_wire as kw

    assert kw.crc32c(b"123456789") == 0xE3069283  # Castagnoli check
    assert kw.crc32c(b"") == 0


def test_record_batch_encoder_matches_hand_assembled_spec_bytes():
    """One record, null key, 12-byte value: every byte of the frame
    derived by hand from the public KIP-98 layout."""
    import struct

    from sparkstreaming_gmall_demo_spark.streaming import kafka_wire as kw

    value = b'{"mid":"m1"}'
    frame = kw.encode_record_batch([(None, value)], base_offset=5, base_timestamp=1000)
    # record: attrs 0x00, tsDelta vint(0)=0x00, offDelta vint(0)=0x00,
    # keyLen vint(-1)=0x01 (zigzag), valLen vint(12)=0x18, value,
    # headers vint(0)=0x00  -> body of 18 bytes, framed by vint(18)=0x24
    body = b"\x00\x00\x00\x01\x18" + value + b"\x00"
    records = bytes([len(body) << 1]) + body
    after_crc = (
        struct.pack(">hiqqqhii", 0, 0, 1000, 1000, -1, -1, -1, 1) + records
    )
    expected = (
        struct.pack(
            ">qiibI", 5, 4 + 1 + 4 + len(after_crc), 0, 2, kw.crc32c(after_crc)
        )
        + after_crc
    )
    assert frame == expected


def test_record_batch_parse_guards():
    """Torn frames, foreign magic, and compressed batches must raise,
    never decode silently."""
    import struct

    from sparkstreaming_gmall_demo_spark.streaming import kafka_wire as kw

    frame = kw.encode_record_batch([(b"k", b"v")], base_offset=0)
    # round-trip sanity
    parsed = kw.parse_record_batch(frame)
    assert parsed["records"] == [(0, 0, b"k", b"v")]
    # torn tail
    torn = bytearray(frame)
    torn[-1] ^= 0xFF
    with pytest.raises(ValueError, match="CRC mismatch"):
        kw.parse_record_batch(bytes(torn))
    # magic v1
    old = bytearray(frame)
    old[16] = 1
    with pytest.raises(ValueError, match="magic"):
        kw.parse_record_batch(bytes(old))
    # gzip attribute bit set (attributes live right after the crc; the
    # crc must be recomputed or the crc guard fires first)
    comp = bytearray(frame)
    comp[22] |= 0x01  # attributes low byte (21 = 8+4+4+1+4+2nd of int16)
    body = bytes(comp[21:])
    comp[17:21] = struct.pack(">I", kw.crc32c(body))
    with pytest.raises(ValueError, match="compressed"):
        kw.parse_record_batch(bytes(comp))


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


def test_record_batch_round_trips_exhaustive_shape_sweep():
    """Deterministic record-shape sweep: null/empty/unicode/large
    keys and values, record counts crossing the varint multi-byte
    boundary, multi-frame offset splicing — parse(encode(x)) == x for
    every shape (the test_properties.py sweep discipline)."""
    import hashlib

    from sparkstreaming_gmall_demo_spark.streaming import kafka_wire as kw

    def blob(tag, n):
        seed = hashlib.sha256(tag.encode()).digest()
        return (seed * (n // len(seed) + 1))[:n]

    shapes = [
        [(None, b"")],                      # empty (not null) value
        [(b"", None)],                      # null value, empty key
        [(None, None)],                     # both null
        [(b"k", "café 中文".encode())],  # unicode payload
        [(blob("k", 1), blob("v", 200))],   # value len needs 2-byte varint
        [(None, blob("big", 5_000))],       # multi-KB value
        [(blob(f"k{i}", i % 7), blob(f"v{i}", (i * 13) % 300)) for i in range(40)],
    ]
    base_off = 0
    frames = []
    expected = []
    for recs in shapes:
        frames.append(
            kw.encode_record_batch(recs, base_offset=base_off, base_timestamp=1000)
        )
        for i, (k, v) in enumerate(recs):
            expected.append((base_off + i, 1000 + i, k, v))
        base_off += len(recs)
    got = []
    for f in frames:
        got.extend(kw.parse_record_batch(f)["records"])
    assert got == expected
    # wire-row splice preserves cross-frame offset order
    rows = kw.wire_rows_from_batches(frames, "t")
    assert [r[4] for r in rows] == list(range(base_off))
