"""Kafka RecordBatch v2 wire format, stdlib-only (spec-pinned).

Why this exists: the reference ingests through a real Kafka consumer
(gmall-realtime/src/main/scala/com/atguigu/utils/MyKafkaUtil.scala:26-53)
and produces through a real producer
(gamll-canal/src/main/java/com/atguigu/utils/MyKafkaSender.java:14-32),
but this container has neither a broker nor the spark-sql-kafka
connector jar, and nothing may be fetched. The suite therefore pins the
ingest surface in three layers:

1. option-contract tests (tests/test_kafka_contract.py): the exact
   reader/writer option maps the connector would receive;
2. THIS module: the byte-level RecordBatch v2 codec from the public
   Kafka protocol spec (KIP-98 format: batch header + varint-framed
   records + CRC-32C integrity), so the suite can decode RECORDED wire
   frames into the connector's output row shape without a broker —
   the environment-contract test feeds those rows through the same
   ``cast(value AS STRING) -> parse_topic`` projection the live source
   uses (streaming/sources.py:kafka_topic_stream);
3. the broker-gated e2e round-trip, which upgrades automatically when
   SPARK_GRAFT_KAFKA_BROKER points at a real broker.

The codec is deliberately symmetrical (encode for building fixture
frames, parse for consuming them) and the tests break the symmetry the
same way the PNG codec tests do: CRC-32C is pinned to the public
Castagnoli check value and the encoder's bytes are pinned to a
hand-assembled spec literal, so a shared encode/parse bug cannot hide
behind a round-trip.

Scope (the honest boundary): magic=2 batches, no compression, no
transactional/control records — exactly what the reference's
StringSerializer producer emits. Compressed or older-magic batches
raise ValueError.
"""

from __future__ import annotations

import struct

# ---------------------------------------------------------------------------
# CRC-32C (Castagnoli, reflected polynomial 0x82F63B78) — Kafka checks
# batch integrity with crc32c, which the stdlib does not provide.
# ---------------------------------------------------------------------------

_CRC32C_TABLE = []
for _n in range(256):
    _c = _n
    for _ in range(8):
        _c = (_c >> 1) ^ 0x82F63B78 if _c & 1 else _c >> 1
    _CRC32C_TABLE.append(_c)


def crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    for b in data:
        crc = (crc >> 8) ^ _CRC32C_TABLE[(crc ^ b) & 0xFF]
    return crc ^ 0xFFFFFFFF


# ---------------------------------------------------------------------------
# Zigzag varints (record-level framing)
# ---------------------------------------------------------------------------


def _encode_varint(n: int) -> bytes:
    z = (n << 1) ^ (n >> 63)  # zigzag, 64-bit
    z &= 0xFFFFFFFFFFFFFFFF
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _decode_varint(data: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    z = 0
    while True:
        b = data[pos]
        pos += 1
        z |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
        if shift > 63:
            raise ValueError("varint overruns 64 bits")
    n = (z >> 1) ^ -(z & 1)  # un-zigzag
    return n, pos


# ---------------------------------------------------------------------------
# RecordBatch v2
# ---------------------------------------------------------------------------

_CRC_COVER_OFFSET = 8 + 4 + 4 + 1 + 4  # crc covers bytes AFTER the crc field


def encode_record_batch(
    records: list[tuple[bytes | None, bytes | None]],
    base_offset: int = 0,
    base_timestamp: int = 0,
    partition_leader_epoch: int = 0,
) -> bytes:
    """A magic=2, uncompressed RecordBatch over (key, value) pairs —
    the frame a StringSerializer producer hands the broker. Timestamps
    are base_timestamp + index (CreateTime semantics)."""
    if not records:
        raise ValueError("a RecordBatch carries at least one record")
    body = bytearray()
    for i, (key, value) in enumerate(records):
        rec = bytearray()
        rec.append(0)  # record attributes (unused)
        rec += _encode_varint(i)  # timestampDelta
        rec += _encode_varint(i)  # offsetDelta
        if key is None:
            rec += _encode_varint(-1)
        else:
            rec += _encode_varint(len(key))
            rec += key
        if value is None:
            rec += _encode_varint(-1)
        else:
            rec += _encode_varint(len(value))
            rec += value
        rec += _encode_varint(0)  # header count
        body += _encode_varint(len(rec))
        body += rec
    n = len(records)
    after_crc = (
        struct.pack(
            ">hiqqqhii",
            0,  # attributes: no compression, CreateTime, not transactional
            n - 1,  # lastOffsetDelta
            base_timestamp,
            base_timestamp + n - 1,
            -1,  # producerId (idempotence off — the reference's config)
            -1,  # producerEpoch
            -1,  # baseSequence
            n,
        )
        + bytes(body)
    )
    batch_len = 4 + 1 + 4 + len(after_crc)  # pLE + magic + crc + rest
    return (
        struct.pack(
            ">qiibI",
            base_offset,
            batch_len,
            partition_leader_epoch,
            2,  # magic
            crc32c(after_crc),
        )
        + after_crc
    )


def parse_record_batch(data: bytes) -> dict:
    """Decode one RecordBatch v2: header fields + [(offset, timestamp,
    key, value)] with the CRC-32C verified over exactly the bytes the
    spec covers. Raises ValueError on magic != 2, compression, or a
    CRC mismatch (a torn frame must never decode silently)."""
    (
        base_offset,
        batch_len,
        p_leader_epoch,
        magic,
        crc,
    ) = struct.unpack(">qiibI", data[:_CRC_COVER_OFFSET])
    if magic != 2:
        raise ValueError(f"unsupported RecordBatch magic {magic}: only v2")
    after_crc = data[_CRC_COVER_OFFSET : 8 + 4 + batch_len]
    actual = crc32c(after_crc)
    if actual != crc:
        raise ValueError(
            f"RecordBatch CRC mismatch: stored {crc:#x}, computed {actual:#x}"
        )
    (
        attributes,
        last_offset_delta,
        base_timestamp,
        max_timestamp,
        producer_id,
        producer_epoch,
        base_sequence,
        record_count,
    ) = struct.unpack(">hiqqqhii", after_crc[:40])
    if attributes & 0x07:
        raise ValueError(
            f"compressed RecordBatch (codec {attributes & 0x07}) unsupported"
        )
    records = []
    pos = 40  # past the fixed >hiqqqhii header
    buf = after_crc
    for _ in range(record_count):
        rec_len, pos = _decode_varint(buf, pos)
        end = pos + rec_len
        pos += 1  # record attributes (unused)
        ts_delta, pos = _decode_varint(buf, pos)
        off_delta, pos = _decode_varint(buf, pos)
        key_len, pos = _decode_varint(buf, pos)
        key = None
        if key_len >= 0:
            key = bytes(buf[pos : pos + key_len])
            pos += key_len
        val_len, pos = _decode_varint(buf, pos)
        value = None
        if val_len >= 0:
            value = bytes(buf[pos : pos + val_len])
            pos += val_len
        n_headers, pos = _decode_varint(buf, pos)
        for _h in range(n_headers):
            hk_len, pos = _decode_varint(buf, pos)
            pos += max(hk_len, 0)
            hv_len, pos = _decode_varint(buf, pos)
            pos += max(hv_len, 0)
        if pos != end:
            raise ValueError("record framing mismatch (varint lengths)")
        records.append(
            (base_offset + off_delta, base_timestamp + ts_delta, key, value)
        )
    return {
        "base_offset": base_offset,
        "partition_leader_epoch": p_leader_epoch,
        "last_offset_delta": last_offset_delta,
        "max_timestamp": max_timestamp,
        "producer_id": producer_id,
        "producer_epoch": producer_epoch,
        "base_sequence": base_sequence,
        "records": records,
    }


def wire_rows_from_batches(
    batches: list[bytes], topic: str, partition: int = 0
) -> list[tuple]:
    """Flatten recorded RecordBatch frames into the spark-sql-kafka
    source's fixed row shape: (key binary, value binary, topic,
    partition, offset, timestamp, timestampType) — what ``load()`` on a
    real broker returns and what kafka_topic_stream's projection
    consumes. timestampType=0 is CreateTime (the batches above)."""
    rows = []
    for frame in batches:
        parsed = parse_record_batch(frame)
        for offset, ts, key, value in parsed["records"]:
            rows.append((key, value, topic, partition, offset, ts, 0))
    return rows
