"""Multimodal plumbing: binary payload column, metadata struct, and the
Arrow-batched mapInPandas decode stage (stubbed codec)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparkstreaming_gmall_demo_spark.operators import multimodal as mm
from sparkstreaming_gmall_demo_spark.sources.fixtures import load_table


def test_payload_matches_text_bytes(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    wp = mm.attach_payload(docs)
    bad = wp.filter(F.col("meta.n_bytes") != F.octet_length(F.encode("text", "UTF-8")))
    assert bad.count() == 0
    assert dict(wp.dtypes)["payload"] == "binary"


def test_decode_stub_row_count_and_schema(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    decoded = mm.decode_image_stub(mm.attach_payload(docs))
    assert decoded.count() == docs.count()
    assert decoded.schema == mm.DECODED_SCHEMA
    # deterministic fake: same input -> same output
    one = decoded.orderBy("doc_id").limit(3).collect()
    two = mm.decode_image_stub(mm.attach_payload(docs)).orderBy("doc_id").limit(3).collect()
    assert one == two


def test_decode_stub_strict_raises(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(2)
    with pytest.raises(Exception) as exc:
        mm.decode_image_stub(mm.attach_payload(docs), strict=True).collect()
    assert "NotImplementedError" in str(exc.value) or "codec" in str(exc.value)


def test_resize_stub_fit_inside(spark, sf_dir):
    from sparkstreaming_gmall_demo_spark.operators import multimodal as mm
    docs = load_table(spark, sf_dir, "documents").limit(50)
    decoded = mm.decode_image_stub(mm.attach_payload(docs))
    resized = mm.resize_stub(decoded, 64, 64).collect()
    assert len(resized) == 50
    for r in resized:
        assert 1 <= r.resized_width <= 64 and 1 <= r.resized_height <= 64
        # fit-inside: the limiting dimension reaches the target within
        # integer truncation (floor can lose one pixel)
        if max(r.width, r.height) >= 64:
            assert 63 <= max(r.resized_width, r.resized_height) <= 64


def test_frame_sample_fanout_counts(spark, sf_dir):
    from sparkstreaming_gmall_demo_spark.operators import multimodal as mm
    docs = load_table(spark, sf_dir, "documents").limit(50)
    with_payload = mm.attach_payload(docs)
    frames = mm.frame_sample_stub(with_payload, every_k=4)
    got = frames.groupBy("doc_id").count().collect()
    # expected: ceil(n_frames / 4) per doc, n_frames = n_bytes % 16 + 1
    want = {
        r.doc_id: -(-(r.n_bytes % 16 + 1) // 4)
        for r in with_payload.select("doc_id", F.col("meta.n_bytes").alias("n_bytes")).collect()
    }
    assert {r.doc_id: r["count"] for r in got} == want
    # frame payloads are deterministic slices
    one = frames.orderBy("doc_id", "frame_idx").first()
    again = mm.frame_sample_stub(with_payload, every_k=4).orderBy("doc_id", "frame_idx").first()
    assert one == again


# ---------------------------------------------------------------------------
# byte-shingle payload near-dup (codec-free fuzzy hashing)
# ---------------------------------------------------------------------------
def test_payload_neardup_finds_exact_binary_copies(spark):
    from sparkstreaming_gmall_demo_spark.operators import multimodal as mm

    rows = [
        (1, bytearray(range(256)) * 4),
        (2, bytearray(range(256)) * 4),          # exact copy of 1
        (3, bytes(reversed(bytearray(range(256)) * 4))),  # different
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    pairs = {(r.i, r.j): r.jaccard
             for r in mm.payload_near_duplicates(df, threshold=0.8,
                                                 id_col="doc_id").collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0
    assert all(k == (1, 2) for k in pairs)


def test_payload_neardup_localized_edit_stays_above_threshold(spark):
    from sparkstreaming_gmall_demo_spark.operators import multimodal as mm

    base = bytes(range(256)) * 8  # 2 KiB
    edited = bytearray(base)
    edited[100:104] = b"\xff\xff\xff\xff"  # 4-byte local edit
    df = spark.createDataFrame(
        [(1, base), (2, bytes(edited))], "doc_id long, payload binary"
    )
    pairs = mm.payload_near_duplicates(df, threshold=0.8).collect()
    assert len(pairs) == 1 and pairs[0].jaccard >= 0.95


def test_payload_neardup_unrelated_blobs_not_paired(spark):
    from sparkstreaming_gmall_demo_spark.operators import multimodal as mm

    import hashlib

    def blob(seed: int) -> bytes:
        out = b""
        for i in range(64):
            out += hashlib.md5(f"{seed}-{i}".encode()).digest()
        return out

    df = spark.createDataFrame(
        [(i, blob(i)) for i in range(6)], "doc_id long, payload binary"
    )
    assert mm.payload_near_duplicates(df, threshold=0.5).count() == 0


def test_payload_shingle_hashes_short_payload(spark):
    from sparkstreaming_gmall_demo_spark.operators import multimodal as mm

    df = spark.createDataFrame([(1, b"abc")], "doc_id long, payload binary")
    rows = mm.payload_shingle_hashes(df, n_bytes=8, stride=4).collect()
    assert len(rows) == 1 and len(rows[0].hs) == 1  # one clamped window
