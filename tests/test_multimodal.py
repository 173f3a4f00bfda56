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
