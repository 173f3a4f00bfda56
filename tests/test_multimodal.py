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
