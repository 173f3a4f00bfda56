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


# ---------------------------------------------------------------------------
# Round-11: the real stdlib PNG codec behind decode_image
# (VERDICT r10 item 6)


def test_encode_png_filter_bytes_match_spec():
    """Pin the ENCODER to the PNG spec with hand-computed filtered
    scanlines (so a symmetric encoder/decoder bug can't hide behind
    the round-trip): 2x5 RGB, rows filtered with types 0..4."""
    import struct
    import zlib

    from sparkstreaming_gmall_demo_spark.operators import multimodal as mm

    rgb = bytes(range(10, 10 + 2 * 5 * 3))  # rows of 6 bytes, values 10..39
    png = mm.encode_png(2, 5, rgb)
    assert png[:8] == mm.PNG_MAGIC
    # IHDR: 2x5, depth 8, color type 2 (RGB), no interlace
    assert struct.unpack(">IIBBBBB", png[16:29]) == (2, 5, 8, 2, 0, 0, 0)
    (idat_len,) = struct.unpack(">I", png[33:37])
    raw = zlib.decompress(png[41 : 41 + idat_len])
    rows = [raw[i * 7 : (i + 1) * 7] for i in range(5)]
    # row 0 filter None: bytes pass through
    assert rows[0] == bytes([0, 10, 11, 12, 13, 14, 15])
    # row 1 Sub: first pixel raw, second minus first (all deltas 3)
    assert rows[1] == bytes([1, 16, 17, 18, 3, 3, 3])
    # row 2 Up: minus row 1 recon (all deltas 6)
    assert rows[2] == bytes([2] + [6] * 6)
    # row 3 Average (row=[28..33], prior recon=[22..27]):
    #   x<3: raw - prior//2          -> 28-11, 29-11, 30-12 = 17,18,18
    #   x>=3: raw - (left+prior)//2  -> 31-26, 32-27, 33-28 = 5,5,5
    assert rows[3] == bytes([3, 17, 18, 18, 5, 5, 5])
    # row 4 Paeth (row=[34..39], prior recon=[28..33]):
    #   x<3: a=c=0, p=b -> pb=0 wins, predictor=b=prior -> 34-28=6 ...
    #   x>=3: p=a+b-c, pa=|b-c|=3 smallest -> predictor=a=left -> 3 ...
    assert rows[4] == bytes([4, 6, 6, 6, 3, 3, 3])


def test_decode_png_round_trips_all_filter_types():
    from binascii import crc32

    from sparkstreaming_gmall_demo_spark.operators import multimodal as mm

    for (w, h) in [(1, 1), (7, 5), (33, 9), (16, 16)]:
        rgb = bytes((x * 7 + 13) % 256 for x in range(w * h * 3))
        w2, h2, rgb2 = mm.decode_png(mm.encode_png(w, h, rgb))
        assert (w2, h2) == (w, h)
        assert rgb2 == rgb
        assert crc32(rgb2) == crc32(rgb)


def test_decode_png_rejects_unsupported_variants():
    import pytest as _pytest

    from sparkstreaming_gmall_demo_spark.operators import multimodal as mm

    with _pytest.raises(ValueError, match="not a PNG"):
        mm.decode_png(b"JFIF not a png")
    # corrupt a filter-type byte into an invalid value: decode must
    # fail loudly, never emit silently-wrong pixels
    import struct
    import zlib

    rgb = bytes(range(2 * 2 * 3))
    png = mm.encode_png(2, 2, rgb)
    (idat_len,) = struct.unpack(">I", png[33:37])
    raw = bytearray(zlib.decompress(png[41 : 41 + idat_len]))
    raw[0] = 9  # invalid filter type
    body = zlib.compress(bytes(raw), 6)
    bad = png[:33] + mm._png_chunk(b"IDAT", body) + png[41 + idat_len + 4 :]
    with _pytest.raises(ValueError, match="filter type"):
        mm.decode_png(bad)


def test_decode_image_dispatches_png_vs_stub(spark):
    from binascii import crc32

    from sparkstreaming_gmall_demo_spark.operators import multimodal as mm

    rgb = bytes((x * 3 + 1) % 256 for x in range(6 * 4 * 3))
    png = mm.encode_png(6, 4, rgb)
    frame = spark.createDataFrame(
        [
            (1, bytearray(png), ("image", len(png), "planted")),
            (2, bytearray(b"plain text bytes"), ("audio", 16, "books")),
        ],
        "doc_id long, payload binary, "
        "meta struct<modality:string,n_bytes:bigint,source:string>",
    )
    rows = {r.doc_id: r for r in mm.decode_image(frame).collect()}
    assert rows[1].codec == "png"
    assert (rows[1].width, rows[1].height, rows[1].n_frames) == (6, 4, 1)
    assert rows[1].pixel_crc32 == (crc32(rgb) & 0xFFFFFFFF)
    assert rows[2].codec == "stub"
    assert rows[2].pixel_crc32 is None
    assert rows[2].width == 16 % 640 + 1  # documented fake-decode shape


def test_decode_image_strict_still_raises_for_non_png(spark):
    import pytest as _pytest

    from sparkstreaming_gmall_demo_spark.operators import multimodal as mm

    frame = spark.createDataFrame(
        [(2, bytearray(b"plain text"), ("audio", 10, "books"))],
        "doc_id long, payload binary, "
        "meta struct<modality:string,n_bytes:bigint,source:string>",
    )
    with _pytest.raises(Exception, match="codec"):
        mm.decode_image(frame, strict=True).collect()


def test_png_codec_round_trips_exhaustive_shape_sweep():
    """Deterministic shape x content sweep (the test_properties.py
    discipline): every (width, height) across degenerate and odd
    geometries — single pixel, single row/column (no left neighbor for
    Sub/Average/Paeth), widths around filter-cycle boundaries — with
    seeded pseudo-random pixels. Exact pixel equality after the
    five-filter encode."""
    import hashlib

    from sparkstreaming_gmall_demo_spark.operators import multimodal as mm

    shapes = [
        (1, 1), (1, 7), (7, 1), (2, 2), (3, 5), (5, 3),
        (1, 64), (64, 1), (17, 13), (31, 2), (2, 31), (40, 11),
    ]
    for w, h in shapes:
        seed = hashlib.sha256(f"{w}x{h}".encode()).digest()
        rgb = (seed * (w * h * 3 // len(seed) + 1))[: w * h * 3]
        w2, h2, rgb2 = mm.decode_png(mm.encode_png(w, h, rgb))
        assert (w2, h2, rgb2) == (w, h, rgb), f"{w}x{h} round trip"


def test_png_decode_never_emits_partial_pixels_on_truncation():
    """Every truncation point of a valid PNG must either raise or
    decode the COMPLETE frame (cuts inside the trailing IEND/CRC bytes
    legitimately still carry all pixel data) — never silently emit
    partial pixels (torn object-store reads at scale)."""
    from sparkstreaming_gmall_demo_spark.operators import multimodal as mm

    rgb = bytes(range(2 * 3 * 3))
    png = mm.encode_png(2, 3, rgb)
    n_raised = 0
    for cut in range(8, len(png) - 1):
        try:
            got = mm.decode_png(png[:cut])
        except Exception:
            n_raised += 1
            continue
        assert got == (2, 3, rgb), f"partial decode at cut={cut}"
    assert n_raised > 0  # the sweep actually hit torn-frame territory
