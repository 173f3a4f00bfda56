"""Multimodal column handling: opaque binary payloads + typed metadata.

Pattern for image/audio/video at 100 TB:
- the payload is a BinaryType column (or a (path, offset, length)
  pointer into an object store for very large blobs);
- a typed metadata struct travels alongside (modality, n_bytes, ...);
- decode / feature-extract / resize / frame-sample run as Arrow-batched
  ``mapInPandas`` stages: one Python worker per partition, whole
  columnar batches across the JVM<->Python boundary, no per-row cost.

Codec status: PNG (8-bit RGB, non-interlaced) decodes FOR REAL via the
stdlib-only codec below (zlib inflate + full scanline de-filtering,
all five PNG filter types) — see ``decode_image``. Every other format
stays STUBBED (``decode_image_stub``: image/audio/video libraries are
not in this container): NotImplementedError when ``strict`` else a
deterministic fake decode. The Spark-side plumbing — schema, batching,
partitioning — is identical either way; swapping in PIL/ffmpeg for the
remaining formats is a one-function change inside the UDF.
"""

from __future__ import annotations

import struct
import zlib
from binascii import crc32
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

PAYLOAD_META = T.StructType(
    [
        T.StructField("modality", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("source", T.StringType()),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)


def attach_payload(df: DataFrame, text_col: str = "text", source_col: str = "source") -> DataFrame:
    """Materialize an opaque binary payload column + metadata struct.

    Fixtures carry no real media, so the payload is the utf-8 encoding
    of the text column — the point is the column plumbing (BinaryType +
    struct metadata), which is identical for real media bytes.
    """
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.withColumn("payload", payload).withColumn(
        "meta",
        F.struct(
            F.when(F.col(source_col).isin("web", "wiki"), F.lit("image"))
            .otherwise(F.lit("audio"))
            .alias("modality"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
            F.col(source_col).alias("source"),
        ),
    )


# ---------------------------------------------------------------------------
# Real PNG codec (stdlib only): 8-bit RGB, non-interlaced. The encoder
# exists to build planted fixtures whose expected pixels are known
# INDEPENDENTLY of the decoder (the oracle literals come from the
# pattern fed to encode_png, never from running the decoder), and it
# deliberately cycles through all five PNG filter types so the decoder
# must execute every de-filter branch to reproduce them.
# ---------------------------------------------------------------------------

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_PNG_BPP = 3  # 8-bit RGB


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", crc32(tag + body) & 0xFFFFFFFF)
    )


def _build_png_decoder():
    """Factory for the decode-side codec. The returned functions are
    CLOSURES (qualname under <locals>), so cloudpickle ships them BY
    VALUE into Spark workers — the decode UDF must run under a plain
    driver-contract session where this package is not importable on
    executors (the house rule: worker-side code is self-contained; see
    vocab.py's n_bpe_tokens). Module-level helpers would pickle by
    reference and ModuleNotFoundError on the worker."""

    def paeth(a: int, b: int, c: int) -> int:
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa <= pb and pa <= pc:
            return a
        return b if pb <= pc else c

    def decode(data: bytes) -> tuple[int, int, bytes]:
        if data[:8] != b"\x89PNG\r\n\x1a\n":
            raise ValueError("not a PNG payload")
        pos = 8
        width = height = None
        idat = bytearray()
        while pos + 8 <= len(data):
            (length,) = struct.unpack(">I", data[pos : pos + 4])
            tag = data[pos + 4 : pos + 8]
            body = data[pos + 8 : pos + 8 + length]
            if tag == b"IHDR":
                width, height, depth, ctype, _, _, interlace = struct.unpack(
                    ">IIBBBBB", body
                )
                if depth != 8 or ctype != 2 or interlace != 0:
                    raise ValueError(
                        f"unsupported PNG variant (depth={depth}, "
                        f"color={ctype}, interlace={interlace}): only "
                        "8-bit RGB non-interlaced"
                    )
            elif tag == b"IDAT":
                idat.extend(body)
            elif tag == b"IEND":
                break
            pos += 12 + length  # len + tag + body + crc
        if width is None:
            raise ValueError("PNG missing IHDR")
        raw = zlib.decompress(bytes(idat))
        bpp = 3
        stride = width * bpp
        if len(raw) != height * (stride + 1):
            raise ValueError("PNG pixel data length mismatch")
        rgb = bytearray()
        prior = bytes(stride)
        for y in range(height):
            ft = raw[y * (stride + 1)]
            row = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
            if ft == 1:  # Sub
                for x in range(stride):
                    row[x] = (row[x] + (row[x - bpp] if x >= bpp else 0)) & 0xFF
            elif ft == 2:  # Up
                for x in range(stride):
                    row[x] = (row[x] + prior[x]) & 0xFF
            elif ft == 3:  # Average
                for x in range(stride):
                    row[x] = (
                        row[x]
                        + ((row[x - bpp] if x >= bpp else 0) + prior[x]) // 2
                    ) & 0xFF
            elif ft == 4:  # Paeth
                for x in range(stride):
                    row[x] = (
                        row[x]
                        + paeth(
                            row[x - bpp] if x >= bpp else 0,
                            prior[x],
                            prior[x - bpp] if x >= bpp else 0,
                        )
                    ) & 0xFF
            elif ft != 0:
                raise ValueError(f"unknown PNG filter type {ft}")
            rgb.extend(row)
            prior = bytes(row)
        return width, height, bytes(rgb)

    return paeth, decode


_paeth, decode_png = _build_png_decoder()


def encode_png(width: int, height: int, rgb: bytes) -> bytes:
    """Minimal stdlib PNG writer (8-bit RGB, no interlace). ``rgb`` is
    height x width x 3 raw bytes, row-major. Each scanline is filtered
    with type (row % 5), so a round-trip exercises None/Sub/Up/Average/
    Paeth de-filtering — not just the trivial filter-0 path."""
    if len(rgb) != width * height * _PNG_BPP:
        raise ValueError("rgb length != width*height*3")
    stride = width * _PNG_BPP
    out = bytearray()
    prior = bytes(stride)
    for y in range(height):
        row = rgb[y * stride : (y + 1) * stride]
        ft = y % 5
        out.append(ft)
        if ft == 0:
            out.extend(row)
        elif ft == 1:  # Sub
            out.extend(
                (row[x] - (row[x - _PNG_BPP] if x >= _PNG_BPP else 0)) & 0xFF
                for x in range(stride)
            )
        elif ft == 2:  # Up
            out.extend((row[x] - prior[x]) & 0xFF for x in range(stride))
        elif ft == 3:  # Average
            out.extend(
                (
                    row[x]
                    - ((row[x - _PNG_BPP] if x >= _PNG_BPP else 0) + prior[x]) // 2
                )
                & 0xFF
                for x in range(stride)
            )
        else:  # Paeth
            out.extend(
                (
                    row[x]
                    - _paeth(
                        row[x - _PNG_BPP] if x >= _PNG_BPP else 0,
                        prior[x],
                        prior[x - _PNG_BPP] if x >= _PNG_BPP else 0,
                    )
                )
                & 0xFF
                for x in range(stride)
            )
        prior = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(out), 6))
        + _png_chunk(b"IEND", b"")
    )


DECODED_REAL_SCHEMA = T.StructType(
    DECODED_SCHEMA.fields
    + [
        T.StructField("pixel_crc32", T.LongType()),
        T.StructField("codec", T.StringType()),
    ]
)


def decode_image(df: DataFrame, strict: bool = False) -> DataFrame:
    """The decode stage with a REAL codec for PNG payloads: the same
    Arrow-batched ``mapInPandas`` shape as ``decode_image_stub``, but a
    payload starting with the PNG signature is actually decoded
    (inflate + de-filter) — width/height come from IHDR and
    ``pixel_crc32`` is crc32 over the reconstructed raw RGB bytes, so
    a decoder that mis-reconstructs even one byte is caught by the
    planted-fixture oracle. Non-PNG payloads keep the documented stub
    behavior (fake dimensions when not ``strict``, NotImplementedError
    when ``strict``), with ``pixel_crc32`` null and ``codec`` set to
    'stub'. PNGs report n_frames=1 (a still image IS one frame)."""
    # bind worker-side dependencies as closure cells: decode_png is a
    # dynamic closure (ships by value), PNG_MAGIC a bytes constant,
    # crc32 a stdlib reference — the UDF needs no package import on
    # the executor (driver-contract sessions can't provide one)
    _magic, _decode, _crc = PNG_MAGIC, decode_png, crc32

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": [], "modality": [], "n_bytes": [],
                "width": [], "height": [], "n_frames": [],
                "pixel_crc32": [], "codec": [],
            }
            for doc_id, payload, meta in zip(
                pdf["doc_id"], pdf["payload"], pdf["meta"]
            ):
                data = bytes(payload)
                out["doc_id"].append(doc_id)
                out["n_bytes"].append(len(data))
                if data[: len(_magic)] == _magic:
                    w, h, rgb = _decode(data)
                    out["modality"].append("image")
                    out["width"].append(w)
                    out["height"].append(h)
                    out["n_frames"].append(1)
                    out["pixel_crc32"].append(_crc(rgb) & 0xFFFFFFFF)
                    out["codec"].append("png")
                else:
                    if strict:
                        raise NotImplementedError(
                            "no codec for non-PNG payloads in this "
                            "environment; swap this block for PIL/ffmpeg"
                        )
                    out["modality"].append(meta["modality"])
                    out["width"].append(len(data) % 640 + 1)
                    out["height"].append(len(data) % 480 + 1)
                    out["n_frames"].append(len(data) % 16 + 1)
                    out["pixel_crc32"].append(None)
                    out["codec"].append("stub")
            pdf_out = pd.DataFrame(out)
            pdf_out["width"] = pdf_out["width"].astype("int32")
            pdf_out["height"] = pdf_out["height"].astype("int32")
            pdf_out["n_frames"] = pdf_out["n_frames"].astype("int32")
            yield pdf_out

    return df.select("doc_id", "payload", "meta").mapInPandas(
        decode, DECODED_REAL_SCHEMA
    )


def decode_image_stub(df: DataFrame, strict: bool = False) -> DataFrame:
    """STUB decode stage over mapInPandas.

    strict=True raises NotImplementedError (the honest "no codec in
    this container" path). strict=False emits a deterministic fake
    decode (dimensions derived from payload bytes) so the batching,
    schema, and partition behavior are exercised end-to-end.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "media codec not available in this environment; "
                    "swap this block for PIL/ffmpeg decode"
                )
            n_bytes = pdf["payload"].map(len).astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": pdf["meta"].map(lambda m: m["modality"]),
                    "n_bytes": n_bytes,
                    # deterministic fake: dimensions are pure functions
                    # of the payload length
                    "width": (n_bytes % 640 + 1).astype("int32"),
                    "height": (n_bytes % 480 + 1).astype("int32"),
                    "n_frames": (n_bytes % 16 + 1).astype("int32"),
                }
            )

    return df.select("doc_id", "payload", "meta").mapInPandas(decode, DECODED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_payload", T.BinaryType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def resize_stub(decoded: DataFrame, width: int, height: int) -> DataFrame:
    """STUB resize stage: element-wise Arrow-batched transform keeping
    aspect ratio (fit-inside semantics). Real impl replaces the
    arithmetic with PIL thumbnail; batch shape is 1 row in -> 1 row out.
    The output schema is input + (resized_width, resized_height), so
    both decode stages (stub DECODED_SCHEMA and the PNG-capable
    DECODED_REAL_SCHEMA) flow through unchanged.
    """
    out_schema = T.StructType(
        decoded.schema.fields
        + [
            T.StructField("resized_width", T.IntegerType()),
            T.StructField("resized_height", T.IntegerType()),
        ]
    )

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            scale = (width / pdf["width"]).combine(height / pdf["height"], min)
            out = pdf.copy()
            out["resized_width"] = (pdf["width"] * scale).clip(lower=1).astype("int32")
            out["resized_height"] = (pdf["height"] * scale).clip(lower=1).astype("int32")
            yield out

    return decoded.mapInPandas(resize, out_schema)


def frame_sample_stub(df: DataFrame, every_k: int = 4) -> DataFrame:
    """STUB frame sampling: 1 row in -> ceil(n_frames / every_k) rows
    out — the fan-out batch shape of real video frame extraction. The
    fake frame payload is a deterministic slice of the source payload;
    real impl replaces the slicing with an ffmpeg seek+decode.

    Scale: fan-out happens inside the Python worker per Arrow batch;
    no shuffle is introduced. Downstream repartition() is the caller's
    choice when frame rows must rebalance.
    """

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "frame_idx": [], "frame_payload": [], "n_bytes": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = len(payload) % 16 + 1  # matches decode_image_stub
                for idx in range(0, n_frames, every_k):
                    lo = (idx * 7) % max(1, len(payload))
                    frame = bytes(payload[lo : lo + 8])
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(idx)
                    rows["frame_payload"].append(frame)
                    rows["n_bytes"].append(len(frame))
            yield pd.DataFrame(rows)

    return df.select("doc_id", "payload").mapInPandas(sample, FRAME_SCHEMA)


def payload_shingle_hashes(
    df: DataFrame,
    n_bytes: int = 8,
    stride: int = 4,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """(doc_id, hs): distinct 64-bit hashes of the payload's strided
    byte n-grams — content fingerprinting that needs NO codec, so it
    applies uniformly to image/audio/video blobs (the fuzzy-hash
    family: overlapping-byte-window digests a la ssdeep/CTPH, here as
    a hash SET so similarity is plain Jaccard). ``stride`` > 1 samples
    every stride-th window: 1/stride the hashes with near-identical
    resolution for payloads whose edits are byte-local. One narrow map
    over the binary column; payload bytes never leave the row."""
    expr = (
        f"array_distinct(transform("
        f"sequence(1, greatest(octet_length({payload_col}) - {n_bytes} + 1, 1), {stride}), "
        f"i -> xxhash64(substring({payload_col}, i, {n_bytes}))))"
    )
    return df.select(F.col(id_col).alias("doc_id"), F.expr(expr).alias("hs"))


def payload_near_duplicates(
    df: DataFrame,
    threshold: float = 0.8,
    n_bytes: int = 8,
    stride: int = 4,
    num_hashes: int = 64,
    bands: int = 16,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """(i, j, jaccard): near-duplicate binary payloads — byte-shingle
    fingerprints through the SAME MinHash/LSH machinery as text
    near-dup (operators/neardup.py:signature_from_hash_sets /
    near_duplicates_from_signatures): signatures map-side, candidates
    from band buckets, exact hash-set Jaccard verification. At 100 TB
    only ids + fingerprint sets shuffle; raw media bytes never do —
    the dedup a multimodal ingest runs BEFORE paying for any decode."""
    from . import neardup as nd

    hs = payload_shingle_hashes(df, n_bytes, stride, id_col, payload_col)
    sigs = nd.signature_from_hash_sets(hs, num_hashes)
    return nd.near_duplicates_from_signatures(sigs, threshold, bands)
