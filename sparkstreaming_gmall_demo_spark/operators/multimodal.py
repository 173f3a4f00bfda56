"""Multimodal column handling: opaque binary payloads + typed metadata.

Pattern for image/audio/video at 100 TB:
- the payload is a BinaryType column (or a (path, offset, length)
  pointer into an object store for very large blobs);
- a typed metadata struct travels alongside (modality, n_bytes, ...);
- decode / feature-extract / resize / frame-sample run as Arrow-batched
  ``mapInPandas`` stages: one Python worker per partition, whole
  columnar batches across the JVM<->Python boundary, no per-row cost.

The actual codec step is STUBBED here (image/audio libraries are not in
this container): ``decode_image_stub`` raises NotImplementedError when
``strict`` else produces a deterministic fake decode. The Spark-side
plumbing — schema, batching, partitioning — is real and tested;
swapping in PIL/ffmpeg is a one-function change inside the UDF.
"""

from __future__ import annotations

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


RESIZED_SCHEMA = T.StructType(
    DECODED_SCHEMA.fields
    + [
        T.StructField("resized_width", T.IntegerType()),
        T.StructField("resized_height", T.IntegerType()),
    ]
)

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
    """

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            scale = (width / pdf["width"]).combine(height / pdf["height"], min)
            out = pdf.copy()
            out["resized_width"] = (pdf["width"] * scale).clip(lower=1).astype("int32")
            out["resized_height"] = (pdf["height"] * scale).clip(lower=1).astype("int32")
            yield out

    return decoded.mapInPandas(resize, RESIZED_SCHEMA)


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
