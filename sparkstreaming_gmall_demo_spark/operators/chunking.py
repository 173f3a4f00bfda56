"""Document chunking and context-window packing — the two reshaping
steps between a cleaned corpus and a training batch: long documents
split into fixed-size token windows (with overlap for continuity),
short documents packed greedily into fixed-token-budget bins so a
context window wastes no space.

Both are pure built-in expressions (sequence/explode for chunking,
one running-sum window for packing) — no Python in the path, and the
chunk fan-out happens AFTER projection so only (id, token count)
crosses the explode, never the text bytes times chunks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def chunk_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_size: int,
    stride: int,
    keep_cols: list | None = None,
) -> DataFrame:
    """One row per (document, chunk window): ``chunk_start`` (token
    offset) and ``chunk_tokens`` (window length, truncated at the
    document tail). Windows start every ``stride`` tokens —
    stride < chunk_size gives overlapping context windows.

    The span arithmetic runs on the token COUNT only; the text column
    itself is never multiplied across chunks (slice the tokens after,
    per chunk, if chunk text is needed downstream — at 100 TB the
    explode must not fan out megabyte strings).
    """
    if chunk_size < 1 or stride < 1:
        raise ValueError("chunk_size and stride must be >= 1")
    keep_cols = keep_cols or []
    n = F.size(F.split(F.col(text_col), " "))
    spans = df.select(
        F.col(id_col),
        n.alias("n_tokens"),
        *[F.col(c) for c in keep_cols],
    ).filter(F.col("n_tokens") >= 1)
    return spans.select(
        id_col,
        "n_tokens",
        *keep_cols,
        F.explode(
            F.sequence(F.lit(0), F.col("n_tokens") - 1, F.lit(stride))
        ).alias("chunk_start"),
    ).withColumn(
        "chunk_tokens",
        F.least(F.lit(chunk_size), F.col("n_tokens") - F.col("chunk_start")),
    )


def pack_greedy(
    df: DataFrame,
    group_col: str,
    order_col: str,
    tokens_col: str,
    budget: int,
) -> DataFrame:
    """Concat-and-cut packing: conceptually concatenate each group's
    documents in ``order_col`` order and cut the token stream at every
    ``budget`` boundary; a document belongs to the bin containing its
    FIRST token. ``bin_id`` = floor(exclusive-prefix-sum / budget) —
    one window running sum, deterministic on any engine.

    This is the packing pretraining loaders actually use (contiguous
    fill over a stable order), not optimal bin-packing: a document
    straddling a boundary overflows its bin by at most its own length,
    so bins average exactly ``budget`` over the stream. Close-on-
    overflow greedy is a sequential recurrence (not expressible as a
    prefix sum); if hard caps matter, chunk first (``chunk_spans``)
    so no document exceeds the budget.

    Scale: the window is a single sort per group — pack within a
    (group, date) or (group, shard) grain at fact scale, exactly like
    any other unpartitioned-window caveat (Q23 note in plans/).
    """
    w = Window.partitionBy(group_col).orderBy(order_col)
    prefix = F.coalesce(
        F.sum(tokens_col).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    return df.withColumn("bin_id", F.floor(prefix / F.lit(budget)).cast("long"))


def shard_assign(
    df: DataFrame,
    shard_key_cols: list,
    n_shards: int,
    salt: str = "",
) -> DataFrame:
    """Deterministic shard label for training-file layout: the md5
    hash-space bucket of the concatenated key columns, modulo
    ``n_shards``. The same (key, salt) lands in the same shard on any
    engine and any partitioning — the property a resumable export
    needs so a re-run overwrites the SAME shard files instead of
    reshuffling the corpus (``df.repartition(n)`` round-robin cannot
    promise that). Same digest convention as operators/sampling.py."""
    key = F.concat_ws("|", *[F.col(c).cast("string") for c in shard_key_cols])
    digest = F.substring(F.md5(F.concat(key, F.lit(salt))), 1, 8)
    return df.withColumn(
        "shard", (F.conv(digest, 16, 10).cast("long") % n_shards).cast("int")
    )


def write_training_shards(
    bins: DataFrame, path: str, n_shards: int, salt: str = ""
) -> None:
    """Materialize packed contexts as shard-partitioned parquet
    (shard=K/ directories): one deterministic layout step from packed
    bins to the files a training loader mounts. Shard assignment is
    content-keyed (``shard_assign`` on (group, bin)), so re-exports
    rewrite identical shards and a loader's shard->worker mapping
    stays valid across corpus refreshes."""
    sharded = shard_assign(bins, ["lang", "bin_id"], n_shards, salt)
    sharded.write.mode("overwrite").partitionBy("shard").parquet(path)


def length_bucket_stats(
    df: DataFrame,
    boundaries: list,
    text_col: str = "text",
) -> DataFrame:
    """(cap, n_docs, sum_tokens, padded_tokens, truncated_tokens,
    pad_bp): the padding-waste audit behind sequence-length bucketing
    — a training loader that pads every example to its bucket's cap
    wastes ``cap - len`` tokens per doc, and docs longer than the top
    cap are truncated. Bucket = smallest boundary >= length (the top
    boundary catches everything longer, as truncation). A curation
    pass reads this table to choose boundaries that bound waste before
    committing to a packing layout (context packing, the zero-padding
    alternative, is :func:`pack_documents`).

    One narrow map (length + CASE chain) and one bounded aggregation —
    the output is |boundaries| rows whatever the corpus size."""
    bs = sorted(boundaries)
    if not bs:
        raise ValueError("boundaries must be non-empty")
    n = F.size(F.split(F.col(text_col), " "))
    cap = F.lit(bs[-1])
    for b in reversed(bs[:-1]):
        cap = F.when(n <= b, b).otherwise(cap)
    return (
        df.select(
            n.alias("_n"),
            cap.alias("cap"),
        )
        .groupBy("cap")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("_n").cast("long").alias("sum_tokens"),
            F.sum(F.greatest(F.col("cap") - F.col("_n"), F.lit(0)))
            .cast("long")
            .alias("padded_tokens"),
            F.sum(F.greatest(F.col("_n") - F.col("cap"), F.lit(0)))
            .cast("long")
            .alias("truncated_tokens"),
        )
        .select(
            "cap",
            "n_docs",
            "sum_tokens",
            "padded_tokens",
            "truncated_tokens",
            # Integer basis points, not a rounded double: floor(x+0.5)
            # matches the oracle bit-for-bit regardless of how the
            # comparing engine types a `1.0` literal (DECIMAL vs DOUBLE).
            F.floor(
                F.col("padded_tokens")
                * F.lit(10000.0)
                / (F.col("n_docs").cast("double") * F.col("cap"))
                + F.lit(0.5)
            )
            .cast("long")
            .alias("pad_bp"),
        )
        .orderBy("cap")
    )
