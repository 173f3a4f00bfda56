"""Corpus vocabulary construction and unigram-LM scoring.

The tokenizer-building step of a training-data pipeline: derive a
frequency-ordered vocabulary from the corpus itself (the id assignment
every downstream tokenizer consumes), then score documents by unigram
surprisal against the corpus LM — the classic cheap quality signal
(documents whose tokens are systematically improbable under the corpus
distribution are boilerplate, encoding noise, or off-domain).

Scale design (100 TB):
- Token counting is a narrow ``explode`` + partial-aggregated
  ``groupBy(token)`` — map-side combine collapses each partition to its
  distinct tokens before the single shuffle; the text column itself
  never shuffles.
- Vocabulary selection is top-N by (count DESC, token ASC) — a
  ``TakeOrderedAndProject`` (no global sort materialization), and the
  result (N rows, two narrow columns) is broadcast back for id lookup.
- Surprisal scoring joins exploded tokens against the BROADCAST
  vocabulary — the corpus-side stream never shuffles; out-of-vocab
  tokens fall back to a single smoothed OOV probability so the
  broadcast stays bounded (``top_n`` rows) no matter how heavy the
  token tail gets at scale.

Tokenization matches the repo-wide convention (split on single space,
``operators/text.py:token_count``) so vocab ids, token accounting and
surprisal all agree on what a token is.

Reference anchor: the reference has no tokenizer pipeline (its text
path is the ES analyzer, gmall-publisher DSL building at
PublisherServiceImpl.java); this family is a beyond-reference
extension for LLM corpus curation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def corpus_tokens(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Explode to one row per token occurrence. Narrow (no shuffle);
    duplicates preserved — counts downstream are occurrence counts."""
    return df.withColumn("token", F.explode(F.split(F.col(text_col), " ")))


def vocab_build(
    df: DataFrame, top_n: int = 256, text_col: str = "text"
) -> DataFrame:
    """Frequency-ordered vocabulary: ``(token_id, token, cnt)`` with
    contiguous ids 0..top_n-1 assigned by (cnt DESC, token ASC) — the
    deterministic tie-break makes id assignment engine-portable.

    The ``row_number`` window is over the top-N rows only (the
    ``limit`` is applied on an already-aggregated frame of distinct
    tokens), so the single-partition window everyone fears with
    ``Window.orderBy`` touches N rows, not the corpus.
    """
    counts = (
        corpus_tokens(df, text_col)
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
    )
    rank_key = F.struct((-F.col("cnt")).alias("c"), F.col("token").alias("t"))
    topn = counts.orderBy(rank_key).limit(top_n)
    w = Window.orderBy(rank_key)
    return topn.select(
        (F.row_number().over(w) - F.lit(1)).cast("int").alias("token_id"),
        "token",
        F.col("cnt").cast("long").alias("cnt"),
    )


def unigram_surprisal(
    df: DataFrame,
    vocab: DataFrame,
    total_tokens: int,
    vocab_size: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document mean unigram surprisal ``avg(-ln p(tok))`` under
    the add-one-smoothed corpus LM restricted to ``vocab``:

        p(tok in vocab) = (cnt + 1) / (total + V + 1)
        p(OOV)          = 1         / (total + V + 1)

    ``vocab`` is the (token, cnt) frame from :func:`vocab_build` —
    joined as a BROADCAST (bounded rows by construction), so the
    document stream stays shuffle-free until the final per-doc
    aggregation on ``id_col``. Returns (id_col, n_tokens, surprisal).
    """
    denom = float(total_tokens + vocab_size + 1)
    toks = corpus_tokens(df.select(id_col, text_col), text_col)
    scored = toks.join(
        F.broadcast(vocab.select("token", "cnt")), on="token", how="left"
    ).select(
        id_col,
        (-F.log((F.coalesce(F.col("cnt"), F.lit(0)) + F.lit(1.0)) / F.lit(denom))).alias(
            "surprisal_tok"
        ),
    )
    return scored.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.avg("surprisal_tok").alias("surprisal"),
    )
