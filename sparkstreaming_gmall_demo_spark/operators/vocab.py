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


def token_pmi_pairs(
    df: DataFrame,
    vocab: DataFrame,
    n_docs: int,
    min_cooccur: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Collocation mining: pointwise mutual information over token
    PAIRS co-occurring in a document, restricted to the ``vocab``
    frame — the phrase/topic-affinity signal corpus analyses build on.

        pmi(a, b) = ln( N * df(a,b) / (df(a) * df(b)) )

    with doc-frequency counts (presence, not occurrences) and N the
    corpus document count.

    Scale design: the vocabulary restriction is the whole story — the
    pair space is bounded at |V|^2/2 regardless of corpus size, so the
    co-occurrence aggregation partial-aggregates into at most that many
    keys map-side. Tokens filter through a BROADCAST vocab join, each
    doc collapses to its sorted distinct vocab-token array (bounded at
    |V| entries), and pairs are generated per doc with the same array
    combinatorics as the near-dup bucket kernel — text never shuffles,
    and nothing the size of the corpus ever hits a wide key space.
    Returns (a, b, cooccur, pmi4) with a < b."""
    toks = corpus_tokens(df.select(id_col, text_col), text_col).join(
        F.broadcast(vocab.select("token")), "token"
    )
    per_doc = toks.groupBy(id_col).agg(
        F.sort_array(F.collect_set("token")).alias("ts")
    )
    pairs = per_doc.filter(F.size("ts") > 1).select(
        F.explode(
            F.expr(
                "flatten(transform(ts, (x, k) -> "
                "transform(slice(ts, k + 2, size(ts)), y -> struct(x AS a, y AS b))))"
            )
        ).alias("p")
    ).select("p.a", "p.b")
    cab = pairs.groupBy("a", "b").agg(F.count("*").alias("cooccur"))
    uni = (
        toks.select(id_col, "token").distinct()
        .groupBy("token")
        .agg(F.count("*").alias("dfreq"))
    )
    return (
        cab.filter(F.col("cooccur") >= min_cooccur)
        .join(F.broadcast(uni.withColumnRenamed("token", "a").withColumnRenamed("dfreq", "dfa")), "a")
        .join(F.broadcast(uni.withColumnRenamed("token", "b").withColumnRenamed("dfreq", "dfb")), "b")
        .select(
            "a",
            "b",
            F.col("cooccur").cast("long").alias("cooccur"),
            F.round(
                F.log(
                    F.lit(float(n_docs))
                    * F.col("cooccur")
                    / (F.col("dfa") * F.col("dfb"))
                ),
                4,
            ).alias("pmi4"),
        )
    )
