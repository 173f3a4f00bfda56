"""Persisted BM25 postings index + continuous maintenance — the
engine-grade form of the reference's continuously-updated ES index
(gmall-realtime writes every alert/sale to ES as it streams in,
utils/MyEsUtil.scala; gmall-publisher then serves keyword search from
that always-fresh index, service/impl/PublisherServiceImpl.java:84-99).

operators/text.py:bm25_topk computes BM25 by scanning the corpus per
query — correct, and the right oracle, but a 100 TB corpus cannot pay
a full scan per search. The classic answer is the inverted index:

- postings: one row per (doc, term) = (tb, term, doc_id, tf, dl),
  laid out partitioned by ``tb`` = hash-bucket of the term. A query
  analyzes to O(1) terms, their buckets are computed DRIVER-side, and
  the scan partition-prunes to those buckets — query cost follows the
  queried terms' posting lists, not the corpus (the same
  driver-literal partition-prune discipline as similarity.py's
  LSH/IVF/PQ indexes).
- corpus stats: BM25 needs N (doc count) and avgdl over ALL docs —
  including docs that match nothing — so each ingested batch commits
  one (batch_id, n_docs, sum_dl) partial row to a txn table; partials
  are mergeable by addition exactly like the HLL/boilerplate
  pipelines, and a reader folds ~n_batches tiny rows. Per-term df is
  NOT pre-aggregated: a term's full posting list lives in its bucket,
  so df = count(distinct doc) over the already-pruned scan — always
  exact, never stale.
- tf and dl are denormalized into the posting row (the standard
  Lucene layout decision), so scoring never joins back to documents.

Append-only corpus model: a doc_id is indexed once (replays no-op via
the keyed sink); updates/deletes would need a tombstone column — out
of scope, like the reference's ES doc-id upsert which also never
deletes.

Exactness: ``bm25_index_topk`` reproduces ``bm25_topk`` bit-for-bit
(same analyzer, same Lucene idf, same 4-dp rounding and id tiebreak)
whenever the index holds exactly the scanned corpus — pinned by test
and by the ext_bm25_indexed oracle, which is the corpus-scan SQL.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .text import analyze, analyze_keyword

BM25_BUCKETS = 16


def _term_bucket(term_col, n_buckets: int):
    return F.pmod(F.xxhash64(term_col), F.lit(n_buckets)).cast("int")


def bm25_postings(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = BM25_BUCKETS,
) -> DataFrame:
    """(tb, term, doc_id, tf, dl) — one row per distinct analyzed term
    per document. One explode + one (doc, term) count shuffle per
    batch; dl rides the groupBy key (constant per doc) so no join back
    to the corpus."""
    toks = analyze(text_col)
    exploded = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).cast("double").alias("dl"),
        F.explode(toks).alias("term"),
    )
    return (
        exploded.groupBy("doc_id", "dl", "term")
        .agg(F.count("*").cast("double").alias("tf"))
        .select(
            _term_bucket(F.col("term"), n_buckets).alias("tb"),
            "term", "doc_id", "tf", "dl",
        )
    )


def bm25_stats_partial(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """One (n_docs, sum_dl) row for a batch — counts EVERY doc, even
    ones whose analyzed text is empty (BM25's N and avgdl are
    corpus-wide, not match-wide)."""
    return docs.agg(
        F.count(id_col).cast("long").alias("n_docs"),
        F.coalesce(
            F.sum(F.size(analyze(text_col)).cast("double")), F.lit(0.0)
        ).alias("sum_dl"),
    )


def bm25_write_index(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = BM25_BUCKETS,
) -> None:
    """Batch build: postings partitioned by tb + the corpus-stats row
    under ``path/stats`` (the one-shot twin of the streaming
    pipeline's incremental maintenance)."""
    bm25_postings(docs, id_col, text_col, n_buckets).write.mode(
        "overwrite"
    ).partitionBy("tb").parquet(os.path.join(path, "postings"))
    bm25_stats_partial(docs, id_col, text_col).write.mode("overwrite").parquet(
        os.path.join(path, "stats")
    )


def bm25_read_index(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    return (
        spark.read.parquet(os.path.join(path, "postings")),
        spark.read.parquet(os.path.join(path, "stats")),
    )


def bm25_index_topk(
    postings: DataFrame,
    stats: DataFrame,
    keyword: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    n_buckets: int = BM25_BUCKETS,
) -> DataFrame:
    """Top-k BM25 from the persisted index: the scan touches ONLY the
    queried terms' buckets (tb literals computed driver-side ->
    PartitionFilters on the partitioned layout), df per term comes
    exactly from the pruned posting lists, N/avgdl fold the stats
    partials, and the result is bit-identical to the corpus-scan
    ``bm25_topk``. ``stats`` may hold many partial rows (streaming
    maintenance) — they aggregate by addition."""
    terms = analyze_keyword(keyword)
    if not terms:
        raise ValueError("keyword analyzes to no terms")
    # driver-side literals -> partition pruning (ONE tiny local job
    # for all query terms)
    tbs = _buckets_py(terms, n_buckets)
    cand = postings.filter(
        F.col("tb").isin(tbs) & F.col("term").isin(terms)
    )
    folded = stats.agg(
        F.sum("n_docs").cast("double").alias("n"),
        (F.sum("sum_dl") / F.sum("n_docs")).alias("avgdl"),
    )
    dfs = cand.groupBy("term").agg(
        F.count_distinct("doc_id").cast("double").alias("df")
    )
    ts = (
        F.log(
            F.lit(1.0)
            + (F.col("n") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
        )
        * (
            F.col("tf")
            * F.lit(k1 + 1.0)
            / (
                F.col("tf")
                + F.lit(k1)
                * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
            )
        )
    )
    # Per-term pivot, then add in FIXED query-term order: a plain
    # sum() over the group's rows would add in partition row order —
    # floating-point addition is not associative, so the 4th decimal
    # could drift from the corpus-scan plan (which adds term 0, then
    # 1, ...) and even between runs. The pivot also reproduces
    # bm25_topk's handling of a DUPLICATED query term (each occurrence
    # contributes its own addend, Lucene-style).
    per_term = (
        cand.join(F.broadcast(dfs), "term")
        .join(F.broadcast(folded))
        .groupBy("doc_id")
        .agg(
            *[
                F.coalesce(
                    F.sum(F.when(F.col("term") == t, ts)), F.lit(0.0)
                ).alias(f"s_{i}")
                for i, t in enumerate(terms)
            ]
        )
    )
    total = None
    for i in range(len(terms)):
        total = F.col(f"s_{i}") if total is None else total + F.col(f"s_{i}")
    scored = per_term.select("doc_id", F.round(total, 4).alias("score"))
    return scored.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(k)


def _buckets_py(terms: list[str], n_buckets: int) -> list[int]:
    """Driver-side twin of ``_term_bucket`` for a query's terms — must
    agree with Spark's xxhash64 exactly, so it asks the JVM (one tiny
    local job for ALL terms) rather than re-implementing the hash; the
    literals it returns are what lets the probe partition-prune."""
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    rows = spark.createDataFrame(
        [(t,) for t in terms], "term string"
    ).select(_term_bucket(F.col("term"), n_buckets).alias("tb")).collect()  # collect-bound: len(terms) query-term rows
    return sorted({int(r.tb) for r in rows})
