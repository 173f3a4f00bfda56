"""Data Selection via Importance Resampling (DSIR) — hashed-n-gram
importance scoring of a raw pool against a small target corpus (Xie et
al. 2023, "Data Selection for Language Models via Importance
Resampling", public paper). The shape every pretraining curation
pipeline runs: "give me the web documents that look most like my
high-quality target set".

Spark-first design, built to hold at 100 TB:

- Features are HASHED unigram buckets (md5 -> 8 hex chars -> mod B),
  so the feature space is a fixed ``B`` regardless of vocabulary size:
  the bucket count tables are bounded (B rows), the weight table is
  bounded, and it broadcasts. Text itself never shuffles — only
  (bucket:int, count:long) pairs do, pre-combined map-side.
- The bucket hash reuses the sampling family's md5 idiom
  (operators/sampling.py:_digest): Spark ``conv(substr(md5(t),1,8),
  16, 10)`` and DuckDB ``CAST(concat('0x', substr(md5(t),1,8)) AS
  BIGINT)`` agree on the integer, so membership of a token in a bucket
  is engine-portable and the whole scorer is oracle-restatable.
- Per-bucket log-ratio weights are frozen to INTEGER micro-nats
  (round(w * 1e6)) before any per-document summation: document scores
  are then exact BIGINT sums — shuffle-order-independent and
  hash-stable — with the only float op (one ln per bucket, the
  ext_token_pmi discipline) isolated in the B-row weight table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import tokens

DSIR_BUCKETS = 1024


def hash_bucket(token, buckets: int = DSIR_BUCKETS) -> Column:
    """md5-derived feature bucket in [0, buckets). Engine-portable:
    the first 8 hex chars of md5 read as an integer, mod B."""
    token = F.col(token) if isinstance(token, str) else token
    v = F.conv(F.substring(F.md5(token), 1, 8), 16, 10).cast("long")
    return F.pmod(v, F.lit(buckets))


def bucket_counts(
    df: DataFrame, text_col: str = "text", buckets: int = DSIR_BUCKETS
) -> DataFrame:
    """(bucket, cnt) unigram-occurrence counts over hashed buckets.
    The explode shuffles (bucket:int) keys only — map-side partial
    aggregation collapses each partition to <= B rows before the
    exchange, so the shuffle is O(B x partitions) whatever the corpus
    size."""
    return (
        df.select(F.explode(tokens(text_col)).alias("token"))
        .select(hash_bucket("token", buckets).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("cnt"))
    )


def dsir_weights(
    target: DataFrame,
    pool: DataFrame,
    text_col: str = "text",
    buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """Per-bucket importance weights: (bucket, w_micro) with

        w = ln((tgt_b + 1) / (tgt_total + B)) -
            ln((pool_b + 1) / (pool_total + B))

    (add-one smoothing over the B-bucket feature space) frozen to
    integer micro-nats. The table has at most B rows — it broadcasts,
    and the two ``count(*)`` totals it needs are driver-side scalars
    of the already-aggregated count tables (B-row aggs, not corpus
    scans)."""
    # the two B-row count tables are localCheckpoint-ed (r12): each
    # previously re-derived its corpus pass once for its total and
    # once more inside the weight join (4 corpus passes -> 2), and the
    # totals now read from B materialized rows instead of re-scanning
    tgt = (
        bucket_counts(target, text_col, buckets)
        .withColumnRenamed("cnt", "tgt_cnt")
        .localCheckpoint()
    )
    src = (
        bucket_counts(pool, text_col, buckets)
        .withColumnRenamed("cnt", "src_cnt")
        .localCheckpoint()
    )
    tgt_total = tgt.agg(F.sum("tgt_cnt")).collect()[0][0] or 0  # collect-bound: 1-row agg over B checkpointed rows
    src_total = src.agg(F.sum("src_cnt")).collect()[0][0] or 0  # collect-bound: 1-row agg over B checkpointed rows
    joined = (
        tgt.join(src, "bucket", "full_outer")
        .select(
            "bucket",
            F.coalesce("tgt_cnt", F.lit(0)).alias("tgt_cnt"),
            F.coalesce("src_cnt", F.lit(0)).alias("src_cnt"),
        )
    )
    w = F.log((F.col("tgt_cnt") + 1) / F.lit(float(tgt_total + buckets))) - F.log(
        (F.col("src_cnt") + 1) / F.lit(float(src_total + buckets))
    )
    return joined.select(
        "bucket", F.round(w * 1e6).cast("long").alias("w_micro")
    )


def dsir_scores(
    pool: DataFrame,
    weights: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """Per-document importance: sum of w_micro over the document's
    token occurrences (multiplicity counted — DSIR's bag-of-hashed-
    grams model). The weight table rides a broadcast hash join onto
    the exploded tokens; the only shuffle is the (doc_id, partial-sum)
    combine. Exact BIGINT arithmetic end to end."""
    toks = pool.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("token")
    ).select(id_col, hash_bucket("token", buckets).alias("bucket"))
    return (
        toks.join(F.broadcast(weights), "bucket")
        .groupBy(id_col)
        .agg(F.sum("w_micro").alias("score_micro"))
    )


def dsir_topk(
    pool: DataFrame,
    weights: DataFrame,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """The selection step: top-k pool documents by importance score
    (ties -> doc_id asc). At 100 TB use the quota/threshold form
    (score distribution quantile -> filter) instead of a global sort;
    the declared k here keeps the driver output bounded."""
    scores = dsir_scores(pool, weights, id_col, text_col, buckets)
    return scores.orderBy(F.desc("score_micro"), F.asc(id_col)).limit(k)
