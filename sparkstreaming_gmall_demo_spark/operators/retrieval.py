"""Hybrid retrieval: rank fusion across sparse (BM25) and dense
(embedding-cosine) arms.

The reference serves keyword search from ES (BM25 under the hood,
service/impl/PublisherServiceImpl.java:84-99); a modern retrieval stack
runs that SAME query against an ANN index as well and fuses the two
rankings. Reciprocal Rank Fusion (Cormack et al., SIGIR 2009) is the
standard score-free fusion: rrf(d) = Σ_arms 1/(k0 + rank_arm(d)) —
robust to incomparable score scales, trivially deterministic, and
cheap: each arm is already a top-``depth`` frame, so every post-arm
operation touches O(depth) rows regardless of corpus size.

Scale posture: the arms do the heavy lifting with their own 100 TB
disciplines (BM25: narrow-map tf + 1-row broadcast stats +
TakeOrderedAndProject; cosine: brute or index-backed top-k). Fusion
itself is a full-outer join of two ≤depth-row frames plus a global
top-k — driver-trivial at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from . import similarity as sim_ops
from .text import bm25_topk

RRF_K0 = 60  # the SIGIR-2009 constant; dampens rank-1 dominance


def ranked(df: DataFrame, score_col: str = "score", id_col: str = "doc_id") -> DataFrame:
    """(id, rank): 1-based dense ordering by (score desc, id asc).
    Callers pass an already top-``depth``-limited frame, so the
    unpartitioned window touches O(depth) rows — bounded by the query,
    not the corpus."""
    w = Window.orderBy(F.desc(score_col), F.asc(id_col))
    return df.select(F.col(id_col), F.row_number().over(w).alias("rank"))


def rrf_fuse(
    sparse: DataFrame,
    dense: DataFrame,
    id_col: str = "doc_id",
    k: int = 10,
    k0: int = RRF_K0,
) -> DataFrame:
    """Fuse two (id, rank) frames: full-outer join on id, missing arm
    contributes 0, order by rounded rrf (6 dp) desc with id tiebreak.
    Returns (id, rrf, rank_sparse, rank_dense)."""
    s = sparse.withColumnRenamed("rank", "rank_sparse")
    d = dense.withColumnRenamed("rank", "rank_dense")
    fused = s.join(d, id_col, "full")
    contrib = lambda c: F.coalesce(  # noqa: E731
        F.lit(1.0) / (F.lit(k0) + F.col(c)), F.lit(0.0)
    )
    return (
        fused.select(
            F.col(id_col),
            F.round(contrib("rank_sparse") + contrib("rank_dense"), 6).alias("rrf"),
            "rank_sparse",
            "rank_dense",
        )
        .orderBy(F.desc("rrf"), F.asc(id_col))
        .limit(k)
    )


def hybrid_rrf(
    docs: DataFrame,
    embeddings: DataFrame,
    keyword: str,
    query_vec_id: int,
    k: int = 10,
    depth: int = 50,
    k0: int = RRF_K0,
) -> DataFrame:
    """End-to-end hybrid search over the row-aligned documents /
    embeddings fixture pair (doc_id ≡ vec_id): BM25 top-``depth`` on
    the keyword + exact cosine top-``depth`` against the stored query
    vector, fused by RRF. The dense arm drops in any ANN variant
    (lsh_index_topk / ivf_topk / pq_topk) with the identical fusion —
    brute cosine keeps this entry oracle-exact."""
    sparse = ranked(bm25_topk(docs, keyword, k=depth), "score", "doc_id")
    q = sim_ops.query_vector(embeddings, query_vec_id)
    dense = ranked(
        sim_ops.cosine_topk(embeddings, q, k=depth).withColumnRenamed(
            "vec_id", "doc_id"
        ),
        "score",
        "doc_id",
    )
    return rrf_fuse(sparse, dense, "doc_id", k, k0)


RERANKED_SCHEMA = "doc_id long, rerank_score double"


def rerank_stub(
    candidates: DataFrame, query: str, strict: bool = False
) -> DataFrame:
    """STUB learned reranker — the cross-encoder slot of a retrieval
    stack: the first-stage arms (BM25 / ANN / RRF) cut the corpus to a
    query-bounded candidate frame, and ONLY those rows pay for a model
    forward pass, batched through Arrow ``mapInPandas`` (the same
    honest-stub discipline as operators/multimodal.py:decode_image_stub
    — no model runtime in this container). strict=True raises; the
    default emits a deterministic fake score that is a pure function of
    (doc_id, query) in the shared md5 hash space, so the oracle can
    restate it relationally and the driver gates the whole Arrow round
    trip value-for-value. Real impl: replace the hash with tokenizer +
    model inference inside the same batch loop — plumbing unchanged.

    Scale shape: candidates are top-``depth``-bounded upstream, so the
    Python stage touches O(depth) rows per query however large the
    corpus; this is exactly where per-row Python cost is affordable."""
    import hashlib

    import pandas as pd

    def score(batches):
        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "no reranker model runtime in this environment; "
                    "swap this block for a cross-encoder forward pass"
                )
            s = pdf["doc_id"].map(
                lambda d: int(
                    hashlib.md5(f"{d}|{query}".encode()).hexdigest()[:8], 16
                )
                / 4294967296.0
            )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "rerank_score": s})

    return candidates.select("doc_id").mapInPandas(score, RERANKED_SCHEMA)
