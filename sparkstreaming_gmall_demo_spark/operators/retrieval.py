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


# feature-based second-stage weights (micro-score space, integers so
# the ranking is engine- and replay-exact; the oracle inlines the same
# literals)
FR_W_COVER = 2000   # per distinct query term present
FR_W_PHRASE = 5000  # exact analyzed-phrase hit
FR_W_PROX = 100     # per point of adjacent-term closeness under the cap
FR_GAP_CAP = 10     # gaps >= cap (or undefined) contribute nothing


def feature_rerank(
    docs: DataFrame,
    query: str,
    k: int = 10,
    depth: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """REAL second-stage reranker over hand features — the
    learning-to-rank shape (BM25 + coverage + exact-phrase + term
    proximity with fixed integer weights: the classic LTR feature set,
    e.g. Liu 2009's survey) filling the slot :func:`rerank_stub` keeps
    open for a neural cross-encoder. Unlike the stub's md5 fake, every
    feature here is a genuine relevance signal AND exactly
    SQL-restatable, so the whole candidate-cut -> feature-extract ->
    rescore -> re-rank path is driver-gated value-for-value
    (ext_feature_rerank).

    Features per candidate (terms from the shared analyzer):
    - bm25_micro: the first-stage score in integer micro-space
      (floor(score·10⁴ + 0.5) of the 4dp-rounded double — identical on
      both engines);
    - cover: how many distinct query terms appear;
    - phrase: 1 if the analyzed terms appear CONSECUTIVELY (the
      "spark join window" run, not just the bag);
    - min_gap: smallest position distance between any adjacent query
      term pair, capped at FR_GAP_CAP (closer terms ⇒ more credit;
      missing pairs contribute the cap ⇒ zero credit).

    score_micro = bm25_micro + cover·W_COVER + phrase·W_PHRASE +
    (cap − min_gap)·W_PROX — all-integer, so ties and ordering are
    bit-stable across engines, partitionings, and replays (the q9b
    discipline applied to a rescoring stage).

    Scale shape: the first stage cuts the corpus to ``depth`` rows
    (TakeOrderedAndProject), so feature extraction — position arrays
    via one filter(sequence) per term over the bound token array, pair
    products bounded by tf·tf — touches O(depth) documents however
    large the corpus; the final sort is a ≤depth-row
    TakeOrderedAndProject."""
    from .text import analyze, analyze_keyword

    terms = analyze_keyword(query)
    if not terms:
        raise ValueError("query analyzes to no terms")
    cands = bm25_topk(docs, query, id_col, text_col, k=depth)
    with_toks = cands.join(
        docs.select(F.col(id_col), analyze(text_col).alias("toks")), id_col
    )
    pos = [
        F.expr(
            f"filter(sequence(1, size(toks)), i -> element_at(toks, i) = '{t}')"
        ).alias(f"p{i}")
        for i, t in enumerate(terms)
    ]
    f = with_toks.select(id_col, "score", "toks", *pos)

    cover = sum(
        (F.size(f"p{i}") > 0).cast("int") for i in range(len(terms))
    ).alias("cover")
    gaps = [
        F.least(
            F.coalesce(
                F.expr(
                    f"array_min(flatten(transform(p{i}, "
                    f"p -> transform(p{i + 1}, q -> abs(p - q)))))"
                ).cast("int"),
                F.lit(FR_GAP_CAP),
            ),
            F.lit(FR_GAP_CAP),
        )
        for i in range(len(terms) - 1)
    ]
    min_gap = (F.least(*gaps) if len(gaps) > 1 else gaps[0]) if gaps else F.lit(
        FR_GAP_CAP
    )
    if len(terms) == 1:
        phrase = (F.size("p0") > 0).cast("int")
    else:
        # each conjunct coalesced to false: try_element_at past the
        # array end yields NULL, and under exists()'s three-valued
        # logic `true AND NULL` would make the whole exists NULL (a
        # doc ending mid-phrase) instead of false — the DuckDB
        # oracle's list_filter counts it as 0, so Spark must too
        conj = " AND ".join(
            f"coalesce(try_element_at(toks, p + {j}) = '{terms[j]}', false)"
            for j in range(1, len(terms))
        )
        phrase = F.expr(f"exists(p0, p -> {conj})").cast("int")

    scored = f.select(
        F.col(id_col),
        F.expr("CAST(floor(score * 10000 + 0.5) AS BIGINT)").alias("bm25_micro"),
        cover,
        phrase.alias("phrase"),
        min_gap.cast("int").alias("min_gap"),
    ).select(
        id_col,
        (
            F.col("bm25_micro")
            + F.col("cover").cast("long") * FR_W_COVER
            + F.col("phrase").cast("long") * FR_W_PHRASE
            + (F.lit(FR_GAP_CAP) - F.col("min_gap")).cast("long") * FR_W_PROX
        ).cast("long").alias("score_micro"),
        "cover",
        "phrase",
        "min_gap",
    )
    return scored.orderBy(F.desc("score_micro"), F.asc(id_col)).limit(k)
