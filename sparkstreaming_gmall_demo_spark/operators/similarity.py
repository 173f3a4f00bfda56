"""Similarity search over embedding columns (array<float>).

- cosine_topk: exact brute-force top-k — the correctness baseline.
  Dot product and norms via higher-order array expressions in double
  precision (JVM, codegen); one pass over the table, TakeOrdered for
  the top-k (no global sort materialization).
- lsh_topk: random-hyperplane LSH bucketed search — the scale path.
  Deterministic +/-1 hyperplanes derived from xxhash64, so the sketch
  is reproducible with no RNG state. Probes the query's bucket (and
  optionally 1-bit neighbors), brute-forcing only candidates.

At 100 TB / billions of vectors: signatures are computed map-side in
one scan; the bucket index is a narrow (bucket, vec_id) table that
joins instead of scanning all vectors per query. An IVF variant would
replace the hash bucketing with learned centroids; the plumbing
(bucket -> candidates -> exact re-rank) is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DOT = "aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), 0D, (acc, v) -> acc + v)"
NORM = "sqrt(aggregate(transform({a}, x -> cast(x as double) * cast(x as double)), 0D, (acc, v) -> acc + v))"


def cosine_expr(a: str, b: str):
    """cosine(a, b) as a Column expression, double precision."""
    return F.expr(f"{DOT.format(a=a, b=b)} / ({NORM.format(a=a)} * {NORM.format(a=b)})")


def cosine_topk(
    embeddings: DataFrame,
    query: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine against a single-row ``query`` DataFrame
    (columns: q_vec). Deterministic ties: score desc, then id asc;
    score rounded to 4dp for oracle stability."""
    joined = embeddings.crossJoin(F.broadcast(query))
    scored = joined.select(
        F.col(id_col),
        F.round(cosine_expr(vec_col, "q_vec"), 4).alias("score"),
    )
    return scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)


def query_vector(embeddings: DataFrame, vec_id: int, id_col: str = "vec_id",
                 vec_col: str = "embedding") -> DataFrame:
    """The single-row query DataFrame for cosine_topk (data-derived, so
    no literals go stale as fixtures change)."""
    return embeddings.filter(F.col(id_col) == vec_id).select(F.col(vec_col).alias("q_vec"))


# ---------------------------------------------------------------------------
# LSH (random signed hyperplanes, deterministic)
# ---------------------------------------------------------------------------


def _sketch_expr(vec_col: str, num_planes: int):
    """Bit h of the sketch = sign of dot(vec, plane_h) where
    plane_h[d] = +1 if xxhash64(h * 1024 + d) is even else -1.
    Fully deterministic, no stored plane matrix."""
    return F.expr(
        "aggregate(transform(sequence(0, {p} - 1), h -> "
        " CASE WHEN aggregate(zip_with({v}, sequence(0, size({v}) - 1), "
        "   (x, d) -> cast(x as double) * CASE WHEN (xxhash64(h * 1024 + d) & 1) = 0 "
        "     THEN 1.0 ELSE -1.0 END), 0D, (acc, y) -> acc + y) > 0 "
        " THEN shiftleft(1L, h) ELSE 0L END), 0L, (acc, x) -> acc | x)".format(
            p=num_planes, v=vec_col
        )
    )


def lsh_topk(
    embeddings: DataFrame,
    query: DataFrame,
    k: int = 10,
    num_planes: int = 12,
    probe_bits: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: restrict the exact re-rank to vectors whose
    sketch is within ``probe_bits`` Hamming distance of the query's
    sketch (multi-probe), then score candidates exactly."""
    sketched = embeddings.withColumn("bucket", _sketch_expr(vec_col, num_planes))
    q = query.withColumn("q_bucket", _sketch_expr("q_vec", num_planes))
    joined = sketched.join(F.broadcast(q), F.lit(True))
    candidates = joined.filter(
        F.bit_count(F.col("bucket").bitwiseXOR(F.col("q_bucket"))) <= probe_bits
    )
    scored = candidates.select(
        F.col(id_col),
        F.round(cosine_expr(vec_col, "q_vec"), 4).alias("score"),
    )
    return scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)


def cosine_neardup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    num_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-duplicate pairs: LSH-bucket candidates (equal
    sketch), exact cosine verification >= threshold. The O(n^2) blowup
    is confined to same-bucket groups (expected n / 2^planes each).

    Same shape as neardup._bucket_pairs: the sketch is computed ONCE
    map-side, one shuffle on the bucket key, pairs generated inside
    each bucket — no self-join re-evaluating the sketch pipeline.
    """
    from .neardup import _bucket_pairs

    banded = embeddings.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("v"),
        F.lit(0).alias("band"),
        _sketch_expr(vec_col, num_planes).alias("bh"),
    )
    pairs = _bucket_pairs(banded, [F.col("vid"), F.col("v")]).select(
        F.col("p.x.vid").alias("i"),
        F.col("p.y.vid").alias("j"),
        F.round(cosine_expr("p.x.v", "p.y.v"), 4).alias("cosine"),
    )
    return pairs.filter(F.col("cosine") >= threshold)
