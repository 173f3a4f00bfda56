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
ONE indexing scan and persisted (lsh_write_index) partitioned by a
bucket prefix; a probe (lsh_index_topk) filters on the handful of
prefixes reachable within the Hamming budget, so the scan is
partition-pruned — only ~(prefix_bits + 1)/2^prefix_bits of the index
files are ever read per query, and the corpus is never re-sketched.
An IVF variant replaces the hash bucketing with learned centroids
(ivf_write_index below); the plumbing (bucket -> candidates -> exact
re-rank) is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

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


def lsh_write_index(
    embeddings: DataFrame,
    path: str,
    num_planes: int = 12,
    prefix_bits: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Persist the LSH sketch index partitioned by the sketch's high
    ``prefix_bits`` bits. Full-bucket partitioning (2^num_planes dirs)
    would drown in small files; a prefix keeps the directory count at
    2^prefix_bits while still letting every multi-probe query
    partition-prune: a Hamming-<=b probe can only reach buckets whose
    prefix differs from the query's in <= b of the prefix bit
    positions — at most sum_{i<=b} C(prefix_bits, i) prefixes, each a
    literal in the probe filter."""
    sk = embeddings.select(
        F.col(id_col),
        F.col(vec_col),
        _sketch_expr(vec_col, num_planes).alias("bucket"),
    )
    idx = sk.withColumn(
        "bprefix", F.shiftright(F.col("bucket"), num_planes - prefix_bits).cast("int")
    )
    idx.write.mode("overwrite").partitionBy("bprefix").parquet(path)


def lsh_read_index(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def lsh_index_topk(
    index: DataFrame,
    query: DataFrame,
    k: int = 10,
    num_planes: int = 12,
    prefix_bits: int = 6,
    probe_bits: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k against a persisted lsh_write_index table.

    The query sketch is one driver-side scalar (the sketch expression
    over the single-row query frame); the reachable bucket prefixes
    under the Hamming budget are enumerated driver-side into a literal
    IN filter, so the index scan partition-prunes before the exact
    per-candidate Hamming check and cosine re-rank. Same output
    contract as lsh_topk (score desc, id asc, 4dp)."""
    from itertools import combinations

    q_bucket = (
        query.select(_sketch_expr("q_vec", num_planes).alias("b")).collect()[0][0]  # collect-bound: 1 row (query sketch)
    )
    shift = num_planes - prefix_bits
    prefixes = {q_bucket >> shift}
    for r in range(1, probe_bits + 1):
        for bits in combinations(range(num_planes), r):
            flipped = q_bucket
            for b in bits:
                flipped ^= 1 << b
            prefixes.add(flipped >> shift)
    cands = index.filter(F.col("bprefix").isin(sorted(prefixes))).filter(
        F.bit_count(F.col("bucket").bitwiseXOR(F.lit(q_bucket))) <= probe_bits
    )
    scored = cands.crossJoin(F.broadcast(query)).select(
        F.col(id_col),
        F.round(cosine_expr(vec_col, "q_vec"), 4).alias("score"),
    )
    return scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)


# ---------------------------------------------------------------------------
# IVF (inverted-file index over k-means-style centroids)
# ---------------------------------------------------------------------------


def _to_double_list(v) -> list:
    return [float(x) for x in v]


def _centroid_literal(cents: list) -> F.Column:
    """k centroids (python lists) -> array<array<double>> literal column.
    Centroids are tiny (k × dim doubles); inlining them keeps cluster
    assignment a narrow map — no join, no shuffle."""
    return F.array(*[F.array(*[F.lit(float(x)) for x in c]) for c in cents])


# Above this many k*dim elements the centroid table rides as broadcast
# DATA instead of a plan literal: Catalyst's analysis/optimization cost
# over a lambda tree containing the literal grows with its size
# (measured on this box: 0.64 / 2.36 / 3.99 s PLAN-ONLY at k=16/64/128,
# dim 64, while execution stays ~0.1 s) — and a foreachBatch gate
# builds a fresh plan every micro-batch, so at k=128 every batch paid
# ~25 s of pure planning (r10 codebook-size sweep leg). 4096 keeps
# every existing small-codebook caller (k=16, dim 64 -> 1024) on the
# exact literal plan it had.
_CENTROID_LITERAL_MAX_ELEMENTS = 4096


def _with_cents(df: DataFrame, cents: list) -> DataFrame:
    """Attach the centroid table as a ``_cents`` column
    (array<array<double>>): inline literal for small codebooks (narrow
    map, zero extra plan nodes), a broadcast ONE-ROW cross join for
    large ones. The join form feeds the same doubles through the same
    zip_with/aggregate fold — element order and rounding identical, so
    assignments and probe lists are bit-identical across the
    threshold; it just moves the bytes out of the expression tree and
    into broadcast data, where plan analysis no longer walks them."""
    elems = len(cents) * (len(cents[0]) if cents else 0)
    if elems <= _CENTROID_LITERAL_MAX_ELEMENTS:
        return df.withColumn("_cents", _centroid_literal(cents))
    cdf = df.sparkSession.createDataFrame(
        [([[float(x) for x in c] for c in cents],)],
        "_cents array<array<double>>",
    )
    return df.crossJoin(F.broadcast(cdf))


def _assign_expr(vec_col: str, cents: list) -> F.Column:
    """argmin over centroids of squared L2 distance (0-based cluster id).
    Distances computed once per centroid; argmin via sorting the tiny
    (dist, idx) struct array — ties break to the lowest index."""
    k = len(cents)
    return F.expr(
        "element_at(array_sort(transform(sequence(0, {k} - 1), c -> struct("
        " aggregate(zip_with({v}, element_at(_cents, c + 1), "
        "   (x, m) -> (cast(x as double) - m) * (cast(x as double) - m)), "
        "  0D, (acc, y) -> acc + y) as d, c as c))), 1).c".format(k=k, v=vec_col)
    ).cast("int")


def ivf_train(
    embeddings: DataFrame,
    k: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list:
    """Deterministic k-means-lite centroids.

    Init: the k vectors with the smallest xxhash64(id) (a deterministic
    uniform sample — no RNG state). Then ``iters`` Lloyd rounds, each
    one distributed pass: assign (narrow map against broadcast-literal
    centroids) -> per-cluster per-dimension mean (posexplode + one
    shuffle on (cluster, dim)). Centroids live on the driver between
    rounds — k × dim doubles, trivially small; the DATA never leaves
    executors.
    """
    seeds = (
        embeddings.select(F.col(vec_col).alias("v"), F.xxhash64(id_col).alias("h"))
        .orderBy("h")
        .limit(k)
        .collect()  # collect-bound: limit(k) seed rows
    )
    cents = [_to_double_list(r.v) for r in seeds]
    for _ in range(iters):
        # Lloyd assign step: same backend split as ivf_probe_clusters —
        # at sqrt(n)-sized codebooks the SQL fold's per-element lambda
        # interpretation would make TRAINING pay N*k*dim steps per
        # round (the round-11 semantic-gate wall, at corpus scale)
        if k * (len(cents[0]) if cents else 0) > _PROBE_FOLD_MAX_ELEMENTS:
            assigned = _probe_clusters_numpy(
                embeddings.select(F.col(vec_col)), cents, 1, vec_col
            ).select(
                F.element_at("probe_clusters", 1).alias("cluster"),
                F.col(vec_col).alias("v"),
            )
        else:
            assigned = _with_cents(embeddings, cents).select(
                _assign_expr(vec_col, cents).alias("cluster"),
                F.col(vec_col).alias("v"),
            )
        dims = assigned.select(
            "cluster", F.posexplode(F.col("v")).alias("dim", "x")
        )
        means = (
            dims.groupBy("cluster", "dim")
            .agg(F.avg(F.col("x").cast("double")).alias("m"))
            .groupBy("cluster")
            .agg(F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("dm"))
            .select("cluster", F.col("dm.m").alias("centroid"))
            .collect()  # collect-bound: <= n_clusters centroid rows
        )
        new_cents = list(cents)
        for r in means:
            new_cents[r.cluster] = _to_double_list(r.centroid)
        cents = new_cents
    return cents


def ivf_assign(
    embeddings: DataFrame,
    centroids: list,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The inverted-list table: (id, vector, cluster). Train-once
    artifact — persist/write it partitioned by cluster so probes
    partition-prune instead of re-assigning the corpus per query.
    Backend split as in :func:`ivf_probe_clusters`: corpus-sized
    assignment at a sqrt(n) codebook through the SQL fold would pay
    N*k*dim interpreted lambda steps."""
    k = len(centroids)
    if k * (len(centroids[0]) if centroids else 0) > _PROBE_FOLD_MAX_ELEMENTS:
        return _probe_clusters_numpy(
            embeddings.select(F.col(id_col), F.col(vec_col)),
            centroids, 1, vec_col,
        ).select(
            F.col(id_col),
            F.col(vec_col),
            F.element_at("probe_clusters", 1).alias("cluster"),
        )
    return _with_cents(embeddings, centroids).select(
        F.col(id_col),
        F.col(vec_col),
        _assign_expr(vec_col, centroids).alias("cluster"),
    )


# Above this many k x dim codebook elements the per-row SQL
# higher-order-function fold becomes the dominant wall: Spark
# evaluates transform/zip_with/aggregate lambdas per ELEMENT through
# interpreted expression paths, so a batch pays B*k*dim lambda steps —
# measured ~30 ns/element (12.5k rows x k=2000 x dim=64 = 1.6G steps =
# ~50 s/round, the entire semantic-gate wall at sqrt(n) codebooks;
# round-11 decomposition). The numpy backend computes the same
# nprobe-nearest list via one BLAS matmul (~100x less wall). The
# threshold IS _CENTROID_LITERAL_MAX_ELEMENTS' value: beyond it the
# codebook already rides as broadcast data (the "large codebook"
# regime), so the backend boundary coincides with the existing
# layout boundary; every small-k caller (all registry entries, the
# k=16 gates) keeps the SQL fold bit-for-bit.
_PROBE_FOLD_MAX_ELEMENTS = 4096


def _make_blas_nearest():
    """Factory for the shared worker-side BLAS argmin kernel (closure:
    cloudpickle ships it BY VALUE — the PNG-codec discipline; a
    module-level helper would pickle by reference and fail to import
    on plain-session executors). Distances are squared L2 as
    |v|^2 - 2 v.C^T + |c|^2 in float64; ties break to the lowest
    centroid index via stable argsort — the single definition both the
    IVF probe and the PQ encoder ride, so the tie rule can never
    diverge between them."""

    def nearest(V, C, c2, npb):
        import numpy as np

        d = (V * V).sum(axis=1)[:, None] - 2.0 * (V @ C.T) + c2[None, :]
        return np.argsort(d, axis=1, kind="stable")[:, :npb]

    return nearest


_blas_nearest = _make_blas_nearest()


def uniform_centroids(k: int, dim: int) -> list:
    """Deterministic uniform codebook in [-1, 1]^dim from pure integer
    arithmetic — the shared fixture/bench generator (bench_gate's
    sweeps, ext_ivf_bigk_probe's oracle restates the same formula in
    SQL): cent[i][j] = ((i*1000003 + j*7919) * 2654435761 % 1e6) / 5e5 - 1."""
    return [
        [
            ((i * 1_000_003 + j * 7_919) * 2_654_435_761 % 1_000_000)
            / 500_000.0
            - 1.0
            for j in range(dim)
        ]
        for i in range(k)
    ]


def _probe_clusters_numpy(
    df: DataFrame, centroids: list, nprobe: int, vec_col: str
) -> DataFrame:
    """Arrow-batched BLAS backend for :func:`ivf_probe_clusters` at
    large k. Distances are squared L2 computed as |v|^2 - 2 v.C^T +
    |c|^2 in float64 — mathematically the SQL fold's sum but with BLAS
    summation order, so per-distance values can differ by ~1 ulp; a
    near-tie across centroids could therefore order differently than
    the SQL fold. The IVF contract already treats the probe list as
    part of the FROZEN offline artifact (assignment must be a pure
    function of batch content under ONE configuration), and backend
    selection is by codebook size — deterministic per deployment — so
    replays converge exactly as before; flipping backends mid-stream
    is the same class of config change as retraining centroids.
    Ties break to the lowest centroid id (stable argsort), matching
    the SQL struct-sort rule.

    Honest boundary: rows whose vector is NULL or whose length differs
    from the codebook's dim RAISE here (the SQL fold silently NULLs
    their distances) — a mixed-dim corpus on the large-codebook path
    is malformed input; quarantine with embedding_health upstream."""
    import numpy as np

    k = len(centroids)
    npb = min(nprobe, k)
    dim = len(centroids[0])
    cents = [list(map(float, c)) for c in centroids]
    in_schema = df.schema
    out_schema = T.StructType(
        in_schema.fields
        + [T.StructField("probe_clusters", T.ArrayType(T.IntegerType()))]
    )

    def probe(batches):
        import numpy as _np
        import pandas as _pd

        C = _np.asarray(cents, dtype=_np.float64)  # k x dim
        c2 = (C * C).sum(axis=1)  # k
        for pdf in batches:
            if len(pdf) == 0:
                out = pdf.copy()
                out["probe_clusters"] = _pd.Series([], dtype=object)
                yield out
                continue
            vecs = list(pdf[vec_col])
            for v in vecs:
                if v is None or len(v) != dim:
                    raise ValueError(
                        "large-codebook probe path requires every vector "
                        f"to be non-null with dim={dim}; got "
                        f"{'null' if v is None else len(v)} — filter or "
                        "quarantine (embedding_health) upstream"
                    )
            V = _np.asarray([_np.asarray(v, dtype=_np.float64) for v in vecs])
            order = _blas_nearest(V, C, c2, npb)
            out = pdf.copy()
            out["probe_clusters"] = [
                [int(x) for x in row] for row in order
            ]
            yield out

    return df.mapInPandas(probe, out_schema)


def ivf_probe_clusters(
    df: DataFrame,
    centroids: list,
    nprobe: int = 2,
    vec_col: str = "embedding",
) -> DataFrame:
    """Add ``probe_clusters``: each row's ``nprobe`` nearest centroid
    ids (squared L2, ties to the lowest id — the ivf_topk probe rule
    applied per row instead of per driver-side query). Narrow map; the
    consumer explodes it to join against a cluster-partitioned index
    with partition pruning intact. The first element IS the row's
    cluster assignment (identical sort rule to _assign_expr), so a
    consumer needing both pays the k distance folds once:
    ``F.element_at("probe_clusters", 1)`` — the semantic gate does
    exactly this.

    Backend: the SQL fold up to _PROBE_FOLD_MAX_ELEMENTS codebook
    elements (bit-stable for every existing caller), the Arrow/BLAS
    map (:func:`_probe_clusters_numpy`) beyond it — at sqrt(n)-sized
    codebooks the per-element lambda interpretation of the fold IS the
    gate's wall (see the threshold comment)."""
    k = len(centroids)
    if k * (len(centroids[0]) if centroids else 0) > _PROBE_FOLD_MAX_ELEMENTS:
        return _probe_clusters_numpy(df, centroids, nprobe, vec_col)
    expr = (
        "transform(slice(array_sort(transform(sequence(0, {k} - 1), c -> struct("
        " aggregate(zip_with({v}, element_at(_cents, c + 1), "
        "   (x, m) -> (cast(x as double) - m) * (cast(x as double) - m)), "
        "  0D, (acc, y) -> acc + y) as d, c as c))), 1, {np}), s -> s.c)"
    ).format(k=k, v=vec_col, np=min(nprobe, k))
    return (
        _with_cents(df, centroids)
        .withColumn("probe_clusters", F.expr(expr).cast("array<int>"))
        .drop("_cents")
    )


def ivf_write_index(
    embeddings: DataFrame,
    centroids: list,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Persist the inverted lists partitioned by cluster: a probe that
    filters on cluster ids becomes a partition-pruned scan — only
    nprobe/k of the index files are ever read per query."""
    ivf_assign(embeddings, centroids, id_col, vec_col).write.mode(
        "overwrite"
    ).partitionBy("cluster").parquet(path)


def ivf_read_index(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def ivf_topk(
    embeddings: DataFrame,
    query: DataFrame,
    k: int = 10,
    n_clusters: int = 16,
    nprobe: int = 4,
    iters: int = 2,
    centroids: list | None = None,
    assignment: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: restrict the exact re-rank to the
    ``nprobe`` clusters whose centroids are nearest the query vector.

    At scale the index (centroids + the (cluster, vec_id) assignment)
    is trained once and persisted; per query only the probed clusters'
    partitions scan — pass ``centroids`` (and optionally the
    ``assignment`` inverted-list DataFrame from ivf_assign, ideally
    written out partitioned by cluster so the probe partition-prunes)
    to reuse a trained index.
    """
    if centroids is None:
        centroids = ivf_train(embeddings, n_clusters, iters, id_col, vec_col)
    qv = _to_double_list(query.select("q_vec").collect()[0][0])  # collect-bound: 1 row (query vector)
    # driver-side probe selection: nprobe nearest centroids to q
    dists = sorted(
        (sum((a - b) * (a - b) for a, b in zip(c, qv)), i)
        for i, c in enumerate(centroids)
    )
    probed = [i for _, i in dists[:nprobe]]  # 0-based, matches _assign_expr
    if assignment is None:
        assignment = ivf_assign(embeddings, centroids, id_col, vec_col)
    candidates = assignment.filter(F.col("cluster").isin(probed))
    scored = candidates.crossJoin(F.broadcast(query)).select(
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
    max_bucket: int | None = None,
) -> DataFrame:
    """Embedding near-duplicate pairs: LSH-bucket candidates (equal
    sketch), exact cosine verification >= threshold. The O(n^2) blowup
    is confined to same-bucket groups (expected n / 2^planes each).

    Same shape as neardup._bucket_pairs: the sketch is computed ONCE
    map-side, one shuffle on the bucket key, pairs generated inside
    each bucket — no self-join re-evaluating the sketch pipeline.
    ``max_bucket=None`` inherits the kernel's DEFAULT_MAX_BUCKET
    salting bound (the hot-bucket OOM guard).

    Norms ride along in the bucket payload, computed once per VECTOR;
    each of the O(|bucket|^2) pair scores is then one dot product plus
    a divide — same arithmetic as cosine_expr (DOT / (NORM * NORM)),
    just never recomputing a norm per pair.
    """
    from .neardup import DEFAULT_MAX_BUCKET, _bucket_pairs

    if max_bucket is None:
        max_bucket = DEFAULT_MAX_BUCKET
    banded = embeddings.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("v"),
        F.expr(NORM.format(a=vec_col)).alias("nrm"),
        F.lit(0).alias("band"),
        _sketch_expr(vec_col, num_planes).alias("bh"),
    )
    pairs = _bucket_pairs(
        banded,
        [F.col("vid"), F.col("v"), F.col("nrm")],
        max_bucket=max_bucket,
        spread_pairs=embeddings.sparkSession.sparkContext.defaultParallelism,
    ).select(
        F.col("p.x.vid").alias("i"),
        F.col("p.y.vid").alias("j"),
        # zero-norm guard: under ANSI mode (Spark 4 default) 0/0 THROWS
        # instead of yielding NULL/NaN — a single malformed vector would
        # kill the whole pair job. when() makes the pair score NULL,
        # which the >= filter drops — the same effective semantics as
        # DuckDB's IEEE NaN failing the comparison.
        F.when(
            (F.col("p.x.nrm") > 0) & (F.col("p.y.nrm") > 0),
            F.round(
                F.expr(DOT.format(a="p.x.v", b="p.y.v"))
                / (F.col("p.x.nrm") * F.col("p.y.nrm")),
                4,
            ),
        ).alias("cosine"),
    )
    return pairs.filter(F.col("cosine") >= threshold)


# ---------------------------------------------------------------------------
# Semantic dedup (SemDeDup-shaped: quantize to a codebook, dedup
# within cells — Abbas et al. 2023, "SemDeDup: Data-efficient learning
# at web-scale through semantic deduplication")
# ---------------------------------------------------------------------------
def train_label_codebook(
    embeddings: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> list:
    """Deterministic codebook: the per-label mean vector, ordered by
    label ascending -> [(label, centroid), ...]. One distributed pass
    (posexplode + groupBy(label, dim) avg); the result is k x dim
    doubles on the driver — broadcast-literal material, like ivf_train.
    Unlike ivf_train's hash-seeded k-means this codebook is exactly
    reproducible in ANSI SQL, so semantic dedup keeps a full DuckDB
    oracle."""
    rows = (
        embeddings.select(label_col, F.posexplode(F.col(vec_col)).alias("dim", "x"))
        .groupBy(label_col, "dim")
        .agg(F.avg(F.col("x").cast("double")).alias("m"))
        .groupBy(label_col)
        .agg(F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("dm"))
        .select(F.col(label_col).alias("lbl"), F.col("dm.m").alias("centroid"))
        .orderBy("lbl")
        .collect()  # collect-bound: <= n_clusters centroid rows
    )
    return [(r.lbl, _to_double_list(r.centroid)) for r in rows]


def assign_codebook(
    embeddings: DataFrame,
    codebook: list,
    vec_col: str = "embedding",
) -> DataFrame:
    """Add a ``cluster`` column: the LABEL of the nearest codebook
    centroid by squared L2 (ties -> lowest label; labels are sorted in
    the codebook so argmin index order == label order). Narrow map
    against broadcast-literal centroids — no join, no shuffle; a vector
    may land on a different label than its own (that's quantization)."""
    cents = [c for _, c in codebook]
    labels = F.array(*[F.lit(int(l)) for l, _ in codebook])
    return _with_cents(embeddings, cents).withColumn(
        "cluster", F.element_at(labels, _assign_expr(vec_col, cents) + 1)
    ).drop("_cents")


def semantic_dedup_pairs(
    assigned: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int | None = None,
) -> DataFrame:
    """Within-cluster near-duplicate pairs (i < j, cosine >= threshold,
    4dp-rounded for engine portability). The O(n^2) is confined to a
    codebook cell — the SemDeDup bargain: at 100 TB the codebook grows
    (more cells, ~sqrt scaling per cell) and the hot-cell salting cap
    bounds the worst case exactly like MinHash buckets. Norms are
    computed once per vector and carried in the cell payload, so each
    pair score is a single dot product + divide (identical arithmetic
    to cosine_expr, which also divides the dot by the norm product).
    An existing ``nrm`` column on ``assigned`` is REUSED (the semantic
    gate materializes it once into its persisted batch frame); absent
    one, the norm fold runs here."""
    from .neardup import DEFAULT_MAX_BUCKET, _bucket_pairs

    if max_bucket is None:
        max_bucket = DEFAULT_MAX_BUCKET
    nrm = (
        F.col("nrm")
        if "nrm" in assigned.columns
        else F.expr(NORM.format(a=vec_col))
    )
    banded = assigned.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("v"),
        nrm.alias("nrm"),
        F.lit(0).alias("band"),
        F.col("cluster").alias("bh"),
    )
    pairs = _bucket_pairs(
        banded,
        [F.col("vid"), F.col("v"), F.col("nrm")],
        max_bucket=max_bucket,
        spread_pairs=assigned.sparkSession.sparkContext.defaultParallelism,
    ).select(
        F.col("p.x.vid").alias("i"),
        F.col("p.y.vid").alias("j"),
        # zero-norm guard (see cosine_neardup_pairs): ANSI 0/0 throws;
        # when() -> NULL -> dropped by the >= filter, matching the
        # oracle's IEEE-NaN comparison behavior
        F.when(
            (F.col("p.x.nrm") > 0) & (F.col("p.y.nrm") > 0),
            F.round(
                F.expr(DOT.format(a="p.x.v", b="p.y.v"))
                / (F.col("p.x.nrm") * F.col("p.y.nrm")),
                4,
            ),
        ).alias("cosine"),
    )
    return pairs.filter(F.col("cosine") >= threshold)


def semantic_pairs_driver(
    rows: list,
    threshold: float,
    max_bucket: int | None = None,
) -> list:
    """Driver-side numpy twin of :func:`semantic_dedup_pairs` for a
    COLLECTED micro-batch: same-cell (i, j) pairs with 4dp HALF_UP
    rounded cosine >= threshold. ``rows`` are (id, cluster, vec, nrm);
    zero-norm rows never pair (the when()-NULL drop of the SQL form).

    Semantics parity with the distributed kernel, point by point:
    ALL of a cell's members — zero-norm and dimension-mismatched rows
    included — are sorted by id (the payload-struct sort — ids are
    unique, so struct order IS id order) and chunked into contiguous
    sub-buckets of ``max_bucket`` (neardup._bucket_pairs' hot-bucket
    cap: cross-chunk pairs are traded away, intra-chunk edges kept;
    unmatchable rows still OCCUPY chunk slots exactly as they do in
    the distributed sorted array — filtering them first would shift
    chunk boundaries and change which pairs the cap trades away).
    Within a chunk, only same-length positive-norm pairs score (the
    SQL form's behavior: zip_with pads a length mismatch with NULL
    and the fold collapses to NULL; zero norms NULL out under the
    when() guard — both drop at the filter, never crash), as
    dot / (nrm_i * nrm_j) — the same formula shape as the SQL DOT
    fold, BLAS sum order differing by ~1 ulp (the cosine_match_scan
    numeric contract). The micro-batch is bounded by construction
    (the semantic gate's broadcast cap), so the O(chunk²) matmuls run
    in-process where the distributed form paid a shuffle + per-pair
    array allocation.
    """
    import numpy as np

    from .neardup import DEFAULT_MAX_BUCKET

    if max_bucket is None:
        max_bucket = DEFAULT_MAX_BUCKET
    by_cluster: dict = {}
    for rid, c, v, nrm in rows:
        by_cluster.setdefault(int(c), []).append((rid, v, nrm))
    pairs: list = []
    for _, rs in by_cluster.items():
        rs.sort(key=lambda r: r[0])
        for s in range(0, len(rs), max_bucket):
            chunk = rs[s : s + max_bucket]
            by_dim: dict = {}
            for rid, v, nrm in chunk:
                if nrm is None or not nrm > 0:
                    continue  # matches nothing; slot already counted
                by_dim.setdefault(len(v), []).append((rid, v, nrm))
            for grp in by_dim.values():
                if len(grp) < 2:
                    continue
                ids = [r[0] for r in grp]
                v = np.array([r[1] for r in grp], dtype=np.float64)
                nrm = np.array([r[2] for r in grp], dtype=np.float64)
                m = (v @ v.T) / np.outer(nrm, nrm)
                r4 = np.floor(np.abs(m) * 1e4 + 0.5) * 1e-4 * np.sign(m)
                ii, jj = np.nonzero(np.triu(r4 >= threshold, k=1))
                pairs.extend((ids[a], ids[b]) for a, b in zip(ii, jj))
    return pairs


def cosine_match_scan(
    index_df: DataFrame,
    probes: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    cluster_col: str = "cluster",
    vec_col: str = "embedding",
    nrm_col: str = "nrm",
    row_chunk: int = 4096,
) -> DataFrame:
    """Which probe vectors have ANY index vector in their probed
    cluster with 4dp-rounded cosine >= ``threshold``? Map-only BLAS
    scan — the vectorized twin of the exploded probe⋈index join the
    semantic gate originally ran (streaming/pipelines.py:
    semantic_gate_admit), built for the regime where the index is
    large and the probe set is a bounded micro-batch.

    ``probes`` carries one row per (query, probed cluster):
    (id_col, cluster_col, vec_col, nrm_col), zero-norm queries already
    excluded by the caller (cosine is undefined on them, and they must
    match nothing — the gate's zero-norm contract). The WHOLE probe
    frame is collected and broadcast: the caller bounds it by
    construction (a micro-batch × nprobe — the same bounded-broadcast
    class as the ANN query batches above). The index side streams
    through ``mapInPandas`` untouched: no shuffle, no explode, no
    per-pair array allocation — each Arrow batch is grouped by cluster
    and scored against that cluster's probe matrix with ONE numpy
    matmul (index rows chunked at ``row_chunk`` to bound the temp).

    Why this beats the join form by ~5x wall: Catalyst evaluates the
    ``aggregate(zip_with(...))`` dot as an interpreted fold allocating
    a fresh 64-element array per candidate PAIR (~10M pairs/batch at
    realistic sizes), where BLAS does the same flops in one dgemm.

    Numeric contract: scores are rounded HALF_UP at 4dp (numpy
    ``floor(|x|·1e4 + 0.5)``, matching Spark's ``F.round``) before the
    >= compare, so the decision boundary is the same as the SQL path's
    ``F.round(cos, 4) >= threshold``; BLAS dot-sum order differs from
    the SQL fold's left-to-right order by ~1 ulp, which can flip a
    score EXACTLY at a 4dp rounding boundary — inside the gate's
    stated approximation contract (the nprobe cell miss is a far
    larger tolerance), and replay-deterministic since replays run the
    same kernel on the same bytes.

    Returns a DataFrame with the distinct matched probe ids
    (column ``id_col``, probe-side dtype preserved).
    """
    id_type = dict(probes.dtypes)[id_col]
    rows = probes.select(id_col, cluster_col, vec_col, nrm_col).collect()  # collect-bound: ELEMENTS-budgeted probe batch
    packed = pack_probe_matrices(
        (r[0], r[1], r[2], r[3]) for r in rows
    )
    return cosine_match_scan_packed(
        index_df, packed, threshold, id_col, id_type,
        cluster_col, vec_col, nrm_col, row_chunk,
    )


def pack_probe_matrices(probe_rows) -> dict:
    """(id, cluster, vec, nrm) rows -> {(cluster, dim): (ids,
    unit-vector matrix)} for :func:`cosine_match_scan_packed`.
    Zero/negative-norm rows are dropped (cosine undefined; the gate's
    zero-norm contract says they match nothing). Keying by (cluster,
    DIMENSION) makes a ragged corpus safe: a probe only ever scores
    against index vectors of its own length — the SQL form's zip_with
    pads a length mismatch with NULL and drops the pair, where a
    naive matmul over mixed lengths would raise and wedge the
    foreachBatch sink (round-8 review finding)."""
    import numpy as np

    by_cell: dict = {}
    for qid, c, v, nrm in probe_rows:
        if nrm is None or not nrm > 0:
            continue
        by_cell.setdefault((int(c), len(v)), []).append((qid, v, nrm))
    packed = {}
    for key, rs in by_cell.items():
        ids = [r[0] for r in rs]
        q = np.array([r[1] for r in rs], dtype=np.float64)
        nrm = np.array([r[2] for r in rs], dtype=np.float64)
        packed[key] = (ids, q / nrm[:, None])
    return packed


def cosine_match_scan_packed(
    index_df: DataFrame,
    packed: dict,
    threshold: float,
    id_col: str = "vec_id",
    id_type: str = "bigint",
    cluster_col: str = "cluster",
    vec_col: str = "embedding",
    nrm_col: str = "nrm",
    row_chunk: int = 4096,
) -> DataFrame:
    """:func:`cosine_match_scan` with the probe matrices already packed
    ({(cluster, dim): (ids, unit-row matrix)} — see
    :func:`pack_probe_matrices`) — the semantic gate builds the pack
    once from its collected batch and reuses it here. Index rows are
    scored only against the probe matrix matching their (cluster,
    vector length); mismatched-length and zero-norm index rows match
    nothing, exactly as the SQL probe join drops them, instead of
    crashing the matmul."""
    spark = index_df.sparkSession
    if not packed:
        return spark.createDataFrame([], f"{id_col} {id_type}")
    bc = spark.sparkContext.broadcast(packed)

    def scan(batches):
        import numpy as np
        import pandas as pd

        data = bc.value
        matched: set = set()
        for pdf in batches:
            for c, grp in pdf.groupby(cluster_col, sort=False):
                nrm = np.array(
                    [x if x is not None else 0.0 for x in grp[nrm_col]],
                    dtype=np.float64,
                )
                vecs = list(grp[vec_col])
                lens = np.fromiter(
                    (len(v) if v is not None else -1 for v in vecs),
                    dtype=np.int64,
                )
                for dim in np.unique(lens):
                    entry = data.get((int(c), int(dim)))
                    if entry is None:
                        continue
                    ids, qn = entry
                    live = (lens == dim) & (nrm > 0)
                    if not live.any():
                        continue
                    o = np.array(
                        [np.asarray(vecs[k], dtype=np.float64)
                         for k in np.nonzero(live)[0]]
                    ) / nrm[live][:, None]
                    for s in range(0, len(o), row_chunk):
                        m = o[s : s + row_chunk] @ qn.T
                        r4 = (
                            np.floor(np.abs(m) * 1e4 + 0.5)
                            * 1e-4
                            * np.sign(m)
                        )
                        hit = (r4 >= threshold).any(axis=0)
                        matched.update(ids[k] for k in np.nonzero(hit)[0])
        if matched:
            yield pd.DataFrame({id_col: sorted(matched)})

    return (
        index_df.select(cluster_col, vec_col, nrm_col)
        .mapInPandas(scan, schema=f"{id_col} {id_type}")
        .dropDuplicates()
    )


def semantic_dedup_keep(
    assigned: DataFrame,
    pairs: DataFrame,
    id_col: str = "vec_id",
) -> DataFrame:
    """Keep-canonical selection: drop a vector iff some LOWER-id vector
    in the same cell is cosine-similar to it (j of any qualifying pair
    — min-id-wins, the same canonical rule as the fingerprint dedup
    family). Anti-join on the pair's higher id; adds boolean ``kept``."""
    dropped = pairs.select(F.col("j").alias(id_col)).distinct()
    return assigned.join(dropped.withColumn("_drop", F.lit(True)),
                         on=id_col, how="left").withColumn(
        "kept", F.col("_drop").isNull()
    ).drop("_drop")


def ivf_append_index(
    new_embeddings: DataFrame,
    centroids: list,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Incremental index maintenance: assign NEW vectors with the
    FROZEN trained centroids and append their inverted-list rows into
    the existing partitioned layout. Freezing the codebook is the
    production pattern (FAISS/IVF alike): assignments stay consistent
    with everything already indexed, probes need no re-read of old
    data, and retraining is an explicit offline event (rewrite via
    ivf_write_index when drift warrants it). The append only writes
    files under the cluster= partitions the batch touches."""
    ivf_assign(new_embeddings, centroids, id_col, vec_col).write.mode(
        "append"
    ).partitionBy("cluster").parquet(path)


# ---------------------------------------------------------------------------
# Product quantization (PQ): the memory-side half of the IVF-PQ ANN
# design. IVF (above) prunes WHICH vectors a query scans; PQ compresses
# WHAT each scanned vector costs — dim x 4 bytes shrinks to m code
# bytes (64 floats -> 8 bytes at m=8), so a 100 TB raw embedding corpus
# probes from a ~1.5 TB code table that fits hot storage. Jegou et al.
# 2011 ("Product quantization for nearest neighbor search").
# ---------------------------------------------------------------------------
L2SQ = (
    "aggregate(zip_with({a}, {b}, (x, y) -> "
    "(cast(x as double) - cast(y as double)) * (cast(x as double) - cast(y as double))), "
    "0D, (acc, v) -> acc + v)"
)


def pq_train(
    embeddings: DataFrame,
    m: int = 8,
    ksub: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> list:
    """Train per-subspace codebooks: the vector splits into ``m``
    contiguous slices and each slice gets its own ``ksub``-centroid
    k-means-lite (same deterministic xxhash64 seeding and Lloyd
    structure as :func:`ivf_train`, no RNG). Returns ``m`` codebooks of
    ksub x (dim/m) doubles — a few KB, a driver/broadcast artifact like
    the IVF centroids.

    All m subspaces train TOGETHER: one seed collect (the same ksub
    smallest-hash vectors seed every subspace's slice), then per Lloyd
    round a single corpus pass — assignment for all m slices in one
    narrow map (the :func:`pq_encode` expression), then one
    (subspace, code, dim) mean shuffle whose key space is m x ksub x
    dim/m cells regardless of corpus size. m sequential trainers would
    cost m x iters passes for identical math."""
    if dim is None:
        dim = len(embeddings.select(vec_col).first()[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible into {m} subspaces")
    dsub = dim // m
    seeds = (
        embeddings.select(F.col(vec_col).alias("v"), F.xxhash64(id_col).alias("h"))
        .orderBy("h")
        .limit(ksub)
        .collect()  # collect-bound: limit(ksub) seed rows
    )
    books = [
        [_to_double_list(r.v)[s * dsub : (s + 1) * dsub] for r in seeds]
        for s in range(m)
    ]
    for _ in range(iters):
        enc = _pq_encode_with_vec(embeddings, books, id_col, vec_col)
        cells = (
            enc.select(F.col("codes"), F.posexplode(F.col(vec_col)).alias("dim", "x"))
            .select(
                F.expr(f"cast(dim div {dsub} as int) as s"),
                F.expr(f"element_at(codes, cast(dim div {dsub} as int) + 1) as c"),
                "dim",
                F.col("x").cast("double").alias("x"),
            )
            .groupBy("s", "c", "dim")
            .agg(F.avg("x").alias("mu"))
            .collect()  # collect-bound: ksub x subspaces codebook rows
        )
        new_books = [[list(c) for c in book] for book in books]
        for r in cells:
            new_books[r.s][r.c][r.dim - r.s * dsub] = float(r.mu)
        books = new_books
    return books


def _pq_encode_with_vec(
    embeddings: DataFrame,
    codebooks: list,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, vec, codes) — the shared assignment kernel: every subspace
    slice argmins against its broadcast-literal codebook in one
    projection (no join, no shuffle). Backend split as in
    :func:`ivf_probe_clusters`: above _PROBE_FOLD_MAX_ELEMENTS total
    codebook elements the SQL fold pays rows x m x ksub x dsub
    interpreted lambda steps — at a production ksub=256 codebook the
    corpus-encode pass (the one table PQ persists at scale) would
    crawl for exactly the round-11 semantic-gate reason."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    if sum(len(b) * dsub for b in codebooks) > _PROBE_FOLD_MAX_ELEMENTS:
        return _pq_encode_numpy(embeddings, codebooks, id_col, vec_col)
    out = embeddings.select(id_col, vec_col)
    code_cols = []
    for s in range(m):
        cname = f"_c{s}"
        out = out.withColumn(f"_cents_{s}", _centroid_literal(codebooks[s]))
        sliced = f"slice({vec_col}, {s * dsub + 1}, {dsub})"
        out = out.withColumn(
            cname,
            F.expr(
                "element_at(array_sort(transform(sequence(0, {k} - 1), c -> struct("
                " aggregate(zip_with({v}, element_at(_cents_{s}, c + 1), "
                "   (x, mm) -> (cast(x as double) - mm) * (cast(x as double) - mm)), "
                "  0D, (acc, y) -> acc + y) as d, c as c))), 1).c".format(
                    k=len(codebooks[s]), v=sliced, s=s
                )
            ).cast("int"),
        )
        code_cols.append(cname)
    return out.select(
        id_col,
        vec_col,
        F.array(*[F.col(c) for c in code_cols]).alias("codes"),
    )


def _pq_encode_numpy(
    embeddings: DataFrame,
    codebooks: list,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Arrow/BLAS twin of the PQ assignment kernel for large
    codebooks: per subspace one float64 matmul + stable argmin (ties
    to the lowest code, the SQL struct-sort rule). Same honest
    boundary as :func:`_probe_clusters_numpy`: a NULL vector or one
    shorter than m x dsub raises (the SQL fold silently NULLs its
    distances); longer vectors use their first m x dsub elements,
    exactly like the SQL slice."""
    import numpy as np

    m = len(codebooks)
    dsub = len(codebooks[0][0])
    need = m * dsub
    books = [[list(map(float, c)) for c in b] for b in codebooks]
    in_schema = embeddings.select(id_col, vec_col).schema
    out_schema = T.StructType(
        in_schema.fields + [T.StructField("codes", T.ArrayType(T.IntegerType()))]
    )

    def encode(batches):
        import numpy as _np
        import pandas as _pd

        Cs = [_np.asarray(b, dtype=_np.float64) for b in books]
        c2s = [(C * C).sum(axis=1) for C in Cs]
        for pdf in batches:
            if len(pdf) == 0:
                out = pdf.copy()
                out["codes"] = _pd.Series([], dtype=object)
                yield out
                continue
            vecs = list(pdf[vec_col])
            for v in vecs:
                if v is None or len(v) < need:
                    raise ValueError(
                        "large-codebook PQ encode requires every vector "
                        f"to be non-null with >= {need} elements; got "
                        f"{'null' if v is None else len(v)}"
                    )
            V = _np.asarray(
                [_np.asarray(v[:need], dtype=_np.float64) for v in vecs]
            )
            codes = _np.empty((len(vecs), m), dtype=_np.int64)
            for s in range(m):
                Vs = V[:, s * dsub : (s + 1) * dsub]
                codes[:, s] = _blas_nearest(Vs, Cs[s], c2s[s], 1)[:, 0]
            out = pdf.copy()
            out["codes"] = [[int(x) for x in row] for row in codes]
            yield out

    return embeddings.select(id_col, vec_col).mapInPandas(encode, out_schema)


def pq_encode(
    embeddings: DataFrame,
    codebooks: list,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int>): each subspace slice snaps to its nearest
    sub-centroid — one narrow map against broadcast-literal codebooks
    (the same no-join/no-shuffle assignment discipline as
    :func:`ivf_assign` / :func:`assign_codebook`). THIS is the table
    that persists at scale; the raw vectors only ever stream past the
    encoder once."""
    return _pq_encode_with_vec(embeddings, codebooks, id_col, vec_col).select(
        id_col, "codes"
    )


def pq_adc_scores(
    codes: DataFrame,
    codebooks: list,
    query_vec: list,
    id_col: str = "vec_id",
) -> DataFrame:
    """Asymmetric Distance Computation: the query precomputes ONE
    m x ksub lookup table of slice-to-sub-centroid squared distances
    (driver arithmetic on the tiny codebooks), and every database
    vector's approximate L2^2 is just m table lookups summed — no
    vector arithmetic, no decode, a narrow map over the code table.
    Returns (id, adc) with adc = sum_s lut[s][code_s]."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    lut = [
        [
            sum(
                (query_vec[s * dsub + j] - c[j]) ** 2 for j in range(dsub)
            )
            for c in codebooks[s]
        ]
        for s in range(m)
    ]
    lut_lit = F.array(
        *[F.array(*[F.lit(float(x)) for x in row]) for row in lut]
    )
    return codes.withColumn("_lut", lut_lit).select(
        id_col,
        F.expr(
            f"aggregate(sequence(0, {m - 1}), 0D, "
            "(acc, s) -> acc + element_at(element_at(_lut, s + 1), "
            "element_at(codes, s + 1) + 1))"
        ).alias("adc"),
    )


def pq_topk(
    embeddings: DataFrame,
    codes: DataFrame,
    codebooks: list,
    query: DataFrame,
    k: int = 10,
    rerank: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ search with exact re-rank: ADC scores the whole code table
    (narrow map), the best ``rerank`` candidates — and ONLY those —
    fetch their raw vectors (a k-sized broadcast-able semi-join at any
    scale) for exact L2, and the final top-``k`` orders by true
    distance. Returns (id, l2sq rounded 4dp)."""
    qv = _to_double_list(query.select("q_vec").collect()[0][0])  # collect-bound: 1 row (query vector)
    cand = (
        pq_adc_scores(codes, codebooks, qv, id_col)
        .orderBy(F.asc("adc"), F.asc(id_col))
        .limit(rerank)
    )
    exact = embeddings.join(F.broadcast(cand.select(id_col)), id_col).crossJoin(
        F.broadcast(query)
    )
    return (
        exact.select(
            id_col,
            F.round(F.expr(L2SQ.format(a=vec_col, b="q_vec")), 4).alias("l2sq"),
        )
        .orderBy(F.asc("l2sq"), F.asc(id_col))
        .limit(k)
    )


def ivfpq_topk(
    embeddings: DataFrame,
    centroids: list,
    codebooks: list,
    query: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    rerank: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The composite IVF-PQ search (FAISS's production workhorse,
    Jegou et al. 2011 §V, by_residual=False variant): the coarse
    quantizer prunes WHICH vectors are scanned (the query's ``nprobe``
    nearest cells out of ``len(centroids)``), PQ ADC prunes WHAT the
    scan costs (m table lookups per candidate instead of a dim-wide
    dot product), and only the ``rerank`` best ADC candidates fetch
    raw vectors for exact L2. At 100 TB the corpus lives as a
    cell-partitioned code table (pq_write_index clustered by the
    ivf_assign cell): a query reads nprobe/k_coarse of the files,
    scans codes not vectors, and the exact re-rank is a broadcast
    semi-join of ``rerank`` ids — no full scan at any step.

    Determinism contract (what the declared oracle relies on): the
    query's probe cells use the same sorted-(distance, cell) tie rule
    as :func:`ivf_probe_clusters`, computed driver-side on the tiny
    codebook with left-to-right Python float sums; the ADC lookup
    table is built the same way, so a formula-literal codebook makes
    every double re-derivable bit-for-bit relationally. Returns
    (id, l2sq rounded 4dp), exact-distance ordered, ties to low id."""
    qv = _to_double_list(query.select("q_vec").collect()[0][0])  # collect-bound: 1 row (query vector)
    probed = _driver_probe_cells(qv, centroids, nprobe)
    cand = ivf_assign(embeddings, centroids, id_col, vec_col).filter(
        F.col("cluster").isin(probed)
    )
    codes = pq_encode(cand.select(id_col, vec_col), codebooks, id_col, vec_col)
    return _ivfpq_rerank(
        embeddings, codes, codebooks, query, qv, k, rerank, id_col, vec_col
    )


def _driver_probe_cells(qv: list, centroids: list, nprobe: int) -> list:
    """The query's probe cells, computed driver-side on the tiny
    codebook — same left-to-right float sums and sorted-(distance,
    cell) tie rule as :func:`ivf_probe_clusters`, pinned by test."""
    dists = [
        (sum((qv[j] - c[j]) ** 2 for j in range(len(c))), ci)
        for ci, c in enumerate(centroids)
    ]
    return [ci for _, ci in sorted(dists)[:nprobe]]


def _ivfpq_rerank(
    embeddings, codes, codebooks, query, qv, k, rerank, id_col, vec_col
):
    shortlist = (
        pq_adc_scores(codes, codebooks, qv, id_col)
        .orderBy(F.asc("adc"), F.asc(id_col))
        .limit(rerank)
    )
    exact = embeddings.join(
        F.broadcast(shortlist.select(id_col)), id_col
    ).crossJoin(F.broadcast(query))
    return (
        exact.select(
            id_col,
            F.round(F.expr(L2SQ.format(a=vec_col, b="q_vec")), 4).alias("l2sq"),
        )
        .orderBy(F.asc("l2sq"), F.asc(id_col))
        .limit(k)
    )


def ivfpq_write_index(
    embeddings: DataFrame,
    centroids: list,
    codebooks: list,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """The IVF-PQ rest layout: (id, codes) parquet PARTITIONED BY the
    coarse cell. This is the artifact a 100 TB corpus queries from —
    the raw vectors stream past assignment + encode ONCE at ingest
    (two narrow maps; the id-join here is ingest-time cost, never
    query-time), and every later query partition-prunes to
    nprobe/k_coarse of the files and scans m-byte codes, not vectors.
    The exact re-rank joins back to the raw table by id for only the
    shortlist."""
    assigned = ivf_assign(embeddings, centroids, id_col, vec_col).select(
        id_col, F.col("cluster").cast("int").alias("cluster")
    )
    codes = pq_encode(embeddings, codebooks, id_col, vec_col)
    assigned.join(codes, id_col).write.mode("overwrite").partitionBy(
        "cluster"
    ).parquet(path)


def ivfpq_topk_stored(
    embeddings: DataFrame,
    codes: DataFrame,
    centroids: list,
    codebooks: list,
    query: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    rerank: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The RECURRING query path of :func:`ivfpq_topk` against the
    stored cell-partitioned code table (:func:`ivfpq_write_index`):
    probe cells driver-side, partition-pruned code scan, ADC
    shortlist, exact re-rank. Same results as the inline form by
    construction (same codebooks, same tie rules); the inline form is
    the declared oracle anchor, this is what production runs per
    query."""
    qv = _to_double_list(query.select("q_vec").collect()[0][0])  # collect-bound: 1 row (query vector)
    probed = _driver_probe_cells(qv, centroids, nprobe)
    cand_codes = codes.filter(F.col("cluster").isin(probed))
    return _ivfpq_rerank(
        embeddings, cand_codes, codebooks, query, qv, k, rerank, id_col, vec_col
    )


def pq_write_index(
    embeddings: DataFrame,
    codebooks: list,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Persist the PQ code table: (id, codes) parquet — m bytes-worth
    of small ints per vector instead of the raw floats. This is the
    point of PQ at 100 TB: the encoder streams the corpus ONCE at
    ingest (narrow map, no shuffle), and every later query scans only
    this compact table. Searching through a freshly-built encode plan
    instead would re-pay the m x ksub argmin expression per query —
    measured ~11x slower at sf0.1 than scanning stored codes."""
    pq_encode(embeddings, codebooks, id_col, vec_col).write.mode(
        "overwrite"
    ).parquet(path)


def pq_read_index(spark: SparkSession, path: str) -> DataFrame:
    """The stored code table, ready for :func:`pq_adc_scores` /
    :func:`pq_topk`."""
    return spark.read.parquet(path)


# ---------------------------------------------------------------------------
# Scalar quantization (int8) — the 4x-compression ANN variant
# ---------------------------------------------------------------------------


def sq8_train(
    embeddings: DataFrame, vec_col: str = "embedding"
) -> tuple[list[float], list[float]]:
    """Per-dimension (min, max) over the corpus — the scalar-quantizer
    codebook. One posexplode + groupBy over dim (bounded output: one
    row per dimension, 64 here), collected to the driver like the
    k-means codebook (train_label_codebook): at any corpus size the
    result is dim-sized, and min/max partial-aggregate map-side."""
    mm = (
        embeddings.select(F.posexplode(vec_col).alias("dim", "v"))
        .groupBy("dim")
        .agg(
            F.min(F.col("v").cast("double")).alias("lo"),
            F.max(F.col("v").cast("double")).alias("hi"),
        )
    )
    rows = sorted(mm.collect(), key=lambda r: r.dim)  # collect-bound: dim min/max rows
    return [r.lo for r in rows], [r.hi for r in rows]


def _sq8_literals(lo: list[float], hi: list[float]):
    return (
        F.array(*[F.lit(float(x)) for x in lo]),
        F.array(*[F.lit(float(x)) for x in hi]),
    )


def sq8_encode(
    embeddings: DataFrame,
    lo: list[float],
    hi: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes): each float32 dimension mapped to an int code in
    0..255 — code_i = floor((x_i - lo_i) / (hi_i - lo_i) * 255 + 0.5),
    constant dims code to 0. 4x smaller than float32 at rest and on
    the probe scan; a narrow map over broadcast-literal (lo, hi)
    arrays, no shuffle."""
    lov, hiv = _sq8_literals(lo, hi)
    codes = F.transform(
        F.sequence(F.lit(1), F.size(vec_col)),
        lambda i: F.when(
            F.element_at(hiv, i) > F.element_at(lov, i),
            F.floor(
                (F.element_at(F.col(vec_col), i).cast("double") - F.element_at(lov, i))
                / (F.element_at(hiv, i) - F.element_at(lov, i))
                * F.lit(255.0)
                + F.lit(0.5)
            ).cast("int"),
        ).otherwise(F.lit(0)),
    )
    return embeddings.select(F.col(id_col), codes.alias("codes"))


def sq8_dequantize(codes_col, lo: list[float], hi: list[float]):
    """Column expr: reconstruct doubles from int codes —
    lo_i + code_i * (hi_i - lo_i) / 255."""
    lov, hiv = _sq8_literals(lo, hi)
    codes_col = F.col(codes_col) if isinstance(codes_col, str) else codes_col
    return F.zip_with(
        codes_col,
        F.sequence(F.lit(1), F.size(codes_col)),
        lambda c, i: F.when(
            F.element_at(hiv, i) > F.element_at(lov, i),
            F.element_at(lov, i)
            + c.cast("double")
            * (F.element_at(hiv, i) - F.element_at(lov, i))
            / F.lit(255.0),
        ).otherwise(F.element_at(lov, i)),
    )


def sq8_topk(
    embeddings: DataFrame,
    query: DataFrame,
    lo: list[float],
    hi: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k cosine over DEQUANTIZED int8 codes against a full-
    precision query (the standard SQ8 search: compress the corpus,
    keep the query exact). The scoring path goes through the stored
    codes — encode -> dequantize -> cosine — so it exercises exactly
    what a persisted int8 index serves. Same plan shape as
    cosine_topk: narrow map + broadcast 1-row query +
    TakeOrderedAndProject (no global sort); at 100 TB the scan reads
    1/4 the bytes of the float32 corpus."""
    codes = sq8_encode(embeddings, lo, hi, id_col=id_col, vec_col=vec_col)
    dv = codes.select(
        F.col(id_col), sq8_dequantize("codes", lo, hi).alias("dv")
    )
    joined = dv.crossJoin(F.broadcast(query))
    scored = joined.select(
        F.col(id_col),
        F.round(cosine_expr("dv", "q_vec"), 4).alias("score"),
    )
    return scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)


def sq8_write_index(
    embeddings: DataFrame,
    lo: list[float],
    hi: list[float],
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Persist the int8 code table (path/codes) and the per-dim (lo,
    hi) quantizer params (path/params: one row per dim) — the at-rest
    form of the 4x compression: probes read codes only, never the
    float32 corpus. Appending a new batch is one sq8_encode write with
    the FROZEN params (the ivf_append_index discipline: retraining
    per batch would silently re-scale old codes)."""
    spark = embeddings.sparkSession
    sq8_encode(embeddings, lo, hi, id_col=id_col, vec_col=vec_col).write.mode(
        "overwrite"
    ).parquet(f"{path}/codes")
    params = spark.createDataFrame(
        [(i, float(l), float(h)) for i, (l, h) in enumerate(zip(lo, hi))],
        ["dim", "lo", "hi"],
    )
    params.coalesce(1).write.mode("overwrite").parquet(f"{path}/params")


def sq8_read_index(
    spark: SparkSession, path: str
) -> tuple[DataFrame, list[float], list[float]]:
    """(codes, lo, hi) from a sq8_write_index layout."""
    codes = spark.read.parquet(f"{path}/codes")
    rows = sorted(spark.read.parquet(f"{path}/params").collect(),  # collect-bound: dim param rows
                  key=lambda r: r.dim)
    return codes, [r.lo for r in rows], [r.hi for r in rows]


def sq8_index_topk(
    codes: DataFrame,
    query: DataFrame,
    lo: list[float],
    hi: list[float],
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k served from the persisted code table: dequantize + cosine
    against the full-precision query — must reproduce sq8_topk
    bit-for-bit (same dequant expression, same 4dp round, same
    tiebreak), since both paths score the identical integer codes."""
    dv = codes.select(F.col(id_col), sq8_dequantize("codes", lo, hi).alias("dv"))
    scored = dv.crossJoin(F.broadcast(query)).select(
        F.col(id_col),
        F.round(cosine_expr("dv", "q_vec"), 4).alias("score"),
    )
    return scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)


# ---------------------------------------------------------------------------
# Greedy k-center coreset (farthest-point traversal)
# ---------------------------------------------------------------------------
def _d2_expr(vec_col: str, center: list[float]):
    """Squared euclidean distance to a literal center, decomposed as
    ip(v,v) - 2*ip(v,c) + ip(c,c) with every inner product the
    module's sequential DOT — the SAME algebraic form the DuckDB
    oracle states with list_inner_product, so the doubles agree
    bit-for-bit (the proven cosine-parity idiom)."""
    c = "array(" + ", ".join(f"CAST({x!r} AS DOUBLE)" for x in center) + ")"
    ip_vv = DOT.format(a=vec_col, b=vec_col)
    ip_vc = DOT.format(a=vec_col, b=c)
    ip_cc = sum(x * x for x in center)
    return F.expr(f"{ip_vv} - 2 * ({ip_vc}) + CAST({ip_cc!r} AS DOUBLE)")


def kcenter_coreset(
    embeddings: DataFrame,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Greedy k-center (farthest-point) coreset selection: seed with
    the minimum id, then k-1 times pick the point FARTHEST from its
    nearest already-selected center (squared euclidean; ties -> min
    id). The classic 2-approximation to the k-center objective
    (Gonzalez 1985, public) and the standard diversity-selection /
    coreset recipe for training-data curation: the selected rows
    maximally cover the embedding space, the opposite bias of
    semantic dedup's cluster-collapse.

    Scale shape: k bounded and small by construction (a coreset IS a
    small set), so this is k-1 narrow map passes — each row evaluates
    at most k-1 literal-center distances fused into the scan by
    codegen — plus a top-1 TakeOrdered per round (no global sort
    materialization, nothing shuffles but one row). The selected
    centers ride as broadcast literals (the semantic-dedup codebook
    discipline). For k beyond a few hundred, switch to the sampled
    variant (gmm++ style over a uniform pre-sample) — same plumbing.

    Returns (sel_order, id_col, d2) where d2 is the 4dp-rounded
    squared distance at selection time (0.0 for the seed).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    # one job, not two: the row count (k validation) and the seed (min
    # id row — ids are unique, so the struct min is the min-id row)
    # come out of a single aggregate (r12; each extra blocking job on
    # the greedy path is pure driver latency, guide §1.2)
    first = embeddings.agg(
        F.count("*").alias("n"),
        F.min(F.struct(F.col(id_col), F.col(vec_col))).alias("s"),
    ).collect()[0]  # collect-bound: 1-row agg
    n = first["n"]
    if n < k:
        raise ValueError(f"kcenter_coreset: k={k} exceeds {n} input rows")
    seed = first["s"]
    selected = [(1, seed[0], 0.0)]
    centers = [[float(x) for x in seed[1]]]
    base = embeddings.select(id_col, vec_col)
    for r in range(2, k + 1):
        dmin = F.least(*[_d2_expr(vec_col, c) for c in centers]) if len(centers) > 1 else _d2_expr(vec_col, centers[0])
        far = (
            base.select(id_col, vec_col, dmin.alias("d2"))
            # order on the UNROUNDED distance (the oracle does too);
            # round only the displayed value, in Spark (HALF_UP)
            .orderBy(F.desc("d2"), F.asc(id_col))
            .limit(1)
            .select(id_col, vec_col, F.round("d2", 4).alias("d24"))
            .collect()[0]  # collect-bound: limit(1)
        )
        selected.append((r, far[0], far[2]))
        centers.append([float(x) for x in far[1]])
    spark = embeddings.sparkSession
    id_type = dict(embeddings.dtypes)[id_col]
    return spark.createDataFrame(
        selected, f"sel_order int, {id_col} {id_type}, d2 double"
    ).orderBy("sel_order")


def knn_label_propagation(
    emb: DataFrame,
    query_mod: int = 50,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Pseudo-labeling by k-nearest-neighbor vote: for each query
    vector (here the deterministic ``id % query_mod == 0`` slice,
    standing in for the unlabeled batch), predict the majority label
    of its k nearest labeled neighbors (cosine, self excluded) — the
    weak-supervision recipe that turns a small labeled seed into
    training labels for the rest of the corpus.

    Deterministic end to end: neighbors rank on the 4dp-rounded
    similarity with the id tiebreak (the cosine_topk discipline), the
    vote breaks ties (count DESC, label ASC). Returns
    (vec_id, true_label, predicted_label, votes) per query — keeping
    the held-out true label beside the prediction makes the output
    double as a label-agreement audit.

    Scale shape: the query side is bounded BY CONSTRUCTION (a
    pseudo-label batch), so it rides a broadcast against the corpus —
    a narrow map per corpus partition, the semantic_decontam
    asymmetry. The per-query neighbor rank is the brute-force kNN
    cost (this is the exact ORACLE baseline, like ext_cosine_topk);
    at corpus scale the candidate set comes from the IVF/LSH bucket
    probe instead (ivf_topk / lsh_topk) and the vote is unchanged.
    """
    from pyspark.sql.window import Window

    queries = emb.filter((F.col(id_col) % query_mod) == 0).select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        F.col(label_col).alias("true_label"),
    )
    cands = emb.select(id_col, vec_col, label_col).crossJoin(F.broadcast(queries))
    sims = cands.filter(F.col(id_col) != F.col("q_id")).select(
        "q_id",
        "true_label",
        F.col(label_col).alias("nbr_label"),
        F.col(id_col).alias("nbr_id"),
        F.round(cosine_expr(vec_col, "q_vec"), 4).alias("sim4"),
    )
    wn = Window.partitionBy("q_id").orderBy(F.desc("sim4"), F.asc("nbr_id"))
    topk = sims.withColumn("_rn", F.row_number().over(wn)).filter(
        F.col("_rn") <= k
    )
    votes = topk.groupBy("q_id", "true_label", "nbr_label").agg(
        F.count("*").cast("long").alias("votes")
    )
    wv = Window.partitionBy("q_id").orderBy(
        F.desc("votes"), F.asc("nbr_label")
    )
    return (
        votes.withColumn("_rk", F.row_number().over(wv))
        .filter(F.col("_rk") == 1)
        .select(
            F.col("q_id").alias(id_col),
            "true_label",
            F.col("nbr_label").alias("predicted_label"),
            "votes",
        )
    )


def embedding_health(
    df: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-column QA report, per label: the checks an ANN/semdedup
    stage runs BEFORE trusting a 100 TB vector table — ragged
    dimensions (one bad producer shard), non-finite entries (fp16
    overflow upstream), zero-norm rows (cosine is undefined; every
    kernel here would divide by zero), and the norm envelope
    (un-normalized batches show up as avg-norm outliers).

    One narrow map pass: each per-vector statistic is a higher-order
    fold over the array (JVM, whole-stage codegen, fixed left-to-right
    order so the DuckDB oracle's list_aggregate folds bit-identically),
    then one partial-aggregated groupBy on the label. Returns
    (label, n_vecs, dim_min, dim_max, n_nonfinite, n_zero_norm,
    avg_norm, min_norm, max_norm) with norm doubles rounded to 4 dp.
    """
    v = F.col(vec_col)
    sumsq = F.aggregate(
        F.transform(v, lambda x: x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x * x,
    )
    # NULL elements count as non-finite too (round-6 ADVICE): isnan(NULL)
    # is NULL, so without the isNull arm a vector with a NULL entry got
    # nf=0 yet a NULL norm — reported in NEITHER n_nonfinite NOR
    # n_zero_norm, exactly the malformed-producer case this QA exists
    # to catch.
    nonfinite = F.aggregate(
        v,
        F.lit(0).cast("long"),
        lambda acc, x: acc
        + F.when(
            x.isNull() | F.isnan(x.cast("double")) | (F.abs(x) == float("inf")), 1
        )
        .otherwise(0)
        .cast("long"),
    )
    # norm stats are over FINITE vectors only: a single NaN entry would
    # otherwise poison the whole label's envelope (NaN sorts greatest
    # in Spark, so max_norm would read NaN forever) — the report flags
    # the bad vectors in n_nonfinite and keeps the envelope usable.
    per_vec = df.select(
        F.col(label_col).alias("label"),
        F.size(v).cast("long").alias("dim"),
        nonfinite.alias("nf"),
        F.when(nonfinite == 0, F.sqrt(sumsq)).alias("norm"),
    )
    return (
        per_vec.groupBy("label")
        .agg(
            F.count("*").cast("long").alias("n_vecs"),
            F.min("dim").alias("dim_min"),
            F.max("dim").alias("dim_max"),
            F.sum("nf").cast("long").alias("n_nonfinite"),
            F.sum((F.col("norm") == 0.0).cast("long")).cast("long").alias(
                "n_zero_norm"
            ),
            F.round(F.avg("norm"), 4).alias("avg_norm"),
            F.round(F.min("norm"), 4).alias("min_norm"),
            F.round(F.max("norm"), 4).alias("max_norm"),
        )
        .orderBy("label")
    )
