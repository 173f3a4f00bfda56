"""Deduplication operators.

Reference semantics reproduced:
- first-record-per-group in-batch dedup (reference
  handler/DauHandler.scala:17-22: groupByKey + sortWith(ts) + take(1))
- cross-batch day-scoped distinct (reference handler/DauHandler.scala:35-44,
  61-73: Redis SMEMBERS probe + SADD) -- in batch form a left-anti /
  row_number dedup; in streaming, ``dropDuplicates`` over the state
  store (see streaming.pipelines.dau).

Scale notes: ``first_per_group`` is one shuffle on the group key with
partial aggregation map-side (min_by), no window-sort needed for the
keep-first case; ``row_number`` variant kept for when the full row
ordering matters. Exact dedup is a hash aggregate, also one shuffle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def first_per_group(df: DataFrame, keys: Sequence[str], order: Sequence[str]) -> DataFrame:
    """Keep the first row per key group, ordered by ``order`` columns.

    row_number() over (partition by keys order by order) = 1 -- the
    declarative form of the reference's sortWith+take(1)
    (reference handler/DauHandler.scala:20).
    """
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).asc() for c in order])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def distinct_on(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Exact distinct on a key subset (keeps arbitrary-but-deterministic
    nothing else): projection + dropDuplicates = hash aggregate."""
    return df.select(*keys).dropDuplicates(list(keys))


def seen_filter(df: DataFrame, seen: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Left-anti join against an already-seen key set -- the batch analog
    of the Redis SMEMBERS dedup probe (reference handler/DauHandler.scala:35-44).
    """
    return df.join(seen.select(*keys).dropDuplicates(list(keys)), list(keys), "left_anti")


def exact_duplicate_groups(df: DataFrame, cols: Sequence[str], id_col: str) -> DataFrame:
    """Exact-duplicate detection: groups of rows identical on ``cols``.

    Returns one row per duplicated value-combination with the group
    size and the member ids (sorted for determinism). One hash-shuffle
    on the content hash; at 100 TB, hashing the (possibly long) content
    columns down to ``xxhash64`` first keeps shuffle rows narrow.
    """
    hashed = df.withColumn("__h", F.xxhash64(*cols))
    return (
        hashed.groupBy("__h")
        .agg(
            F.count("*").alias("dup_count"),
            F.sort_array(F.collect_list(id_col)).alias("member_ids"),
            F.first(cols[0]).alias(cols[0]),
        )
        .filter(F.col("dup_count") > 1)
        .drop("__h")
    )


def fingerprint_index(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The persistable corpus fingerprint index: distinct
    ``md5(lower(text))`` digests. 32-char strings — narrow enough to
    shuffle, persist (e.g. via streaming/txn.py merge_keyed) and probe
    for years of incremental ingest without ever re-reading the corpus
    text that produced them."""
    return (
        df.select(F.md5(F.lower(F.col(text_col))).alias("fingerprint"))
        .dropDuplicates(["fingerprint"])
    )


def novel_against_index(
    df: DataFrame, index: DataFrame, text_col: str = "text",
    broadcast_probe: bool = False,
) -> DataFrame:
    """Incremental dedup: keep only rows whose content fingerprint is
    NOT in the existing corpus index — the "what is actually new in
    today's crawl" gate every continuously-ingesting training-data
    pipeline runs before anything else.

    A left-anti hash join on the 32-char digest: the batch side
    computes fingerprints map-side and only digests shuffle, never
    text. Adds the ``fingerprint`` column so the caller can append the
    survivors straight back into the index (see
    streaming.pipelines.novelty_gate_pipeline for the streaming form
    of exactly that loop).

    ``broadcast_probe``: a left-anti join cannot broadcast its LEFT
    side, so the default plan sort-merge-shuffles BOTH sides — at
    100 TB of history that exchanges and sorts the entire digest index
    on every micro-batch. When the BATCH is bounded (the ingest-gate
    contract), invert the probe exactly like txn.merge_keyed's
    broadcast_probe: broadcast the batch digests INTO a semi-join over
    the index (the index is scanned map-side, never shuffled, never
    sorted), and broadcast the surviving hit set — at most
    |batch ∩ index| rows — back into the anti-join. Identical output;
    probe cost drops from O(index) shuffle+sort to one O(index)
    columnar scan of a single 32-byte column. Leave False for
    arbitrarily large batches (backfills), where broadcasting the
    batch digests would not fit the driver."""
    fp = df.withColumn("fingerprint", F.md5(F.lower(F.col(text_col))))
    idx = index.select("fingerprint")
    if broadcast_probe:
        batch_fps = fp.select("fingerprint").dropDuplicates()
        hits = idx.join(
            F.broadcast(batch_fps), "fingerprint", "left_semi"
        ).dropDuplicates(["fingerprint"])
        return fp.join(F.broadcast(hits), on="fingerprint", how="left_anti")
    return fp.join(
        idx.dropDuplicates(["fingerprint"]), on="fingerprint", how="left_anti"
    )


def novel_against_index_bloom(
    df: DataFrame,
    index: DataFrame,
    text_col: str = "text",
    nbits: int = None,
    k: int = None,
) -> DataFrame:
    """Bloom-prefiltered twin of :func:`novel_against_index` with
    IDENTICAL output (one-sided-error composition, not an
    approximation): a Bloom filter built over the index digests is
    broadcast to the probe stream; rows whose fingerprint the filter
    rejects are DEFINITELY novel (Bloom has no false negatives) and
    bypass the join entirely, and only the might-contain sliver —
    true duplicates plus the (1-e^(-kn/m))^k false-positive residue —
    pays the exact anti-join shuffle.

    At 100 TB of daily ingest where most content is novel, this turns
    the gate's shuffle from O(batch) to O(duplicates + fp·batch) while
    the filter itself stays nbits/8 bytes however large the index grows
    (size nbits for the expected index cardinality; ~10 bits/key gives
    ~1% fp)."""
    from . import sketch as sketch_ops

    kw = {}
    if nbits is not None:
        kw["nbits"] = nbits
    if k is not None:
        kw["k"] = k
    bloom = sketch_ops.bloom_build(
        index.select("fingerprint").dropDuplicates(["fingerprint"]), "fingerprint", **kw
    )
    fp = df.withColumn("fingerprint", F.md5(F.lower(F.col(text_col))))
    probed = sketch_ops.bloom_might_contain(fp, bloom, "fingerprint", **kw)
    definitely_novel = probed.filter(~F.col("might_contain")).drop("might_contain")
    maybe = probed.filter(F.col("might_contain")).drop("might_contain")
    checked = maybe.join(
        index.select("fingerprint").dropDuplicates(["fingerprint"]),
        on="fingerprint",
        how="left_anti",
    )
    return definitely_novel.unionByName(checked)


def soft_dedup_weights(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """SoftDeDup: keep every duplicate but DOWN-WEIGHT it by its
    multiplicity — weight = 1 / dup_count, frozen to integer
    micro-units (the sampling family's fixed-point discipline), so a
    training loader that consumes the weights sees exact, engine-
    portable integers. The published alternative to hard dropping
    (He et al. 2024 "SoftDedup", ACL — public paper): common text
    still contributes, just proportionally to its information content.

    Shape at 100 TB: fingerprint map-side (32-char md5 digests, the
    text never shuffles — operators/text.py:fingerprint), one shuffle
    to count per digest, one digest-keyed join back. Effective corpus
    size = sum(weight_micro) / 1e6 falls out of a single agg.

    Returns (id_col, dup_count, weight_micro).
    """
    from .text import fingerprint

    fp = fingerprint(df.select(id_col, text_col), text_col).select(
        id_col, "fingerprint"
    )
    counts = fp.groupBy("fingerprint").agg(
        F.count("*").cast("long").alias("dup_count")
    )
    return fp.join(counts, "fingerprint").select(
        F.col(id_col),
        F.col("dup_count"),
        F.round(F.lit(1e6) / F.col("dup_count")).cast("long").alias("weight_micro"),
    )


def source_dedup_report(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-source duplication audit: for every ingest source, how much
    of it is internally duplicated and how much of its content also
    appears under OTHER sources (mirrors, syndicated pages, re-crawled
    dumps — the first question a web-corpus curator asks before
    setting per-source mix weights; the source axis is the reference's
    per-channel monitoring counts, streaming/sinks.py:301, turned into
    a content-identity audit).

    Returns one row per source:
      n_docs        rows ingested from the source
      n_unique      distinct content fingerprints within the source
      dup_bp        internal duplication in integer basis points,
                    round((n_docs - n_unique) * 10000 / n_docs)
      cross_src_fps distinct fingerprints of this source that also
                    occur under at least one other source

    Shape at 100 TB: the text is digested map-side (md5, 32 chars) and
    never shuffles; one (source, fingerprint) hash aggregate feeds the
    per-source rollup, and the cross-source count reuses the SAME
    per-(source, fingerprint) frame — fingerprint-keyed combine to
    count sources per digest, then a digest-keyed join back. Both
    shuffles carry digests, both benefit from map-side partial
    aggregation; no step is quadratic in sources or documents.
    """
    from .text import fingerprint

    fp = fingerprint(df.select(source_col, text_col), text_col).select(
        source_col, "fingerprint"
    )
    per_src_fp = fp.groupBy(source_col, "fingerprint").agg(
        F.count("*").cast("long").alias("cnt")
    )
    src_counts = per_src_fp.groupBy(source_col).agg(
        F.sum("cnt").cast("long").alias("n_docs"),
        F.count("*").cast("long").alias("n_unique"),
    )
    fp_sources = per_src_fp.groupBy("fingerprint").agg(
        F.count("*").cast("long").alias("n_sources")
    )
    cross = (
        per_src_fp.join(fp_sources, "fingerprint")
        .filter(F.col("n_sources") >= 2)
        .groupBy(source_col)
        .agg(F.count("*").cast("long").alias("cross_src_fps"))
    )
    return (
        src_counts.join(cross, source_col, "left")
        .select(
            F.col(source_col),
            "n_docs",
            "n_unique",
            F.round(
                (F.col("n_docs") - F.col("n_unique")) * F.lit(10000.0) / F.col("n_docs")
            )
            .cast("long")
            .alias("dup_bp"),
            F.coalesce(F.col("cross_src_fps"), F.lit(0)).cast("long").alias("cross_src_fps"),
        )
    )


def normalization_dedup_report(
    df: DataFrame,
    lang_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Normalization-aware dedup delta: how many EXTRA duplicates a
    canonicalizing normalization (lowercase, strip non-alphanumerics,
    collapse whitespace) exposes beyond the raw lower(text)
    fingerprint — the standard pre-dedup text canonicalization
    (C4/CCNet-style) quantified per language, so a curator can see
    which slices are full of trivially-reformatted copies before
    choosing the fingerprint key.

    Returns per language: n_docs, uniq_raw, uniq_norm,
    norm_extra_dups = uniq_raw - uniq_norm (documents that are
    distinct as raw bytes but identical after canonicalization).

    Shape at 100 TB: both digests are computed map-side in the same
    scan projection (the text itself never shuffles) and feed one
    (lang)-keyed hash aggregate with map-side partials; the
    normalization is pure JVM string expressions inside whole-stage
    codegen.
    """
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9 ]", ""),
            " +",
            " ",
        )
    )
    digests = df.select(
        F.col(lang_col),
        F.md5(F.lower(F.col(text_col))).alias("fp_raw"),
        F.md5(norm).alias("fp_norm"),
    )
    return digests.groupBy(lang_col).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.count_distinct("fp_raw").alias("uniq_raw"),
        F.count_distinct("fp_norm").alias("uniq_norm"),
        (F.count_distinct("fp_raw") - F.count_distinct("fp_norm"))
        .cast("long")
        .alias("norm_extra_dups"),
    )
