"""Near-duplicate detection: exact token-set Jaccard, MinHash+LSH,
SimHash — the large-scale training-data dedup family.

All signature computation is built-in Column expressions (xxhash64,
higher-order array functions) — JVM-side, codegen'd, no Python UDFs.

Scale design:
- Signatures (a few hundred bytes) are computed map-side; only
  signatures and ids shuffle, never document text.
- Candidate generation is a band-bucket self-join: docs sharing a band
  bucket meet in one shuffle partition. Bucket sizes are bounded in
  practice; a hot bucket (e.g. empty-doc signature) is AQE skew-split.
- Verification joins candidate pairs back to token sets by doc id —
  two broadcast-or-shuffle hash joins on narrow keys.

Exact pairwise Jaccard (token_jaccard_pairs) is O(n^2) in the worst
case and exists as (a) the verification kernel and (b) the oracle-
checkable declared query on a bounded partition (per-language). The
scale path is minhash_near_duplicates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import tokens

# ---------------------------------------------------------------------------
# exact token-set Jaccard
# ---------------------------------------------------------------------------


def token_sets(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.array_distinct(tokens(text_col)).alias("toks"),
    )


def token_jaccard_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """All pairs (i < j) with token-set Jaccard >= threshold.

    Exact algorithm: explode (doc, token), self-join on token to count
    intersections (only co-occurring pairs materialize — sparse, not a
    cross join), then |A ∪ B| = |A| + |B| − |A ∩ B|.
    """
    sets = token_sets(df, id_col, text_col)
    sizes = sets.select("doc_id", F.size("toks").alias("sz"))
    posting = sets.select("doc_id", F.explode("toks").alias("token"))
    a, b = posting.alias("a"), posting.alias("b")
    inter = (
        a.join(b, (F.col("a.token") == F.col("b.token")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("i"), F.col("b.doc_id").alias("j"))
        .agg(F.count("*").alias("inter"))
    )
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    return (
        inter.join(sa, F.col("i") == F.col("sa.doc_id"))
        .join(sb, F.col("j") == F.col("sb.doc_id"))
        .select(
            "i",
            "j",
            (F.col("inter") / (F.col("sa.sz") + F.col("sb.sz") - F.col("inter"))).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("i", "j", F.round("jaccard", 4).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def shingles(text_col, n: int = 3):
    """Word n-gram shingles as a distinct array (built-ins only)."""
    toks = tokens(text_col)
    return F.array_distinct(
        F.when(
            F.size(toks) >= n,
            F.expr(
                f"transform(sequence(1, size(split({text_col}, ' ')) - {n - 1}), "
                f"i -> concat_ws(' ', slice(split({text_col}, ' '), i, {n})))"
            ),
        ).otherwise(F.array(F.concat_ws(" ", toks)))
    )


def minhash_signature(df: DataFrame, num_hashes: int = 64, shingle_n: int = 3,
                      id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """num_hashes-wide MinHash signature per doc.

    Hash family: xxhash64(shingle, seed) for seed = 0..H-1 — xxhash64's
    multi-argument form mixes the seed column in, giving H independent
    64-bit functions with no Python involvement.
    """
    sh = shingles(text_col, shingle_n).alias("sh")
    sig = F.expr(
        "transform(sequence(0, {h} - 1), "
        "seed -> array_min(transform(sh, s -> xxhash64(s, seed))))".format(h=num_hashes)
    )
    return df.select(F.col(id_col).alias("doc_id"), sh).select(
        "doc_id", sig.alias("signature")
    )


def lsh_candidate_pairs(signatures: DataFrame, bands: int = 16) -> DataFrame:
    """Band the signature; docs sharing any band bucket become a
    candidate pair. rows_per_band = H / bands; P[candidate] follows the
    standard (1 - (1 - j^r)^b) S-curve.
    """
    sig_len_expr = F.size("signature")
    # band hash: xxhash64 over the band's slice, mixed with the band id
    banded = signatures.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, {bands} - 1), "
                f"b -> named_struct('band', b, 'bh', "
                f"xxhash64(cast(slice(signature, b * (size(signature) div {bands}) + 1, "
                f"size(signature) div {bands}) as string), b)))"
            )
        ).alias("bb"),
    ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("i"), F.col("b.doc_id").alias("j"))
        .dropDuplicates(["i", "j"])
    )


def minhash_near_duplicates(
    df: DataFrame,
    threshold: float = 0.8,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Scale-path near-dup: MinHash signatures -> LSH banding ->
    candidate pairs -> exact shingle-Jaccard verification of candidates
    only. Output (i, j, jaccard) with jaccard >= threshold.
    """
    sigs = minhash_signature(df, num_hashes, shingle_n, id_col, text_col)
    cands = lsh_candidate_pairs(sigs, bands)
    sh = df.select(
        F.col(id_col).alias("doc_id"), shingles(text_col, shingle_n).alias("sh")
    )
    a, b = sh.alias("sa"), sh.alias("sb")
    verified = (
        cands.join(a, cands["i"] == F.col("sa.doc_id"))
        .join(b, cands["j"] == F.col("sb.doc_id"))
        .select(
            "i",
            "j",
            (
                F.size(F.array_intersect(F.col("sa.sh"), F.col("sb.sh")))
                / F.size(F.array_union(F.col("sa.sh"), F.col("sb.sh")))
            ).alias("jaccard"),
        )
    )
    return verified.filter(F.col("jaccard") >= threshold).select(
        "i", "j", F.round("jaccard", 4).alias("jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash64(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """64-bit SimHash over distinct tokens: bit b of the signature is 1
    iff sum over token-hashes of (+1 if hash bit b set else -1) > 0.
    Pure array expressions; one pass per doc.
    """
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.expr(
            "aggregate(transform(sequence(0, 63), b -> "
            " CASE WHEN aggregate(transform(array_distinct(split({t}, ' ')), tok -> "
            "   CASE WHEN ((xxhash64(tok) >> b) & 1) = 1 THEN 1 ELSE -1 END), "
            "  0, (acc, x) -> acc + x) > 0 THEN shiftleft(1L, b) ELSE 0L END), "
            "0L, (acc, x) -> acc | x)".format(t=text_col)
        ).alias("simhash"),
    )


def simhash_near_duplicates(df: DataFrame, max_hamming: int = 3,
                            id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Near-dup pairs with Hamming(simhash_i, simhash_j) <= max_hamming.

    Candidate generation: split the 64-bit signature into
    (max_hamming + 1) chunks — pigeonhole: any pair within the Hamming
    budget agrees exactly on at least one chunk — then exact bit_count
    verification on candidates. Chunk widths differ by at most one bit
    when (max_hamming + 1) does not divide 64.
    """
    n = min(max_hamming + 1, 64)
    base_w, extra = divmod(64, n)
    # chunk c: width w = base_w + (c < extra), start = c*base_w + min(c, extra)
    sigs = simhash64(df, id_col, text_col)
    chunks = sigs.select(
        "doc_id",
        "simhash",
        F.explode(
            F.expr(
                f"transform(sequence(0, {n - 1}), c -> named_struct("
                f"'c', c, 'v', (simhash >> (c * {base_w} + least(c, {extra}))) & "
                f"(shiftleft(1L, {base_w} + CASE WHEN c < {extra} THEN 1 ELSE 0 END) - 1)))"
            )
        ).alias("ch"),
    ).select("doc_id", "simhash", F.col("ch.c").alias("c"), F.col("ch.v").alias("v"))
    a, b = chunks.alias("a"), chunks.alias("b")
    return (
        a.join(
            b,
            (F.col("a.c") == F.col("b.c"))
            & (F.col("a.v") == F.col("b.v"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("i"),
            F.col("b.doc_id").alias("j"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .dropDuplicates(["i", "j"])
        .filter(F.col("hamming") <= max_hamming)
    )
