"""Count-Min sketch frequency estimation — the mergeable-sketch scale
path for heavy-hitter queries.

The exact per-token top-k (operators/text.py:token_stats) shuffles one
row per DISTINCT token; at 100 TB of text the distinct-token tail is
itself huge. The Count-Min sketch caps the shuffle at depth x width
cells no matter how many distinct tokens exist: each partition
partial-aggregates its own d x w cell counts map-side (the sketch is a
counter matrix, i.e. trivially mergeable by addition — same property
HLL++ exploits in ext_approx_distinct), ONE bounded shuffle merges
them, and point estimates are min over the d cells a key hashes to.

Deterministic hash family: cell(d, t) = xxhash64(d, t) mod width — no
RNG state, so the sketch and every estimate are reproducible run to
run (the same design rule as the MinHash/SimHash/LSH family).

Guarantees (Cormode & Muthukrishnan 2005): estimates never
UNDER-count (each cell holds the key's true count plus non-negative
collision mass), and min-over-depth keeps the overshoot below
e/width x N with probability 1 - e^-depth per key. The declared query
(plans/extensions.py:ext_heavy_hitters) gates both properties in-plan
against the exact counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

CM_DEPTH = 4
CM_WIDTH = 1024


def _cell(token_col, d_col, width: int):
    return F.pmod(F.xxhash64(d_col, token_col), F.lit(width)).cast("int")


def cm_build(
    tokens: DataFrame,
    token_col: str = "token",
    depth: int = CM_DEPTH,
    width: int = CM_WIDTH,
) -> DataFrame:
    """Build the sketch from one-row-per-occurrence ``tokens``:
    returns (d, b, c) — depth x width cells. The explode multiplies
    rows by ``depth`` BEFORE the hash, but those rows are narrow
    (two ints) and collapse map-side to at most depth x width cells
    per partition before the single shuffle."""
    cells = tokens.select(
        F.explode(F.expr(f"sequence(0, {depth - 1})")).alias("d"),
        F.col(token_col).alias("t"),
    ).select("d", _cell(F.col("t"), F.col("d"), width).alias("b"))
    return cells.groupBy("d", "b").agg(F.count("*").alias("c"))


BLOOM_K = 5
BLOOM_NBITS = 1 << 16


def _bloom_positions_sql(key_col: str, k: int, nbits: int) -> str:
    """SQL fragment for the ``k`` bit positions a key sets/probes —
    ONE definition shared by build and probe (same seeded-xxhash64
    family as the Count-Min cells; seed is the hash index), so the two
    sides agree by construction and the filter is reproducible run to
    run."""
    return f"transform(sequence(0, {k - 1}), i -> pmod(xxhash64(i, {key_col}), {nbits}))"


def bloom_build(
    df: DataFrame,
    key_col: str = "fingerprint",
    nbits: int = BLOOM_NBITS,
    k: int = BLOOM_K,
) -> DataFrame:
    """Bloom filter over ``df[key_col]`` as ONE row holding
    ``bits: array<long>`` (nbits/64 words) — the broadcastable set
    sketch an incremental-ingest gate probes before paying for an exact
    anti-join.

    Build is a narrow explode (k ints per key) → per-word ``bit_or``
    partial-aggregated map-side → one bounded shuffle of at most
    nbits/64 rows → a single-group assembly into the dense word array
    (zero-filling words no key touched). Nothing key-count-sized ever
    reaches the driver; the one-row result is `nbits/8` bytes however
    many keys went in."""
    nwords = (nbits + 63) // 64
    cells = (
        df.select(
            F.explode(F.expr(_bloom_positions_sql(key_col, k, nbits))).alias("pos")
        )
        .select(
            F.expr("cast(pos div 64 as int) as w"),
            F.expr("shiftleft(1L, cast(pos % 64 as int)) as m"),
        )
        .groupBy("w")
        .agg(F.bit_or("m").alias("bits"))
    )
    return cells.agg(
        F.map_from_entries(F.collect_list(F.struct("w", "bits"))).alias("m")
    ).select(
        F.expr(
            f"transform(sequence(0, {nwords - 1}), w -> coalesce(m[w], 0L))"
        ).alias("bits")
    )


def bloom_might_contain(
    df: DataFrame,
    bloom: DataFrame,
    key_col: str = "fingerprint",
    nbits: int = BLOOM_NBITS,
    k: int = BLOOM_K,
    out_col: str = "might_contain",
) -> DataFrame:
    """Adds ``out_col``: false ⇒ the key is DEFINITELY not in the
    built set (Bloom's one-sided guarantee — no false negatives);
    true ⇒ present or a collision, at the standard
    (1 - e^(-kn/m))^k false-positive rate.

    The filter joins in as a broadcast one-row frame, so probing is a
    shuffle-free narrow map over the probe stream — the whole point:
    at 100 TB of daily ingest against a billions-strong index, the
    overwhelmingly-novel majority short-circuits here and only the
    might-contain sliver pays the exact anti-join shuffle
    (operators/dedup.py:novel_against_index_bloom)."""
    probe = df.crossJoin(F.broadcast(bloom))
    hit = F.expr(
        f"forall({_bloom_positions_sql(key_col, k, nbits)}, p -> "
        "(element_at(bits, cast(p div 64 as int) + 1) & "
        "shiftleft(1L, cast(p % 64 as int))) != 0)"
    )
    return probe.withColumn(out_col, hit).drop("bits")


def cm_estimate(
    sketch: DataFrame,
    candidates: DataFrame,
    token_col: str = "token",
    depth: int = CM_DEPTH,
    width: int = CM_WIDTH,
) -> DataFrame:
    """Point-estimate each candidate's frequency: min over its
    ``depth`` cells. The sketch is depth x width rows (tiny by
    construction) — broadcast, so estimation is shuffle-free on the
    candidate side. A cell missing from the sketch means zero
    occurrences hashed there (possible for candidates the corpus never
    contained), hence the coalesce to 0."""
    probe = candidates.select(token_col).withColumn(
        "d", F.explode(F.expr(f"sequence(0, {depth - 1})"))
    )
    probe = probe.withColumn("b", _cell(F.col(token_col), F.col("d"), width))
    return (
        probe.join(F.broadcast(sketch), ["d", "b"], "left")
        .groupBy(token_col)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).cast("long").alias("cm_est"))
    )


def hll_daily_partials(
    df: DataFrame, key: str = "user_id", ts_col: str = "ts", lgk: int = 12
) -> DataFrame:
    """Per-day HLL sketch partials ``(d, sketch)`` — the mergeable
    building block of every rolling-distinct product metric (DAU
    partials answer WAU/MAU/arbitrary-range questions WITHOUT
    re-reading events; Apache DataSketches HLL via
    ``hll_sketch_agg``).

    The 100 TB posture: raw events are touched exactly once, shuffled
    only by day (partial-aggregated map-side into one ~kB sketch per
    partition x day), and the persisted partials — a few kB per day —
    replace every "count distinct over window" scan thereafter. This is
    the same immutable-partials-merged-at-read discipline as the
    Count-Min pipeline (streaming/pipelines.py:sketch_pipeline)."""
    return (
        df.select(F.to_date(F.col(ts_col)).alias("d"), F.col(key).alias("k"))
        .groupBy("d")
        .agg(F.hll_sketch_agg("k", F.lit(lgk)).alias("sketch"))
    )


def hll_prefix_estimates(partials: DataFrame) -> DataFrame:
    """(d, est_daily, est_cum): per-day estimate plus the
    estimate over the union of all partials up to d — computed purely
    by MERGING sketches (``hll_union_agg``), never re-touching events.
    The prefix closure is a running-union window over the day frame:
    one pass over O(#days) kB-sized sketches (bounded by the calendar,
    ~365 rows/year — the single-partition window is irrelevant at any
    data scale, and strictly cheaper than the day x day inequality
    self-join it replaces, which planned as a nested-loop). The frame
    is RANGE-based so an input carrying several partial rows for one
    day (e.g. a raw per-batch partials snapshot, not yet folded by
    hll_read_daily) still unions ALL same-day siblings into each
    row's est_cum — a rows-frame would make duplicate-day rows
    tie-order dependent."""
    w = Window.orderBy("d").rangeBetween(Window.unboundedPreceding, 0)
    return partials.select(
        "d",
        F.hll_sketch_estimate("sketch").alias("est_daily"),
        F.hll_sketch_estimate(F.hll_union_agg("sketch").over(w)).alias("est_cum"),
    )
