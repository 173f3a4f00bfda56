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

from pyspark.sql import DataFrame
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
