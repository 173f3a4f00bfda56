"""Contrastive training-pair mining: (anchor, positive, negative)
triplets for embedding-model training, mined from the near-dup pair
graph — the standard way a retrieval/embedding team bootstraps
training data from an unlabeled corpus (positives = near-duplicates
/ paraphrases, negatives = random non-duplicates; the in-batch /
mined-negatives recipe of the DPR / SimCSE line of work, public
papers).

Spark-first shape, built to hold at 100 TB:

- Positives ride the EXISTING pair graph (operators/neardup.py) —
  whatever kernel produced it (exact Jaccard at oracle scale, MinHash
  at corpus scale), symmetrized so every member of a dup pair anchors
  a triplet.
- Negatives come from a deterministic md5 RING, not from sampling a
  cross join: each document hashes to one of 16 buckets (first hex
  nibble), documents are ordered inside their bucket by the salted
  md5, and the negative is simply the NEXT document on the ring
  (wrapping within the bucket). One window pass per corpus — no
  candidate join, no RNG state, engine-portable (md5 exists in Spark
  and DuckDB), and replay/retry stable. Bucketing is what makes the
  sort scale: 16 independent rings mean no global single-partition
  window — at 100 TB widen the bucket prefix (256/4096 rings) so each
  ring sorts within one task.
- A ring negative can collide with a true near-dup of its anchor
  (it's drawn blind); those triplets are DROPPED by one anti-join
  against the symmetric pair set — the documented false-negative
  filter, the same discipline as decontamination's eval-overlap gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

RING_BUCKETS_HEX = 1  # hex chars of the md5 prefix -> 16 rings


def negative_ring(
    docs: DataFrame, id_col: str = "doc_id", seed: str = "cp1"
) -> DataFrame:
    """(anchor, negative): each document's deterministic blind
    negative — the next document on its salted-md5 ring bucket,
    wrapping within the bucket. Single-member buckets yield the
    anchor itself and are filtered (no valid blind negative there)."""
    ring = docs.select(F.col(id_col).alias("anchor")).withColumn(
        "_h", F.md5(F.concat_ws("|", F.lit(seed), F.col("anchor").cast("string")))
    )
    ring = ring.withColumn("_b", F.substring("_h", 1, RING_BUCKETS_HEX))
    w = Window.partitionBy("_b").orderBy("_h")
    full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    out = ring.withColumn(
        "negative",
        F.coalesce(F.lead("anchor", 1).over(w), F.first("anchor").over(full)),
    )
    return out.filter(F.col("negative") != F.col("anchor")).select(
        "anchor", "negative"
    )


def contrastive_pairs(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    seed: str = "cp1",
) -> DataFrame:
    """(anchor, positive, negative) triplets: positives are the
    symmetrized near-dup pairs; negatives come from
    :func:`negative_ring`; triplets whose blind negative is itself a
    near-dup of the anchor are dropped (anti-join on the symmetric
    pair set). Deterministic end to end — same corpus + same pair
    graph + same seed => same triplets, on any partitioning."""
    # localCheckpoint (r12): the symmetrized pair frame feeds the
    # positive join AND the negative anti-join; without it the
    # upstream near-dup pair kernel (quadratic posting join) runs
    # twice. The frame is pair-graph-sized — small by construction.
    sym = pairs.select(
        F.col("i").alias("anchor"), F.col("j").alias("positive")
    ).union(
        pairs.select(F.col("j").alias("anchor"), F.col("i").alias("positive"))
    ).localCheckpoint()
    ring = negative_ring(docs, id_col=id_col, seed=seed)
    trip = sym.join(ring, "anchor")
    return trip.join(
        sym.select("anchor", F.col("positive").alias("negative")),
        ["anchor", "negative"],
        "left_anti",
    ).select("anchor", "positive", "negative")
