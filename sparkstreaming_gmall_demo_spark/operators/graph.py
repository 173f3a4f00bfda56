"""Link-graph ranking: fixed-iteration PageRank on a weighted edge
list — the domain-authority signal a web-crawl training-corpus
pipeline uses to weight sources (the CCNet/quality-filter families
rank domains before sampling documents from them).

Scale design (billions of nodes / edges):
- The rank vector is a DataFrame keyed by node, NEVER a broadcast or
  a driver-side structure — each Jacobi iteration is one shuffle-join
  of ranks against edges on the source key plus one aggregation on the
  destination key. Hash-partitioning both sides on node id lets the
  exchange be reused across iterations (Catalyst ReusedExchange; on a
  real cluster, pre-bucketing the edge table by src makes every
  iteration co-located).
- Out-degree normalization is computed ONCE up front (one aggregation)
  and joined into the edge list, so iterations touch only
  (src, dst, frac).
- Fixed iteration count (the production norm for ranking signals —
  convergence deltas are a tuning concern, not a semantics concern),
  so the whole computation is a static, optimizable plan with no
  driver-side convergence actions.

Semantics: rank' = (1-d)/N + d * sum_{in-edges} rank * frac. Dangling
mass (nodes with no out-edges) evaporates rather than being
redistributed — the common simplification; deterministic and mirrored
exactly in the DuckDB oracle (plans/extensions.py:ext_nation_pagerank).

Reference anchor: none — the reference has no graph analytics; this is
a beyond-reference extension of the LLM-corpus-curation family
(SURVEY §2.14), like operators/vocab.py and operators/sketch.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def normalize_edges(
    edges: DataFrame, src: str = "src", dst: str = "dst", weight: str = "w"
) -> DataFrame:
    """(src, dst, frac): each edge's share of its source's out-weight."""
    out = edges.groupBy(src).agg(F.sum(F.col(weight)).alias("_wout"))
    return edges.join(out, src).select(
        src, dst, (F.col(weight) / F.col("_wout")).alias("frac")
    )


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
) -> DataFrame:
    """Fixed-iteration weighted PageRank -> (node, rank).

    ``iters`` Jacobi rounds from the uniform vector; each round is a
    join on the source key + an aggregation on the destination key —
    the rank vector stays distributed throughout (no collect, no
    broadcast of node-sized data).

    The normalized edge list and node set are localCheckpoint-ed
    (eager) before iterating: without it every round re-executes the
    whole upstream edge derivation (for the declared query, a 3-way
    fact/dim join — measured 3x the operator's cost at sf0.1), and
    lineage doubles per round. Same materialization discipline as
    operators/components.py; at cluster scale this is the per-round
    cache/checkpoint every iterative graph engine does."""
    norm = normalize_edges(edges, src, dst, weight).localCheckpoint()
    nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    base = (1.0 - damping) / n
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(iters):
        contrib = (
            norm.join(ranks, norm[src] == ranks["node"])
            .select(F.col(dst).alias("node"), (F.col("rank") * F.col("frac")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("c"))
        )
        ranks = nodes.join(contrib, "node", "left").select(
            "node",
            (F.lit(base) + F.lit(damping) * F.coalesce(F.col("c"), F.lit(0.0))).alias(
                "rank"
            ),
        )
    return ranks
