"""Connected components over near-duplicate pair graphs — the step a
dedup pipeline needs AFTER pair generation: transitively-linked
near-dups form one group, from which one canonical document is kept.

Algorithm: iterative min-label propagation. Every node starts labeled
with its own id; each round every node takes the minimum label among
itself and its neighbors; fixpoint = components labeled by their
minimum member id. Near-dup graphs are dense little clusters with tiny
diameters, so convergence takes a handful of rounds; each round is one
shuffle join + one aggregation, and ``localCheckpoint`` truncates the
growing lineage so round N's plan does not replay rounds 1..N-1.
(For planetary graphs with long chains the large-star/small-star
variant halves label-tree depth per round — same join/agg primitives,
swap in if diameters ever grow past tens.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame, src: str = "i", dst: str = "j", max_iter: int = 50
) -> DataFrame:
    """(node, component) for every node appearing in ``pairs``;
    ``component`` = the minimum node id of its connected component.
    Nodes with no edges don't appear (singletons are trivially their
    own component — callers union them in if needed).

    Each round is ONE job: the previous round's label rides the union
    as a tagged self-row, so the min-label aggregation also knows the
    old label, and the convergence signal (count of nodes whose label
    changed) is collected by an ``observe`` metric DURING the job that
    materializes the round's labels — no separate join + count action
    (that second action per round doubled driver latency, which is the
    term that multiplies at scale, not the per-row cost).
    """
    e = pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    edges = (
        e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .localCheckpoint()
    )
    labels = edges.select(F.col("a").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    for _ in range(max_iter):
        nbr = edges.join(
            labels.select(F.col("node").alias("b"), "label"), "b"
        ).select(F.col("a").alias("node"), "label")
        obs = Observation()
        folded = (
            labels.select("node", "label", F.lit(1).alias("is_self"))
            .union(nbr.select("node", "label", F.lit(0).alias("is_self")))
            .groupBy("node")
            .agg(
                F.min("label").alias("label"),
                # every node has exactly one self-row, so this is the
                # previous round's label for the change comparison
                F.max(F.when(F.col("is_self") == 1, F.col("label"))).alias("_old"),
            )
            .observe(
                obs,
                F.sum(
                    (F.col("label") != F.col("_old")).cast("long")
                ).alias("changed"),
            )
        )
        # eager localCheckpoint runs the round's single job; the
        # observation is then available without another action
        labels = folded.select("node", "label").localCheckpoint()
        if (obs.get["changed"] or 0) == 0:
            break
    return labels.select("node", F.col("label").alias("component"))


def keep_canonical(
    docs: DataFrame, components: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Dedup by component: keep only each component's canonical member
    (minimum id) plus every un-clustered document. The 'collapse
    near-dup groups to one exemplar' step of a training-data pipeline.
    """
    drop = components.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return docs.join(drop, id_col, "left_anti")
