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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame, src: str = "i", dst: str = "j", max_iter: int = 50
) -> DataFrame:
    """(node, component) for every node appearing in ``pairs``;
    ``component`` = the minimum node id of its connected component.
    Nodes with no edges don't appear (singletons are trivially their
    own component — callers union them in if needed).
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
        new = (
            labels.union(nbr).groupBy("node").agg(F.min("label").alias("label"))
        ).localCheckpoint()
        changed = (
            new.select(F.col("node").alias("n"), F.col("label").alias("new_l"))
            .join(labels.select(F.col("node").alias("n"), F.col("label").alias("old_l")), "n")
            .filter(F.col("new_l") != F.col("old_l"))
            .count()
        )
        labels = new
        if changed == 0:
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
