"""Benchmark decontamination: flag corpus documents whose token
n-grams overlap an evaluation set.

Not in the reference (its corpus is clickstream, not training text),
but it is a mandatory step in any LLM training-data pipeline: a
document that contains a benchmark's prompts contaminates every model
trained on it. The standard published recipe (GPT-3 appendix C,
PaLM/Llama data cards) is exactly this shape: build the n-gram set of
the eval benchmarks, flag training docs whose n-gram overlap exceeds a
threshold.

Scale design (100 TB corpus, MB-scale benchmarks): the eval side is
tiny BY NATURE — benchmarks are a few MB of text even summed across
suites — so its distinct-shingle dictionary broadcasts to every
executor. The corpus side then needs NO shuffle to score: shingling is
a narrow map, the overlap probe is a broadcast hash join, and the only
exchange is the final per-doc count aggregation (partial map-side
combine, key = doc_id, cardinality = corpus rows, no skew because
doc_id is unique). The corpus text itself never moves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .neardup import shingle_sets


def eval_shingle_dict(eval_docs: DataFrame, shingle_n: int = 5,
                      id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """The distinct shingle dictionary of the evaluation set — the
    broadcast side. One column ``s``."""
    return (
        shingle_sets(eval_docs, shingle_n, id_col, text_col)
        .select(F.explode("toks").alias("s"))
        .distinct()
    )


def flag_contaminated(
    corpus: DataFrame,
    eval_docs: DataFrame,
    shingle_n: int = 5,
    threshold_pct: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per corpus doc: distinct-shingle count, eval-overlap count, and
    a contaminated flag at ``threshold_pct`` percent overlap.

    The flag compares ``n_overlap * 100 >= n_shingles * threshold_pct``
    in integer arithmetic — no floating ratio in the output, so the
    result is bit-identical across engines and partitionings.
    """
    evals = eval_shingle_dict(eval_docs, shingle_n, id_col, text_col)
    probes = shingle_sets(corpus, shingle_n, id_col, text_col).select(
        "doc_id", F.explode("toks").alias("s")
    )
    hits = probes.join(
        F.broadcast(evals.withColumn("hit", F.lit(1))), "s", "left"
    )
    return (
        hits.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.count("hit").alias("n_overlap"),
        )
        .withColumn(
            "contaminated",
            F.col("n_overlap") * 100 >= F.col("n_shingles") * F.lit(threshold_pct),
        )
    )
