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

from ..functions import tokens
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


def scrub_contaminated_spans(
    corpus: DataFrame,
    eval_docs: DataFrame,
    shingle_n: int = 5,
    buffer_tokens: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Span-level decontamination: instead of dropping a flagged doc,
    remove exactly the token spans covered by eval-set shingles (±
    ``buffer_tokens``) and keep the rest — the published refinement
    (PaLM/Llama data cards drop the contaminated span, not the
    document) that preserves the uncontaminated majority of long docs.

    Output per doc: n_tokens, n_removed, clean_text (tokens outside
    every covered span, single-space joined). Docs shorter than one
    shingle are never scrubbed — a sub-n-gram match is below the
    evidence threshold by definition.

    Plan shape: positional shingles (posexplode-style transform) probe
    the broadcast dictionary exactly like flag_contaminated; hit
    positions fan out to covered token indexes (span arithmetic on
    ints, never text); ONE aggregation collects the covered-index set
    per doc; the clean text is rebuilt by a narrow indexed filter over
    the original token array. Text crosses no shuffle — only (doc_id,
    index) pairs do.
    """
    evals = eval_shingle_dict(eval_docs, shingle_n, id_col, text_col)
    toked = corpus.select(
        F.col(id_col).alias("doc_id"), tokens(text_col).alias("toks")
    )
    # 1-based shingle start positions: shingle p covers tokens [p, p+n-1]
    pos_sh = toked.select(
        "doc_id",
        F.explode(
            F.expr(
                f"CASE WHEN size(toks) >= {shingle_n} THEN "
                f"transform(sequence(1, size(toks) - {shingle_n - 1}), "
                f"i -> struct(i AS p, concat_ws(' ', slice(toks, i, {shingle_n})) AS s)) "
                f"ELSE array() END"
            )
        ).alias("e"),
    ).select("doc_id", F.col("e.p").alias("p"), F.col("e.s").alias("s"))
    hits = pos_sh.join(F.broadcast(evals), "s")
    hi = shingle_n - 1 + buffer_tokens
    covered = (
        hits.select(
            "doc_id",
            F.explode(
                F.expr(f"sequence(greatest(1, p - {buffer_tokens}), p + {hi})")
            ).alias("ci"),
        )
        .groupBy("doc_id")
        .agg(F.collect_set("ci").alias("covered"))
    )
    # indexes past the token count (buffered spans at the tail) never
    # match a real token, so clipping happens implicitly below
    return (
        toked.join(covered, "doc_id", "left")
        .select(
            "doc_id",
            F.size("toks").cast("long").alias("n_tokens"),
            F.expr(
                "CASE WHEN covered IS NULL THEN CAST(0 AS BIGINT) ELSE "
                "CAST(size(filter(covered, ci -> ci <= size(toks))) AS BIGINT) END"
            ).alias("n_removed"),
            F.expr(
                "concat_ws(' ', transform(filter("
                "  transform(toks, (t, i) -> struct(t AS t, i + 1 AS ix)),"
                "  x -> covered IS NULL OR NOT array_contains(covered, x.ix)"
                "), x -> x.t))"
            ).alias("clean_text"),
        )
    )


def contamination_report(
    corpus: DataFrame,
    eval_docs: DataFrame,
    shingle_n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-benchmark-item leak audit: for every eval document, how many
    corpus documents share at least one of its shingles and how many
    distinct (corpus doc, shingle) matches point at it — the report a
    data team reads to decide whether a benchmark is burned before
    trusting its scores.

    The dictionary keeps provenance here — (eval id, shingle), still
    broadcast-sized — and a shingle appearing in several eval docs
    credits each of them (it contaminates every one). Same plan shape
    as flag_contaminated; the aggregation key flips from corpus doc to
    eval doc. Eval-doc count is benchmark-sized, so the final agg is
    tiny; no skew because hot shingles are bounded by the dictionary's
    own distinctness per eval doc.
    """
    evals = (
        shingle_sets(eval_docs, shingle_n, id_col, text_col)
        .select(F.col("doc_id").alias("e_id"), F.explode("toks").alias("s"))
        .distinct()
    )
    probes = shingle_sets(corpus, shingle_n, id_col, text_col).select(
        "doc_id", F.explode("toks").alias("s")
    )
    return (
        probes.join(F.broadcast(evals), "s")
        .groupBy("e_id")
        .agg(
            F.count_distinct("doc_id").alias("n_docs_hit"),
            F.count("*").alias("n_shingle_hits"),
        )
    )


def semantic_decontam(
    corpus_emb: DataFrame,
    eval_emb: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-level decontamination: flag corpus items whose vector
    sits within ``threshold`` cosine of ANY eval-set vector — the
    semantic companion to the n-gram recipe above (catches paraphrased
    benchmark leakage that shares no 5-gram; the published follow-up
    to verbatim decontam in the Phi/llm-decontaminator line of work).

    Same scale asymmetry as flag_contaminated: the eval side is
    benchmark-sized BY NATURE, so it rides a broadcast nested-loop
    against the corpus — a narrow map over each corpus partition, no
    shuffle of the corpus at all until the per-item max-similarity
    aggregation (key = corpus id, unique, no skew). At 100 TB with a
    LARGE eval suite, pre-cluster the eval side (IVF coarse centroids)
    and probe only the nearest cells — the similarity module's
    ivf_topk discipline.

    Output per corpus item: max_eval_sim4 (4dp, display) and a
    ``contaminated`` flag compared on the UNROUNDED similarity (the
    house rule: filter unrounded, round only projected output).
    """
    from .similarity import cosine_expr

    evals = eval_emb.select(F.col(vec_col).alias("e_vec"))
    pairs = corpus_emb.select(id_col, vec_col).crossJoin(F.broadcast(evals))
    sims = pairs.select(
        F.col(id_col), cosine_expr(vec_col, "e_vec").alias("sim")
    )
    return (
        sims.groupBy(id_col)
        .agg(F.max("sim").alias("max_sim"))
        .select(
            F.col(id_col),
            F.round("max_sim", 4).alias("max_eval_sim4"),
            (F.col("max_sim") >= F.lit(threshold)).cast("int").alias("contaminated"),
        )
    )
