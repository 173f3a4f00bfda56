"""Round-8 tests: regression pins for the r7 ADVICE findings (phrase
feature three-valued-logic null, semantic-gate threshold rounding
parity) plus the round-8 state-bounding work (gate index TTL/vacuum,
SCD2 key-bucket rewrite, centroid refresh) added further down."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from sparkstreaming_gmall_demo_spark.streaming import pipelines, txn


# ---------------------------------------------------------------------------
# ADVICE r7 (medium): phrase feature must be false, not NULL, when the
# phrase runs off the end of the token array
# ---------------------------------------------------------------------------
def test_feature_rerank_phrase_running_off_array_end_is_zero(spark):
    """A doc whose text ends mid-phrase ('... spark join' for the query
    'spark join window'): try_element_at past the array end yields
    NULL, and un-coalesced `true AND NULL` would make exists() — and
    with it phrase and score_micro — NULL instead of 0 (the DuckDB
    oracle's list_filter semantics). Pin: phrase == 0, score non-NULL,
    and the doc still ranks by its other features."""
    from sparkstreaming_gmall_demo_spark.operators.retrieval import feature_rerank

    docs = spark.createDataFrame(
        [
            (1, "a b c spark join window d"),  # true phrase hit
            (2, "a b c d e spark join"),       # ends mid-phrase: the NULL trap
            (3, "spark d join e f g window"),  # all terms, no phrase
        ],
        "doc_id long, text string",
    )
    rows = feature_rerank(docs, "spark join window", k=3).collect()
    by_id = {r.doc_id: r for r in rows}
    assert by_id[1]["phrase"] == 1
    assert by_id[2]["phrase"] == 0  # NOT None
    assert by_id[3]["phrase"] == 0
    assert all(r["score_micro"] is not None for r in rows)
    # doc 2 covers 2 terms with an adjacent pair; doc 3 covers 3 spread
    assert by_id[2]["cover"] == 2 and by_id[2]["min_gap"] == 1
    assert by_id[3]["cover"] == 3


# ---------------------------------------------------------------------------
# ADVICE r7 (low): the semantic gate's cross-batch probe must share the
# within-batch 4dp-rounded threshold semantics — admission must not
# depend on how content is chunked into batches
# ---------------------------------------------------------------------------
def _vec_with_cosine(c: float) -> list[float]:
    return [c, math.sqrt(1.0 - c * c), 0.0, 0.0]


def test_semantic_gate_rounding_band_is_batch_chunking_invariant(spark, tmp_path):
    """cos(A, B) = 0.94996 sits in [0.95 - 5e-5, 0.95): 4dp HALF_UP
    rounds it to 0.95, so the within-batch pair filter treats A/B as
    dups. The cross-batch index probe must agree — before the fix it
    compared the UNROUNDED cosine and admitted B when A arrived in an
    earlier batch."""
    centroids = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]
    v_a = [1.0, 0.0, 0.0, 0.0]
    v_b = _vec_with_cosine(0.94996)
    schema = "vec_id long, embedding array<double>"

    # one batch: B collapses onto A within the batch
    t1 = str(tmp_path / "sem_one_batch")
    out = pipelines.semantic_gate_admit(
        spark.createDataFrame([(1, v_a), (2, v_b)], schema), t1, centroids
    )
    one_batch_ids = {r.vec_id for r in out.collect()}
    out.unpersist()
    assert one_batch_ids == {1}

    # two batches: the index probe must reject B the same way
    t2 = str(tmp_path / "sem_two_batches")
    o1 = pipelines.semantic_gate_admit(
        spark.createDataFrame([(1, v_a)], schema), t2, centroids
    )
    o1.collect()
    o1.unpersist()
    o2 = pipelines.semantic_gate_admit(
        spark.createDataFrame([(2, v_b)], schema), t2, centroids
    )
    two_batch_round2 = {r.vec_id for r in o2.collect()}
    o2.unpersist()
    assert two_batch_round2 == set()  # B rejected across batches too
    idx = txn.snapshot(spark, t2)
    assert {r.vec_id for r in idx.select("vec_id").collect()} == {1}
