"""Round-7 tests: the semantic (embedding) novelty ingest gate — the
paraphrase-shaped member of the gate family (exact fingerprint /
MinHash / winnowing overlap gates are text-based and provably miss
near-semantic reuse). Hand-built unit vectors with known cosines,
admission + within-batch collapse + index rejection + replay no-op +
the streaming/batch twin equivalence."""

from __future__ import annotations

import math
import os
import time

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from sparkstreaming_gmall_demo_spark.streaming import pipelines, txn

VEC_SCHEMA = "vec_id long, embedding array<double>"

# two frozen unit centroids on the first two axes
CENTROIDS = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]

# cos(V_A, V_A99) = 0.99 (same cell 0); V_C sits in cell 1; V_D is
# novel everywhere (max cosine 0.8 < 0.95); V_E is orthogonal to all.
V_A = [1.0, 0.0, 0.0, 0.0]
V_A99 = [0.99, math.sqrt(1.0 - 0.99 * 0.99), 0.0, 0.0]
V_C = [0.0, 1.0, 0.0, 0.0]
V_D = [0.6, 0.8, 0.0, 0.0]
V_E = [0.0, 0.0, 1.0, 0.0]


def _df(spark, rows):
    return spark.createDataFrame(rows, VEC_SCHEMA)


def test_semantic_gate_admits_novel_rejects_neardup(spark, tmp_path):
    index_table = str(tmp_path / "sem_index")

    # batch 1: A and its 0.99-cosine twin collapse to min vec_id; C novel
    b1 = _df(spark, [(1, V_A), (2, V_A99), (3, V_C)])
    out1 = pipelines.semantic_gate_admit(b1, index_table, CENTROIDS)
    assert {r.vec_id for r in out1.collect()} == {1, 3}
    out1.unpersist()
    idx = txn.snapshot(spark, index_table)
    assert {r.vec_id for r in idx.select("vec_id").collect()} == {1, 3}
    # index carries cluster + norm (the probe-ready materialization)
    assert set(idx.columns) == {"vec_id", "cluster", "embedding", "nrm"}

    # batch 2: a re-embedding of A is rejected by the index probe;
    # D (max cosine 0.8) and E (orthogonal) are admitted
    b2 = _df(spark, [(4, V_A99), (5, V_D), (6, V_E)])
    out2 = pipelines.semantic_gate_admit(b2, index_table, CENTROIDS)
    assert {r.vec_id for r in out2.collect()} == {5, 6}
    out2.unpersist()
    assert {
        r.vec_id for r in txn.snapshot(spark, index_table).select("vec_id").collect()
    } == {1, 3, 5, 6}


def test_semantic_gate_replay_is_noop(spark, tmp_path):
    index_table = str(tmp_path / "sem_replay_index")
    b1 = _df(spark, [(1, V_A), (3, V_C)])
    pipelines.semantic_gate_admit(b1, index_table, CENTROIDS).unpersist()
    b2 = _df(spark, [(4, V_A99), (5, V_D)])
    out = pipelines.semantic_gate_admit(b2, index_table, CENTROIDS)
    want = {r.vec_id for r in out.collect()}
    out.unpersist()
    assert want == {5}
    v = txn.current_version(index_table)

    # replay of batch 2: the probe anti-joins the batch's own ids out
    # of the index, so the admitted set and the index version both
    # repeat exactly
    out_r = pipelines.semantic_gate_admit(b2, index_table, CENTROIDS)
    assert {r.vec_id for r in out_r.collect()} == want
    out_r.unpersist()
    assert txn.current_version(index_table) == v


def test_semantic_gate_streaming_equals_batch_twin(spark, tmp_path):
    # stage two chronological chunks through the file source
    topic = tmp_path / "vecs"
    topic.mkdir()
    chunks = [
        [(1, V_A), (2, V_A99), (3, V_C)],
        [(4, V_A99), (5, V_D), (6, V_E)],
    ]
    for i, rows in enumerate(chunks):
        p = topic / f"c{i}.parquet"
        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array([r[0] for r in rows], pa.int64()),
                    "embedding": pa.array(
                        [r[1] for r in rows], pa.list_(pa.float64())
                    ),
                }
            ),
            str(p),
        )
        now = time.time()
        os.utime(p, (now - 10 + i, now - 10 + i))

    out_path = str(tmp_path / "admitted")
    stream = (
        spark.readStream.schema(VEC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(topic))
    )
    q = pipelines.semantic_gate_pipeline(
        stream,
        str(tmp_path / "sem_s_index"),
        out_path,
        str(tmp_path / "ck"),
        CENTROIDS,
        trigger={"availableNow": True},
    )
    q.awaitTermination()
    streamed = {r.vec_id for r in spark.read.parquet(out_path).collect()}
    assert streamed == {1, 3, 5, 6}

    # batch twin: the same chunks through semantic_gate_admit directly
    twin_index = str(tmp_path / "sem_t_index")
    admitted: set[int] = set()
    for rows in chunks:
        out = pipelines.semantic_gate_admit(
            _df(spark, rows), twin_index, CENTROIDS
        )
        admitted |= {r.vec_id for r in out.collect()}
        out.unpersist()
    assert admitted == streamed


def test_semantic_gate_zero_norm_vectors_never_match(spark, tmp_path):
    """Documented non-policy: cosine is undefined on a zero-norm
    vector (0/0 -> NULL), so such vectors match nothing — admitted
    always, rejecting never. Validation is embedding_health's job."""
    index_table = str(tmp_path / "sem_zero_index")
    z = [0.0, 0.0, 0.0, 0.0]
    b1 = _df(spark, [(1, z), (2, z), (3, V_A)])
    out1 = pipelines.semantic_gate_admit(b1, index_table, CENTROIDS)
    assert {r.vec_id for r in out1.collect()} == {1, 2, 3}
    out1.unpersist()
    # an exact copy of an indexed zero-norm vector is still admitted
    b2 = _df(spark, [(4, z)])
    out2 = pipelines.semantic_gate_admit(b2, index_table, CENTROIDS)
    assert {r.vec_id for r in out2.collect()} == {4}
    out2.unpersist()


# ---------------------------------------------------------------------------
# Incremental SCD2 dimension maintenance
# ---------------------------------------------------------------------------
OBS_SCHEMA = "uid long, ts long, val string"


def _obs(spark, rows):
    return spark.createDataFrame(rows, OBS_SCHEMA)


def _hist(df):
    return sorted((r.uid, r.val, r.valid_from, r.valid_to) for r in df.collect())


def test_scd2_incremental_equals_batch_rebuild(spark, tmp_path):
    """Invariant: after every round the maintained table equals a
    from-scratch scd2_history over the full observation set."""
    from sparkstreaming_gmall_demo_spark.operators import scd2 as scd2_ops

    obs_t = str(tmp_path / "scd2_obs")
    hist_t = str(tmp_path / "scd2_hist")
    chunks = [
        [(1, 10, "A"), (1, 20, "A"), (2, 10, "X")],
        [(1, 30, "B"), (2, 40, "X")],  # uid2 repeat: no new version
        [(3, 5, "Q")],
    ]
    for i, rows in enumerate(chunks):
        pipelines.scd2_apply_batch(
            _obs(spark, rows), obs_t, hist_t, "uid", "ts", ["val"], batch_id=i
        )
        # the invariant holds after EVERY round, not just the last
        want = scd2_ops.scd2_history(
            _obs(spark, [r for c in chunks[: i + 1] for r in c]),
            "uid", "ts", ["val"],
        )
        assert _hist(txn.snapshot(spark, hist_t)) == _hist(want), f"round {i}"


def test_scd2_late_arrival_resurrects_collapsed_version(spark, tmp_path):
    """The case that breaks any incremental scheme folding into the
    COLLAPSED history: A@20 was an equal-attr repeat (collapsed away);
    a late C@15 between A@10 and A@20 makes A@20 a change again —
    recoverable only from the raw observation log."""
    obs_t = str(tmp_path / "scd2_late_obs")
    hist_t = str(tmp_path / "scd2_late_hist")
    pipelines.scd2_apply_batch(
        _obs(spark, [(1, 10, "A"), (1, 20, "A"), (1, 30, "B")]),
        obs_t, hist_t, "uid", "ts", ["val"], batch_id=0,
    )
    assert _hist(txn.snapshot(spark, hist_t)) == sorted(
        [(1, "A", 10, 30), (1, "B", 30, None)]
    )
    pipelines.scd2_apply_batch(
        _obs(spark, [(1, 15, "C")]),
        obs_t, hist_t, "uid", "ts", ["val"], batch_id=1,
    )
    assert _hist(txn.snapshot(spark, hist_t)) == sorted(
        [
            (1, "A", 10, 15),
            (1, "C", 15, 20),
            (1, "A", 20, 30),  # resurrected from the log
            (1, "B", 30, None),
        ]
    )


def test_scd2_replay_is_noop(spark, tmp_path):
    obs_t = str(tmp_path / "scd2_rp_obs")
    hist_t = str(tmp_path / "scd2_rp_hist")
    b0 = _obs(spark, [(1, 10, "A"), (2, 10, "X")])
    b1 = _obs(spark, [(1, 20, "B")])
    pipelines.scd2_apply_batch(b0, obs_t, hist_t, "uid", "ts", ["val"], batch_id=0)
    pipelines.scd2_apply_batch(b1, obs_t, hist_t, "uid", "ts", ["val"], batch_id=1)
    want = _hist(txn.snapshot(spark, hist_t))
    v = txn.current_version(hist_t)
    # replayed batch: the scd2_through watermark short-circuits both commits
    pipelines.scd2_apply_batch(b1, obs_t, hist_t, "uid", "ts", ["val"], batch_id=1)
    assert txn.current_version(hist_t) == v
    assert _hist(txn.snapshot(spark, hist_t)) == want


def test_scd2_streaming_pipeline_end_to_end(spark, tmp_path):
    from sparkstreaming_gmall_demo_spark.operators import scd2 as scd2_ops

    topic = tmp_path / "dim_updates"
    topic.mkdir()
    chunks = [
        [(1, 10, "A"), (2, 10, "X")],
        [(1, 30, "B"), (1, 15, "C")],  # includes a late row for uid 1
    ]
    for i, rows in enumerate(chunks):
        p = topic / f"c{i}.parquet"
        pq.write_table(
            pa.table(
                {
                    "uid": pa.array([r[0] for r in rows], pa.int64()),
                    "ts": pa.array([r[1] for r in rows], pa.int64()),
                    "val": pa.array([r[2] for r in rows], pa.string()),
                }
            ),
            str(p),
        )
        now = time.time()
        os.utime(p, (now - 10 + i, now - 10 + i))

    hist_t = str(tmp_path / "scd2_s_hist")
    stream = (
        spark.readStream.schema(OBS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(topic))
    )
    q = pipelines.scd2_pipeline(
        stream, str(tmp_path / "scd2_s_obs"), hist_t,
        str(tmp_path / "ck_scd2"), "uid", "ts", ["val"],
        trigger={"availableNow": True},
    )
    q.awaitTermination()
    want = scd2_ops.scd2_history(
        _obs(spark, [r for c in chunks for r in c]), "uid", "ts", ["val"]
    )
    assert _hist(txn.snapshot(spark, hist_t)) == _hist(want)


# ---------------------------------------------------------------------------
# Feature-based second-stage reranker
# ---------------------------------------------------------------------------
def test_feature_rerank_phrase_and_proximity_order_equal_bm25_docs(spark):
    """Four docs with IDENTICAL length and term frequencies (so BM25
    cannot distinguish 1-3): the exact-phrase doc must rank first, the
    tight-proximity doc second, the spread doc third, and the
    single-term doc last. This is precisely the signal bag-of-words
    BM25 cannot express."""
    from sparkstreaming_gmall_demo_spark.operators.retrieval import feature_rerank

    docs = spark.createDataFrame(
        [
            (1, "spark join window a b c d e f"),   # exact phrase, gap 1
            (2, "spark join x window a b c d e"),   # gaps 1,2 — no phrase
            (3, "spark a b c join d e f window"),   # gaps 4,4
            (4, "spark a b c d e f g h"),           # one term only
        ],
        "doc_id long, text string",
    )
    rows = feature_rerank(docs, "spark join window", k=4).collect()
    assert [r.doc_id for r in rows] == [1, 2, 3, 4]
    by_id = {r.doc_id: r for r in rows}
    assert by_id[1]["phrase"] == 1 and by_id[2]["phrase"] == 0
    assert by_id[1]["cover"] == 3 and by_id[4]["cover"] == 1
    assert by_id[2]["min_gap"] == 1 and by_id[3]["min_gap"] == 4
    # docs 1-3 share bm25 exactly (same dl, same tfs): the ordering
    # above is PURELY the feature deltas
    assert by_id[1]["score_micro"] - by_id[2]["score_micro"] == 5000
    assert by_id[2]["score_micro"] - by_id[3]["score_micro"] == 300


def test_feature_rerank_single_term_query(spark):
    from sparkstreaming_gmall_demo_spark.operators.retrieval import feature_rerank

    docs = spark.createDataFrame(
        [(1, "spark x spark"), (2, "y z w")], "doc_id long, text string"
    )
    rows = feature_rerank(docs, "spark", k=2).collect()
    assert [r.doc_id for r in rows] == [1]  # non-matching doc never enters
    assert rows[0]["phrase"] == 1 and rows[0]["cover"] == 1
    assert rows[0]["min_gap"] == 10  # no adjacent pair: cap, zero credit
