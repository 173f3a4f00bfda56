"""Round-8 tests: regression pins for the r7 ADVICE findings (phrase
feature three-valued-logic null, semantic-gate threshold rounding
parity) plus the round-8 state-bounding work (gate index TTL/vacuum,
SCD2 key-bucket rewrite, centroid refresh) added further down."""

from __future__ import annotations

import math
import os
import time

import pyarrow as pa
import pyarrow.parquet as pq
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


# ---------------------------------------------------------------------------
# VERDICT r7 item 2: TTL/vacuum for the fuzzy and semantic gate indexes
# (the novelty gate's bounded-state discipline, extended). One-file-
# per-micro-batch staging with pinned ascending mtimes so file i IS
# batch i (FileStreamSource orders by mtime, not name).
# ---------------------------------------------------------------------------
def _doc_text(i: int) -> str:
    return " ".join(f"w{i}x{j}" for j in range(30))


def _stage_batches(topic, columns_fn, batches):
    topic.mkdir()
    base = time.time() - 3600
    for i, rows in enumerate(batches):
        p = str(topic / f"c{i}.parquet")
        pq.write_table(columns_fn(rows), p)
        os.utime(p, (base + 60 * i, base + 60 * i))


def _doc_table(rows):
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
        }
    )


def _vec_table(rows):
    return pa.table(
        {
            "vec_id": pa.array([r[0] for r in rows], pa.int64()),
            "embedding": pa.array([r[1] for r in rows], pa.list_(pa.float64())),
        }
    )


DOC_SCHEMA = "doc_id long, text string"
VEC_SCHEMA = "vec_id long, embedding array<double>"
CENTROIDS = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]
V_A = [1.0, 0.0, 0.0, 0.0]
V_A99 = _vec_with_cosine(0.99)


def _doc_stream(spark, topic):
    return (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(topic))
    )


def test_neardup_gate_ttl_readmits_vacuums_and_replays_noop(spark, tmp_path):
    """ttl=2: doc 0's signature suppresses near-dups for exactly the
    two batches after admission, then the content is re-admitted under
    its new doc_id; compact_every=2 vacuums expired rows from BOTH
    index tables; a fresh-checkpoint replay adds nothing."""
    topic = tmp_path / "docs"
    _stage_batches(
        topic,
        _doc_table,
        [
            [(0, _doc_text(0))],   # b0: novel -> admitted (stamp 0)
            [(1, _doc_text(0))],   # b1: 0 >= 1-2 -> live -> suppressed
            [(2, _doc_text(0))],   # b2: 0 >= 0 -> live -> suppressed
            [(3, _doc_text(0))],   # b3: 0 >= 1 fails -> re-admitted (stamp 3)
        ],
    )
    index_table = str(tmp_path / "nd_ttl")
    out_path = str(tmp_path / "admitted")

    def run(ckpt):
        q = pipelines.neardup_gate_pipeline(
            _doc_stream(spark, topic), index_table, out_path,
            str(tmp_path / ckpt), threshold=0.8,
            trigger={"availableNow": True}, ttl_batches=2, compact_every=2,
        )
        q.awaitTermination()

    run("ck1")
    got = {r.doc_id for r in spark.read.parquet(out_path).collect()}
    assert got == {0, 3}
    # vacuum at b3 dropped doc 0's expired rows from both tables
    sigs = txn.snapshot(spark, index_table + "_sigs")
    bands = txn.snapshot(spark, index_table + "_bands")
    assert {r.doc_id for r in sigs.select("doc_id").collect()} == {3}
    assert {r.doc_id for r in bands.select("doc_id").distinct().collect()} == {3}
    assert {r.admit_batch for r in sigs.collect()} == {3}

    run("ck2")  # full replay from a fresh checkpoint
    assert {r.doc_id for r in spark.read.parquet(out_path).collect()} == got


def test_overlap_gate_ttl_readmits_and_vacuums(spark, tmp_path):
    """Same TTL semantics on the winnowing (doc_id, fp) index: an
    expired document's fingerprints stop suppressing overlapping
    content, and vacuum expires whole documents at once (the stamp is
    constant per doc — no partial fingerprint sets survive)."""
    topic = tmp_path / "docs"
    _stage_batches(
        topic,
        _doc_table,
        [
            [(0, _doc_text(0))],
            [(1, _doc_text(0))],   # suppressed (stamp 0 live)
            [(2, _doc_text(0))],   # suppressed
            [(3, _doc_text(0))],   # re-admitted
        ],
    )
    index_table = str(tmp_path / "ov_ttl")
    out_path = str(tmp_path / "admitted")
    q = pipelines.overlap_gate_pipeline(
        _doc_stream(spark, topic), index_table, out_path,
        str(tmp_path / "ck1"), trigger={"availableNow": True},
        ttl_batches=2, compact_every=2,
    )
    q.awaitTermination()
    got = {r.doc_id for r in spark.read.parquet(out_path).collect()}
    assert got == {0, 3}
    idx = txn.snapshot(spark, index_table)
    assert {r.doc_id for r in idx.select("doc_id").distinct().collect()} == {3}
    # every live row is uniformly stamped with its doc's admit batch
    assert {r.admit_batch for r in idx.collect()} == {3}


def test_semantic_gate_ttl_readmits_and_vacuums(spark, tmp_path):
    """TTL on the (vec_id, cluster, embedding, nrm) index: an expired
    vector stops suppressing re-embeddings of its content; vacuum
    drops the expired embedding payload (the costliest gate state to
    leave unbounded)."""
    topic = tmp_path / "vecs"
    _stage_batches(
        topic,
        _vec_table,
        [
            [(1, V_A)],
            [(2, V_A99)],   # cos .99 vs live vec 1 -> suppressed
            [(3, V_A99)],   # suppressed (stamp 0 still live)
            [(4, V_A99)],   # vec 1 expired -> re-admitted
        ],
    )
    index_table = str(tmp_path / "sem_ttl")
    out_path = str(tmp_path / "admitted")
    stream = (
        spark.readStream.schema(VEC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(topic))
    )
    q = pipelines.semantic_gate_pipeline(
        stream, index_table, out_path, str(tmp_path / "ck1"), CENTROIDS,
        trigger={"availableNow": True}, ttl_batches=2, compact_every=2,
    )
    q.awaitTermination()
    got = {r.vec_id for r in spark.read.parquet(out_path).collect()}
    assert got == {1, 4}
    idx = txn.snapshot(spark, index_table)
    assert {r.vec_id for r in idx.select("vec_id").collect()} == {4}
    assert set(idx.columns) == {"vec_id", "cluster", "embedding", "nrm", "admit_batch"}


def test_fuzzy_gate_ttl_migrates_legacy_stampless_index(spark, tmp_path):
    """Enabling ttl_batches against index tables built by the
    unbounded mode must not crash: legacy rows are stamped as
    just-admitted on first probe and suppress for a full TTL from the
    switch-over (the novelty gate's migration contract, applied to the
    fuzzy gates)."""
    index_table = str(tmp_path / "ov_mig")
    # seed a legacy (doc_id, fp) index by running one UNBOUNDED round
    a0 = pipelines.overlap_gate_admit(
        spark.createDataFrame([(0, _doc_text(0))], DOC_SCHEMA), index_table
    )
    assert {r.doc_id for r in a0.collect()} == {0}
    a0.unpersist()
    legacy = txn.snapshot(spark, index_table)
    assert "admit_batch" not in legacy.columns

    # TTL'd round against the legacy table: doc 1 overlaps doc 0 ->
    # suppressed via the migrated (re-stamped) rows, no crash
    a1 = pipelines.overlap_gate_admit(
        spark.createDataFrame([(1, _doc_text(0))], DOC_SCHEMA), index_table,
        ttl_batches=3, batch_id=7,
    )
    assert a1.count() == 0
    a1.unpersist()
    migrated = txn.snapshot(spark, index_table)
    assert "admit_batch" in migrated.columns
    assert migrated.filter(F.col("admit_batch").isNull()).count() == 0
    # legacy rows were stamped with the first TTL'd batch_id
    assert {r.admit_batch for r in migrated.collect()} == {7}


# ---------------------------------------------------------------------------
# VERDICT r7 item 3: SCD2 key-bucket partitioned rewrite (fact scale)
# ---------------------------------------------------------------------------
OBS_SCHEMA = "uid long, ts long, val string"


def _obs(spark, rows):
    return spark.createDataFrame(rows, OBS_SCHEMA)


def _hist(df):
    return sorted((r.uid, r.val, r.valid_from, r.valid_to) for r in df.collect())


def _bucket_of(spark, uid: int, n_buckets: int) -> int:
    return (
        spark.range(1)
        .select(
            F.pmod(F.xxhash64(F.lit(uid).cast("string")), F.lit(n_buckets))
            .cast("int")
            .alias("b")
        )
        .collect()[0]
        .b
    )


def test_scd2_bucketed_invariant_and_partial_rewrite(spark, tmp_path):
    """The rebuild-invariant of the snapshot writer, bit-for-bit over
    the bucketed layout — AND the fact-scale payoff: a round touching
    one key commits a new version ONLY in that key's bucket; every
    other bucket table is left byte-untouched (rewrite cost
    proportional to affected buckets, not history size)."""
    from sparkstreaming_gmall_demo_spark.operators import scd2 as scd2_ops

    n_buckets = 8
    obs_t = str(tmp_path / "obs")
    root = str(tmp_path / "hist")
    chunks = [
        [(1, 10, "A"), (2, 10, "X"), (3, 10, "P"), (4, 10, "M")],
        [(1, 30, "B")],  # touches only uid 1's bucket
        [(5, 5, "Q")],   # a brand-new key -> possibly a brand-new bucket
    ]
    seen = []
    for i, rows in enumerate(chunks):
        before = {
            t: txn.current_version(t) for t in pipelines.scd2_bucket_tables(root)
        }
        pipelines.scd2_apply_batch_bucketed(
            _obs(spark, rows), obs_t, root, "uid", "ts", ["val"],
            batch_id=i, n_buckets=n_buckets,
        )
        seen.extend(rows)
        want = scd2_ops.scd2_history(_obs(spark, seen), "uid", "ts", ["val"])
        got = pipelines.scd2_bucketed_history(spark, root)
        assert _hist(got) == _hist(want), f"round {i}"
        if i >= 1:
            touched = {
                _bucket_of(spark, uid, n_buckets) for uid, _, _ in rows
            }
            for t, v_before in before.items():
                b = int(t.rsplit("bucket=", 1)[1])
                v_after = txn.current_version(t)
                if b in touched:
                    assert v_after == v_before + 1, f"bucket {b} not rewritten"
                else:
                    assert v_after == v_before, f"bucket {b} needlessly rewritten"


def test_scd2_bucketed_late_arrival_resurrects_collapsed_version(spark, tmp_path):
    obs_t = str(tmp_path / "obs")
    root = str(tmp_path / "hist")
    pipelines.scd2_apply_batch_bucketed(
        _obs(spark, [(1, 10, "A"), (1, 20, "A"), (1, 30, "B")]),
        obs_t, root, "uid", "ts", ["val"], batch_id=0, n_buckets=4,
    )
    pipelines.scd2_apply_batch_bucketed(
        _obs(spark, [(1, 15, "C")]),
        obs_t, root, "uid", "ts", ["val"], batch_id=1, n_buckets=4,
    )
    assert _hist(pipelines.scd2_bucketed_history(spark, root)) == sorted(
        [(1, "A", 10, 15), (1, "C", 15, 20), (1, "A", 20, 30), (1, "B", 30, None)]
    )


def test_scd2_bucketed_replay_is_noop_per_bucket(spark, tmp_path):
    obs_t = str(tmp_path / "obs")
    root = str(tmp_path / "hist")
    b0 = _obs(spark, [(1, 10, "A"), (2, 10, "X")])
    b1 = _obs(spark, [(1, 20, "B")])
    pipelines.scd2_apply_batch_bucketed(
        b0, obs_t, root, "uid", "ts", ["val"], batch_id=0, n_buckets=4
    )
    pipelines.scd2_apply_batch_bucketed(
        b1, obs_t, root, "uid", "ts", ["val"], batch_id=1, n_buckets=4
    )
    want = _hist(pipelines.scd2_bucketed_history(spark, root))
    versions = {
        t: txn.current_version(t) for t in pipelines.scd2_bucket_tables(root)
    }
    # replay: every touched bucket's scd2_through watermark short-circuits
    pipelines.scd2_apply_batch_bucketed(
        b1, obs_t, root, "uid", "ts", ["val"], batch_id=1, n_buckets=4
    )
    assert {
        t: txn.current_version(t) for t in pipelines.scd2_bucket_tables(root)
    } == versions
    assert _hist(pipelines.scd2_bucketed_history(spark, root)) == want


def test_scd2_bucketed_reader_prunes_to_named_buckets(spark, tmp_path):
    """The enrichment path's pruned read: asking for one key's bucket
    returns that bucket's keys only — no other bucket table opened."""
    obs_t = str(tmp_path / "obs")
    root = str(tmp_path / "hist")
    n_buckets = 8
    uids = [1, 2, 3, 4, 5]
    pipelines.scd2_apply_batch_bucketed(
        _obs(spark, [(u, 10, f"v{u}") for u in uids]),
        obs_t, root, "uid", "ts", ["val"], batch_id=0, n_buckets=n_buckets,
    )
    b1 = _bucket_of(spark, 1, n_buckets)
    pruned = pipelines.scd2_bucketed_history(spark, root, buckets=[b1])
    got_uids = {r.uid for r in pruned.select("uid").collect()}
    assert 1 in got_uids
    assert got_uids == {
        u for u in uids if _bucket_of(spark, u, n_buckets) == b1
    }


def test_scd2_bucketed_n_buckets_mismatch_raises(spark, tmp_path):
    obs_t = str(tmp_path / "obs")
    root = str(tmp_path / "hist")
    pipelines.scd2_apply_batch_bucketed(
        _obs(spark, [(1, 10, "A")]), obs_t, root, "uid", "ts", ["val"],
        batch_id=0, n_buckets=4,
    )
    import pytest

    with pytest.raises(ValueError, match="n_buckets"):
        pipelines.scd2_apply_batch_bucketed(
            _obs(spark, [(1, 20, "B")]), obs_t, root, "uid", "ts", ["val"],
            batch_id=1, n_buckets=8,
        )


def test_scd2_bucketed_streaming_pipeline_end_to_end(spark, tmp_path):
    from sparkstreaming_gmall_demo_spark.operators import scd2 as scd2_ops

    topic = tmp_path / "dim_updates"
    chunks = [
        [(1, 10, "A"), (2, 10, "X")],
        [(1, 30, "B"), (1, 15, "C")],  # includes a late row for uid 1
    ]
    _stage_batches(
        topic,
        lambda rows: pa.table(
            {
                "uid": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.int64()),
                "val": pa.array([r[2] for r in rows], pa.string()),
            }
        ),
        chunks,
    )
    root = str(tmp_path / "hist")
    stream = (
        spark.readStream.schema(OBS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(topic))
    )
    q = pipelines.scd2_bucketed_pipeline(
        stream, str(tmp_path / "obs"), root, str(tmp_path / "ck"),
        "uid", "ts", ["val"], n_buckets=4, trigger={"availableNow": True},
    )
    q.awaitTermination()
    want = scd2_ops.scd2_history(
        _obs(spark, [r for c in chunks for r in c]), "uid", "ts", ["val"]
    )
    assert _hist(pipelines.scd2_bucketed_history(spark, root)) == _hist(want)


# ---------------------------------------------------------------------------
# VERDICT r7 item 4: the semantic gate's cross-batch probe is a
# broadcast BLAS scan (cosine_match_scan) — pin its semantics against
# the SQL join form it replaced, on both sides of the decision boundary
# ---------------------------------------------------------------------------
def test_cosine_match_scan_equals_probe_join(spark):
    """Matched-id sets from the map-only BLAS scan and the exploded
    probe⋈index SQL join must agree, including the 4dp HALF_UP
    rounding band edges (0.94996 rounds up to 0.95 → match; 0.94994
    rounds down → no match) and cluster-restriction (a near-dup in an
    unprobed cluster is invisible to BOTH paths)."""
    from sparkstreaming_gmall_demo_spark.operators.similarity import (
        DOT,
        cosine_match_scan,
    )

    idx = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0, 0.0], 1.0),
            (0, [0.0, 1.0, 0.0, 0.0], 1.0),
            (1, [0.0, 0.0, 1.0, 0.0], 1.0),
        ],
        "cluster int, embedding array<double>, nrm double",
    )
    probes = spark.createDataFrame(
        [
            (10, 0, _vec_with_cosine(0.94996), 1.0),  # rounds to .95: hit
            (11, 0, _vec_with_cosine(0.94994), 1.0),  # rounds to .9499: miss
            (12, 1, [1.0, 0.0, 0.0, 0.0], 1.0),       # twin lives in c0, probes c1: miss
            (13, 1, [0.0, 0.0, 1.0, 0.0], 1.0),       # exact twin in probed cell: hit
        ],
        "vec_id long, cluster int, embedding array<double>, nrm double",
    )
    got = {
        r.vec_id
        for r in cosine_match_scan(idx, probes, 0.95).collect()
    }
    join_form = (
        probes.withColumnRenamed("embedding", "v")
        .join(
            idx.select(
                "cluster",
                F.col("embedding").alias("old_vec"),
                F.col("nrm").alias("old_nrm"),
            ),
            "cluster",
        )
        .filter(
            F.round(
                F.expr(DOT.format(a="v", b="old_vec"))
                / (F.col("nrm") * F.col("old_nrm")),
                4,
            )
            >= F.lit(0.95)
        )
        .select("vec_id")
        .dropDuplicates()
    )
    want = {r.vec_id for r in join_form.collect()}
    assert got == want == {10, 13}


def test_semantic_gate_fallback_join_path_matches_scan_path(spark, tmp_path, monkeypatch):
    """Forcing the probe cap to 0 routes the gate through the
    distributed-join fallback; admissions and the committed index must
    be identical to the broadcast-scan path on the same two batches."""
    centroids = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]
    schema = "vec_id long, embedding array<double>"
    b1 = [(1, [1.0, 0.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0, 0.0])]
    b2 = [
        (3, _vec_with_cosine(0.94996)),   # near-dup of 1 across batches
        (4, [0.0, 0.0, 1.0, 0.0]),        # novel
        (5, [0.0, 0.0, 0.0, 0.0]),        # zero-norm: always admitted
    ]

    def run(table):
        admitted = []
        for batch in (b1, b2):
            out = pipelines.semantic_gate_admit(
                spark.createDataFrame(batch, schema), table, centroids
            )
            admitted.append({r.vec_id for r in out.collect()})
            out.unpersist()
        idx = {r.vec_id for r in txn.snapshot(spark, table).collect()}
        return admitted, idx

    scan_result = run(str(tmp_path / "scan_path"))
    monkeypatch.setattr(pipelines, "SEMANTIC_GATE_BROADCAST_PROBE_CAP", 0)
    join_result = run(str(tmp_path / "join_path"))
    assert scan_result == join_result
    assert scan_result[0] == [{1, 2}, {4, 5}]


# ---------------------------------------------------------------------------
# VERDICT r7 item 5: offline centroid refresh for the semantic gate —
# re-assignment moves only cluster ROUTING, never admitted content,
# and the refreshed gate still rejects duplicates of admitted vectors
# ---------------------------------------------------------------------------
def test_semantic_gate_recluster_preserves_admissions_and_rejection(spark, tmp_path):
    cents_a = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]
    cents_b = [[0.0, 0.0, 1.0, 0.0], [1.0, 0.0, 0.0, 0.0]]
    schema = "vec_id long, embedding array<double>"
    table = str(tmp_path / "sem_idx")
    out = pipelines.semantic_gate_admit(
        spark.createDataFrame(
            [(1, [1.0, 0.0, 0.0, 0.0]),
             (2, [0.0, 1.0, 0.0, 0.0]),
             (3, [0.0, 0.0, 1.0, 0.0])],
            schema,
        ),
        table, cents_a,
    )
    assert {r.vec_id for r in out.collect()} == {1, 2, 3}
    out.unpersist()
    before = sorted(
        (r.vec_id, tuple(r.embedding), r.nrm)
        for r in txn.snapshot(spark, table).collect()
    )

    churn = pipelines.semantic_gate_recluster(spark, table, cents_b)
    # under cents_a: 1->c0, 2->c1, 3->c0 (tie to lowest id); under
    # cents_b: 1->c1, 2->c0 (tie), 3->c0 — vectors 1 and 2 move
    assert churn == {"n_vectors": 3, "n_moved": 2}
    after_rows = txn.snapshot(spark, table).collect()
    after = sorted((r.vec_id, tuple(r.embedding), r.nrm) for r in after_rows)
    assert after == before  # content untouched, only routing moved
    by_id = {r.vec_id: r.cluster for r in after_rows}
    assert by_id == {1: 1, 2: 0, 3: 0}

    # the refreshed gate (NEW centroids on both sides) still rejects a
    # duplicate of an admitted vector at nprobe=1 — dup and stored twin
    # assign to the same new cell by construction — and admits novelty
    out2 = pipelines.semantic_gate_admit(
        spark.createDataFrame(
            [(10, [0.0, 0.0, 1.0, 0.0]),   # exact copy of admitted 3
             (11, [0.0, 0.0, 0.0, 1.0])],  # novel
            schema,
        ),
        table, cents_b, nprobe=1,
    )
    assert {r.vec_id for r in out2.collect()} == {11}
    out2.unpersist()


def test_semantic_gate_recluster_raises_on_concurrent_ingest(
    spark, tmp_path, monkeypatch
):
    """The rewrite is derived from a pinned version: a gate batch that
    lands between the refresh's snapshot read and its commit must make
    the refresh raise (re-derive and retry), never silently discard
    the concurrent batch's rows."""
    import pytest

    cents = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]
    schema = "vec_id long, embedding array<double>"
    table = str(tmp_path / "sem_idx_race")
    pipelines.semantic_gate_admit(
        spark.createDataFrame([(1, [1.0, 0.0, 0.0, 0.0])], schema),
        table, cents,
    ).unpersist()

    real_snapshot = txn.snapshot
    raced = {"done": False}

    def racing_snapshot(spark_, table_, *a, **k):
        df = real_snapshot(spark_, table_, *a, **k)
        if not raced["done"]:
            raced["done"] = True  # guard: merge_keyed re-enters snapshot
            pipelines.semantic_gate_admit(
                spark.createDataFrame(
                    [(2, [0.0, 1.0, 0.0, 0.0])], schema
                ),
                table, cents,
            ).unpersist()
        return df

    monkeypatch.setattr(txn, "snapshot", racing_snapshot)
    with pytest.raises(txn.ConcurrentWriteError):
        pipelines.semantic_gate_recluster(spark, table, cents)
    monkeypatch.undo()
    # the concurrent batch's row survived — nothing was clobbered
    assert {r.vec_id for r in txn.snapshot(spark, table).collect()} == {1, 2}


def test_semantic_gate_recluster_preserves_ttl_stamps(spark, tmp_path):
    """A TTL'd index carries admit_batch stamps; the centroid refresh
    must carry them through the rewrite unchanged (a refresh that
    drops the stamp column would make every row legacy — conservative
    but a silent TTL-window reset) and the refreshed gate must keep
    honoring expiry: content admitted before the refresh still expires
    on the original clock."""
    cents_a = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]
    cents_b = [[0.0, 1.0, 0.0, 0.0], [1.0, 0.0, 0.0, 0.0]]
    schema = "vec_id long, embedding array<double>"
    table = str(tmp_path / "sem_idx_ttl")
    pipelines.semantic_gate_admit(
        spark.createDataFrame([(1, [1.0, 0.0, 0.0, 0.0])], schema),
        table, cents_a, ttl_batches=2, batch_id=0,
    ).unpersist()
    pipelines.semantic_gate_recluster(spark, table, cents_b)
    snap = txn.snapshot(spark, table)
    assert "admit_batch" in snap.columns
    assert [(r.vec_id, r.admit_batch) for r in snap.collect()] == [(1, 0)]
    # within the TTL window the refreshed gate still rejects the dup...
    o1 = pipelines.semantic_gate_admit(
        spark.createDataFrame([(2, [1.0, 0.0, 0.0, 0.0])], schema),
        table, cents_b, ttl_batches=2, batch_id=1,
    )
    assert o1.count() == 0
    o1.unpersist()
    # ...and past it (batch 3 > 0 + ttl 2) the content re-admits on
    # the ORIGINAL clock, refresh or not
    o2 = pipelines.semantic_gate_admit(
        spark.createDataFrame([(3, [1.0, 0.0, 0.0, 0.0])], schema),
        table, cents_b, ttl_batches=2, batch_id=3,
    )
    assert [r.vec_id for r in o2.collect()] == [3]
    o2.unpersist()


# ---------------------------------------------------------------------------
# Round-8 self-review findings: regression pins
# ---------------------------------------------------------------------------
def test_semantic_gate_tolerates_ragged_and_zero_norm_vectors(spark, tmp_path):
    """A malformed producer emitting a dimension-mismatched vector
    must not crash the driver-side BLAS kernels (the SQL forms drop
    such pairs via zip_with NULL padding): ragged vectors pair/match
    only against vectors of their own length, zero-norms match
    nothing, and the gate keeps flowing."""
    centroids = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]
    schema = "vec_id long, embedding array<double>"
    table = str(tmp_path / "ragged_idx")
    b1 = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [1.0, 0.0]),          # ragged: 2-dim among 4-dim
        (3, [0.0, 0.0, 0.0, 0.0]),  # zero-norm
    ]
    o1 = pipelines.semantic_gate_admit(
        spark.createDataFrame(b1, schema), table, centroids
    )
    assert {r.vec_id for r in o1.collect()} == {1, 2, 3}
    o1.unpersist()
    # cross-batch: an exact 4-dim dup of 1 is rejected; a 2-dim dup of
    # 2 is rejected via its own-dimension probe matrix; a fresh 2-dim
    # vector orthogonal-ish to 2 is admitted
    b2 = [
        (10, [1.0, 0.0, 0.0, 0.0]),
        (11, [2.0, 0.0]),          # cosine 1.0 with vec 2
        (12, [0.0, 1.0]),          # cosine 0 with vec 2
    ]
    o2 = pipelines.semantic_gate_admit(
        spark.createDataFrame(b2, schema), table, centroids
    )
    assert {r.vec_id for r in o2.collect()} == {12}
    o2.unpersist()


def test_semantic_pairs_driver_chunk_slots_match_distributed_kernel():
    """Zero-norm and ragged members must OCCUPY sub-bucket slots (the
    distributed kernel sorts them into the chunked array): with
    max_bucket=2, cell members [1: zero-norm, 2: v, 3: v] chunk as
    [1,2] + [3] — dropping the zero-norm row first would chunk [2,3]
    together and invent the (2,3) pair the distributed cap trades
    away."""
    from sparkstreaming_gmall_demo_spark.operators.similarity import (
        semantic_pairs_driver,
    )

    v = [1.0, 0.0]
    rows = [(1, 0, [0.0, 0.0], 0.0), (2, 0, v, 1.0), (3, 0, v, 1.0)]
    assert semantic_pairs_driver(rows, 0.95, max_bucket=2) == []
    # without the zero-norm occupant the pair is found
    rows2 = [(2, 0, v, 1.0), (3, 0, v, 1.0)]
    assert semantic_pairs_driver(rows2, 0.95, max_bucket=2) == [(2, 3)]


def test_semantic_gate_ttl_same_id_readmission_refreshes_stamp(spark, tmp_path):
    """A vec_id re-admitted after its index rows expired must insert a
    FRESH stamped row (merge keyed on (vec_id, admit_batch)): keyed on
    the bare id, the expired row blocked the new stamp and the content
    permanently stopped suppressing its near-dups."""
    centroids = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]
    schema = "vec_id long, embedding array<double>"
    table = str(tmp_path / "stamp_idx")
    v = [1.0, 0.0, 0.0, 0.0]
    # batch 0: admit id 7; ttl=2 -> expires for batches > 2
    pipelines.semantic_gate_admit(
        spark.createDataFrame([(7, v)], schema), table, centroids,
        ttl_batches=2, batch_id=0,
    ).unpersist()
    # batch 3: id 7 re-served (same id, same content) -> re-admitted
    o = pipelines.semantic_gate_admit(
        spark.createDataFrame([(7, v)], schema), table, centroids,
        ttl_batches=2, batch_id=3,
    )
    assert [r.vec_id for r in o.collect()] == [7]
    o.unpersist()
    stamps = {
        (r.vec_id, r.admit_batch)
        for r in txn.snapshot(spark, table).collect()
    }
    assert (7, 3) in stamps  # the refreshed stamp landed
    # batch 4: a near-dup of 7 must be SUPPRESSED by the fresh stamp
    o2 = pipelines.semantic_gate_admit(
        spark.createDataFrame([(8, v)], schema), table, centroids,
        ttl_batches=2, batch_id=4,
    )
    assert o2.count() == 0
    o2.unpersist()


def test_scd2_bucketed_layout_drift_raises(spark, tmp_path):
    """A caller re-applying with a different n_buckets must fail fast
    even when its keys hash into never-created bucket ids — the
    root-level layout record closes the empty-meta hole that would
    silently commit duplicate history."""
    import pytest

    root = str(tmp_path / "hist")
    obs = str(tmp_path / "obs")
    batch = spark.createDataFrame([(1, 10, "a")], "uid long, ts long, val string")
    pipelines.scd2_apply_batch_bucketed(
        batch, obs, root, "uid", "ts", ["val"], n_buckets=16, batch_id=0
    )
    with pytest.raises(ValueError, match="n_buckets=16"):
        pipelines.scd2_apply_batch_bucketed(
            batch, obs, root, "uid", "ts", ["val"], n_buckets=32, batch_id=1
        )


def test_gate_pipelines_compact_every_zero_disables_vacuum(spark, tmp_path):
    """compact_every=0 means 'never vacuum' (the sketch-pipeline
    convention), not ZeroDivisionError inside foreachBatch."""
    topic = tmp_path / "vecs0"
    _stage_batches(
        topic, _vec_table,
        [[(1, V_A)], [(2, [0.0, 1.0, 0.0, 0.0])]],
    )
    stream = (
        spark.readStream.schema(VEC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(topic))
    )
    q = pipelines.semantic_gate_pipeline(
        stream, str(tmp_path / "idx0"), str(tmp_path / "out0"),
        str(tmp_path / "ck0"), CENTROIDS,
        trigger={"availableNow": True}, ttl_batches=2, compact_every=0,
    )
    q.awaitTermination()
    got = {r.vec_id for r in spark.read.parquet(str(tmp_path / "out0")).collect()}
    assert got == {1, 2}


def test_semantic_gate_nprobe_recall_trade(spark, tmp_path):
    """The IVF bargain the bench's nprobe rows quantify, pinned as
    semantics: a near-dup whose stored twin sits in the probe's
    SECOND-nearest cell is missed (over-admitted) at nprobe=1 and
    caught at nprobe=2. Twin t sits just on c0's side of the c0/c1
    boundary; probe p is a near-duplicate (cosine ~0.9996) just on
    c1's side, so p assigns to c1 while t rests in c0."""
    centroids = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]
    schema = "vec_id long, embedding array<double>"
    t = _vec_with_cosine(0.7075)   # ~45° + eps: lands in c0
    p = _vec_with_cosine(0.7065)   # ~45° - eps: lands in c1, cos(t,p)≈1

    for nprobe, want in ((1, {2}), (2, set())):
        table = str(tmp_path / f"np{nprobe}")
        pipelines.semantic_gate_admit(
            spark.createDataFrame([(1, t)], schema), table, centroids,
            nprobe=nprobe,
        ).unpersist()
        out = pipelines.semantic_gate_admit(
            spark.createDataFrame([(2, p)], schema), table, centroids,
            nprobe=nprobe,
        )
        assert {r.vec_id for r in out.collect()} == want, nprobe
        out.unpersist()


def test_compact_files_order_by_clusters_files(spark, tmp_path):
    """order_by compaction preserves the snapshot row-set and leaves
    each data file covering a narrow value range (ZORDER-lite), so a
    reader's equality/IN filter on that column can skip whole files
    via parquet min/max stats."""
    import pyarrow.parquet as pq

    table = str(tmp_path / "ordered")
    df = spark.createDataFrame(
        [(i, i % 4) for i in range(400)], "vec_id long, cluster int"
    )
    txn.merge_keyed(df, table, key_cols=["vec_id"])
    before = {(r.vec_id, r.cluster) for r in txn.snapshot(spark, table).collect()}
    n_before, n_after = txn.compact_files(
        spark, table, target_files=4, order_by=["cluster"]
    )
    assert n_after <= 4
    after_snap = txn.snapshot(spark, table)
    assert {(r.vec_id, r.cluster) for r in after_snap.collect()} == before
    # every rewritten file covers at most ~one cluster value band
    files = [
        os.path.join(table, f)
        for f in txn._read_manifest(table, txn.current_version(table))
    ]
    spans = []
    for f in files:
        md = pq.read_metadata(f)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(1)  # cluster
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        spans.append((min(mins), max(maxs)))
    # range partitioning: file spans are non-overlapping (sorted)
    spans.sort()
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2


def test_semantic_gate_probe_pushes_cluster_filter(spark, tmp_path):
    """The probe's index side carries an In(cluster, probed) filter so
    a cluster-clustered index skips unprobed files — and admissions
    are unchanged by the pushdown (the kernel skipped those clusters
    anyway)."""
    # 4 well-separated centroids; the batch probes only 2 of them at
    # nprobe=2, so the filter is a real subset
    centroids = [
        [1.0, 0.0, 0.0, 0.0],
        [0.0, 1.0, 0.0, 0.0],
        [0.0, 0.0, 1.0, 0.0],
        [0.0, 0.0, 0.0, 1.0],
    ]
    schema = "vec_id long, embedding array<double>"
    table = str(tmp_path / "pushed_idx")
    seed = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [0.0, 0.0, 1.0, 0.0]),
        (4, [0.0, 0.0, 0.0, 1.0]),
    ]
    pipelines.semantic_gate_admit(
        spark.createDataFrame(seed, schema), table, centroids
    ).unpersist()
    # batch near c0 only: exact dup of 1 rejected, near-c0 novel kept
    out = pipelines.semantic_gate_admit(
        spark.createDataFrame(
            [(10, [1.0, 0.0, 0.0, 0.0]), (11, [0.9, 0.1, 0.0, 0.0])],
            schema,
        ),
        table, centroids, nprobe=2, threshold=0.999,
    )
    assert {r.vec_id for r in out.collect()} == {11}
    out.unpersist()
