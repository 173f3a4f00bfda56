"""Round-6 third-wave operator tests: per-source dedup audit,
normalization-aware dedup delta, the hashed linear quality gate,
count-capped cluster sampling, rare-token discovery, and the weekly
cohort retention query.

These pin the operators the oracle entries (plans/extensions.py
ext_source_dedup_report / ext_normalization_dedup /
ext_hashed_classifier / ext_cluster_capped_sample /
ext_rare_token_docs and plans/registry.py q37_cohort_retention) are
built from, against hand fixtures and independent Python models — the
same discipline as tests/test_round6_ops.py and test_round6b_ops.py."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from sparkstreaming_gmall_demo_spark.operators import components as comp_ops
from sparkstreaming_gmall_demo_spark.operators import dedup as dedup_ops
from sparkstreaming_gmall_demo_spark.operators import sampling as samp_ops
from sparkstreaming_gmall_demo_spark.operators import text as text_ops
from sparkstreaming_gmall_demo_spark.operators import similarity as sim_ops
from sparkstreaming_gmall_demo_spark.operators import vocab as vocab_ops


# ---------------------------------------------------------------------------
# Per-source dedup audit
# ---------------------------------------------------------------------------
def _src_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id int, source string, text string")


def test_source_dedup_report_hand_case(spark):
    # src a: 3 docs, 2 unique ("x" twice); "x" also appears under src b.
    df = _src_df(
        spark,
        [
            (0, "a", "x"),
            (1, "a", "x"),
            (2, "a", "y"),
            (3, "b", "x"),
            (4, "b", "z"),
        ],
    )
    out = {
        r["source"]: r.asDict()
        for r in dedup_ops.source_dedup_report(df).collect()
    }
    assert out["a"]["n_docs"] == 3 and out["a"]["n_unique"] == 2
    assert out["a"]["dup_bp"] == 3333  # round(1 * 10000 / 3)
    assert out["a"]["cross_src_fps"] == 1  # "x" shared with b
    assert out["b"]["n_docs"] == 2 and out["b"]["n_unique"] == 2
    assert out["b"]["dup_bp"] == 0
    assert out["b"]["cross_src_fps"] == 1


def test_source_dedup_report_no_cross_overlap(spark):
    df = _src_df(spark, [(0, "a", "x"), (1, "b", "y")])
    out = {
        r["source"]: r.asDict()
        for r in dedup_ops.source_dedup_report(df).collect()
    }
    assert out["a"]["cross_src_fps"] == 0
    assert out["b"]["cross_src_fps"] == 0


def test_source_dedup_fingerprint_is_case_insensitive(spark):
    # "X" and "x" share the lower(text) fingerprint across sources.
    df = _src_df(spark, [(0, "a", "X"), (1, "b", "x")])
    out = {
        r["source"]: r.asDict()
        for r in dedup_ops.source_dedup_report(df).collect()
    }
    assert out["a"]["cross_src_fps"] == 1
    assert out["b"]["cross_src_fps"] == 1


# ---------------------------------------------------------------------------
# Normalization-aware dedup delta
# ---------------------------------------------------------------------------
def _lang_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id int, lang string, text string")


def test_normalization_dedup_exposes_reformatted_copies(spark):
    # Three raw-distinct docs; after canonicalization (lowercase, strip
    # punctuation, collapse whitespace) all three collapse to one.
    df = _lang_df(
        spark,
        [
            (0, "en", "Hello, world!"),
            (1, "en", "hello   world"),
            (2, "en", "HELLO WORLD"),
            (3, "en", "other text"),
        ],
    )
    out = dedup_ops.normalization_dedup_report(df).collect()[0]
    assert out["n_docs"] == 4
    assert out["uniq_raw"] == 4
    assert out["uniq_norm"] == 2
    assert out["norm_extra_dups"] == 2


def test_normalization_dedup_identity_when_already_canonical(spark):
    df = _lang_df(spark, [(0, "en", "plain text"), (1, "en", "more text")])
    out = dedup_ops.normalization_dedup_report(df).collect()[0]
    assert out["uniq_raw"] == out["uniq_norm"] == 2
    assert out["norm_extra_dups"] == 0


# ---------------------------------------------------------------------------
# Hashed linear quality gate
# ---------------------------------------------------------------------------
def _py_weight(token: str) -> int:
    """Independent Python model of hashed_classifier_weight_sql."""
    m = hashlib.md5(token.encode()).hexdigest()
    return (
        ord(m[0]) * 8191 + ord(m[1]) * 131 + ord(m[2]) * 17 + ord(m[3])
    ) % 1001 - 500


def test_hashed_classifier_matches_python_model(spark):
    texts = ["hello the x", "spark join window", "a b c d e"]
    df = _lang_df(spark, [(i, "en", t) for i, t in enumerate(texts)])
    out = text_ops.hashed_classifier_gate(df).collect()[0]
    scores = [sum(_py_weight(t) for t in s.split(" ")) for s in texts]
    assert out["n_docs"] == 3
    assert out["sum_score"] == sum(scores)
    assert out["n_keep"] == sum(1 for s in scores if s >= 0)


def test_hashed_classifier_weights_bounded(spark):
    # every per-token weight lands in [-500, 500]
    toks = [f"tok{i}" for i in range(200)]
    assert all(-500 <= _py_weight(t) <= 500 for t in toks)
    w = text_ops.hashed_classifier_weight_sql("t")
    df = spark.createDataFrame([(t,) for t in toks], "t string").select(
        F.expr(w).alias("w")
    )
    got = [r["w"] for r in df.collect()]
    assert got == [_py_weight(t) for t in toks]


def test_hashed_classifier_no_shuffle_before_rollup(spark):
    """The scoring pass must be a narrow map: exactly ONE exchange in
    the whole plan (the lang rollup), no explode/generate node."""
    df = _lang_df(spark, [(0, "en", "a b c")])
    plan = (
        text_ops.hashed_classifier_gate(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.lower().count("exchange") <= 1, plan
    assert "Generate" not in plan, plan


# ---------------------------------------------------------------------------
# Count-capped cluster sampling
# ---------------------------------------------------------------------------
def _pairs_df(spark, pairs):
    return spark.createDataFrame(pairs, "i long, j long")


def test_cluster_capped_sample_caps_each_cluster(spark):
    docs = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    # one 5-member cluster {0..4}, one 2-member {5,6}, singleton 7
    labels = comp_ops.connected_components(
        _pairs_df(spark, [(0, 1), (1, 2), (2, 3), (3, 4), (5, 6)])
    )
    kept = samp_ops.cluster_capped_sample(docs, labels, cap=3, salt="s").collect()
    by_group: dict = {}
    for r in kept:
        by_group.setdefault(r["group_key"], []).append(r["rk"])
    assert sorted(by_group[0]) == [1, 2, 3]  # capped at 3 of 5
    assert sorted(by_group[5]) == [1, 2]  # under cap: all kept
    assert by_group[7] == [1]  # singleton survives
    assert len(kept) == 6


def test_cluster_capped_sample_cap_one_is_keep_canonical_sized(spark):
    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    labels = comp_ops.connected_components(_pairs_df(spark, [(0, 1), (2, 3)]))
    kept = samp_ops.cluster_capped_sample(docs, labels, cap=1).collect()
    # one survivor per cluster: {0,1}, {2,3}, singletons 4, 5
    assert len(kept) == 4
    assert all(r["rk"] == 1 for r in kept)


def test_cluster_capped_sample_md5_rank_matches_python(spark):
    docs = spark.createDataFrame([(i,) for i in range(5)], "doc_id long")
    labels = comp_ops.connected_components(
        _pairs_df(spark, [(0, 1), (1, 2), (2, 3), (3, 4)])
    )
    kept = {
        r["doc_id"]
        for r in samp_ops.cluster_capped_sample(
            docs, labels, cap=2, salt="abc"
        ).collect()
    }
    rank = sorted(
        range(5),
        key=lambda i: (hashlib.md5(f"{i}abc".encode()).hexdigest()[:8], i),
    )
    assert kept == set(rank[:2])


def test_cluster_capped_sample_stable_under_repartition(spark):
    docs = spark.createDataFrame([(i,) for i in range(20)], "doc_id long")
    labels = comp_ops.connected_components(
        _pairs_df(spark, [(i, i + 1) for i in range(0, 18, 2)])
    )
    a = sorted(
        tuple(r)
        for r in samp_ops.cluster_capped_sample(docs, labels, cap=1).collect()
    )
    b = sorted(
        tuple(r)
        for r in samp_ops.cluster_capped_sample(
            docs.repartition(7), labels.repartition(3), cap=1
        ).collect()
    )
    assert a == b


# ---------------------------------------------------------------------------
# Rare-token discovery
# ---------------------------------------------------------------------------
def test_rare_token_report_hand_case(spark):
    # 3 docs; cutoff = floor(3 * 3400 / 10000) = 1: "common" (df 3)
    # and "pair" (df 2) are common, "unique0"/"unique1" (df 1) rare.
    df = _lang_df(
        spark,
        [
            (0, "en", "common unique0 pair"),
            (1, "en", "common unique1 pair"),
            (2, "en", "common common"),
        ],
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in vocab_ops.rare_token_report(df, max_df_bp=3400).collect()
    }
    assert set(out) == {0, 1}  # doc 2 has no rare tokens
    assert out[0]["n_rare"] == 1 and out[0]["n_distinct"] == 3
    assert out[0]["rare_bp"] == 3333
    assert out[1]["n_rare"] == 1


def test_rare_token_report_counts_distinct_not_occurrences(spark):
    # "rare rare rare" is one DISTINCT rare token, df accounting too.
    # 2 docs, cutoff = floor(2 * 5000 / 10000) = 1.
    df = _lang_df(spark, [(0, "en", "rare rare rare"), (1, "en", "base")])
    out = {
        r["doc_id"]: r.asDict()
        for r in vocab_ops.rare_token_report(df, max_df_bp=5000).collect()
    }
    assert out[0]["n_rare"] == 1 and out[0]["n_distinct"] == 1
    assert out[0]["rare_bp"] == 10000


def test_rare_token_report_cutoff_scales_with_corpus(spark):
    # The SAME bp threshold names the same Zipf tail as docs multiply:
    # token "solo" has df 1 of 2 docs (50%) -- NOT rare at 2500 bp --
    # but df 1 of 10 docs (10%) IS within a 2500 bp cutoff.
    small = _lang_df(spark, [(0, "en", "shared solo"), (1, "en", "shared other")])
    assert vocab_ops.rare_token_report(small, max_df_bp=2500).count() == 0
    big = _lang_df(
        spark,
        [(0, "en", "shared solo")] + [(i, "en", "shared") for i in range(1, 10)],
    )
    out = {
        r["doc_id"]: r["n_rare"]
        for r in vocab_ops.rare_token_report(big, max_df_bp=2500).collect()
    }
    assert out == {0: 1}  # only "solo" (df 1 <= cutoff 2) is rare


# ---------------------------------------------------------------------------
# Weekly cohort retention (q37)
# ---------------------------------------------------------------------------
def test_cohort_retention_offsets_and_counts(spark):
    from sparkstreaming_gmall_demo_spark.plans import REGISTRY
    import duckdb

    # semantics check on the real fixture: offset 0 row per cohort must
    # equal the cohort size, offsets are non-negative, and per-cohort
    # retained counts never exceed the cohort size.
    df = REGISTRY["q37_cohort_retention"].build(spark, "/root/testdata/sf0.001")
    rows = df.collect()
    base = {
        r["cohort_week"]: r["n_users"] for r in rows if r["week_offset"] == 0
    }
    assert base, "every cohort needs an offset-0 row"
    for r in rows:
        assert r["week_offset"] >= 0
        assert r["n_users"] <= base[r["cohort_week"]]


# ---------------------------------------------------------------------------
# TTL-bounded novelty gate (bounded streaming dedup state)
# ---------------------------------------------------------------------------
def _run_ttl_gate(spark, tmp_path, ckpt_name, ttl, compact_every=8):
    from sparkstreaming_gmall_demo_spark.streaming import pipelines

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "topic"))
    )
    q = pipelines.novelty_gate_pipeline(
        stream,
        str(tmp_path / "fp_index_ttl"),
        str(tmp_path / "novel_ttl"),
        str(tmp_path / ckpt_name),
        trigger={"availableNow": True},
        ttl_batches=ttl,
        compact_every=compact_every,
    )
    q.awaitTermination()


def _write_doc_batches(spark, tmp_path, batches):
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    topic = tmp_path / "topic"
    topic.mkdir()
    # FileStreamSource orders files by MODIFICATION TIME, not name —
    # same-instant writes arrive in arbitrary order. Pin strictly
    # ascending mtimes so file i IS micro-batch i.
    base = time.time() - 3600
    for i, rows in enumerate(batches):
        t = pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
        path = str(topic / f"c{i}.parquet")
        pq.write_table(t, path)
        os.utime(path, (base + 60 * i, base + 60 * i))


def test_ttl_gate_readmits_after_expiry(spark, tmp_path):
    """With ttl=2 a fingerprint suppresses duplicates for exactly the
    TWO batches after its admission (admit_batch >= batch_id - ttl),
    then the content is re-admitted and re-stamped."""
    _write_doc_batches(
        spark,
        tmp_path,
        [
            [(0, "alpha")],  # batch 0: novel -> admitted (stamp 0)
            [(1, "alpha")],  # batch 1: 0 >= 1-2 -> live -> suppressed
            [(2, "alpha")],  # batch 2: 0 >= 0 -> live -> suppressed
            [(3, "alpha")],  # batch 3: 0 >= 1 fails -> re-admitted
        ],
    )
    _run_ttl_gate(spark, tmp_path, "ckpt1", ttl=2)
    got = {
        r.doc_id for r in spark.read.parquet(str(tmp_path / "novel_ttl")).collect()
    }
    assert got == {0, 3}


def test_ttl_gate_vacuum_bounds_index_and_replay_is_noop(spark, tmp_path):
    """compact_every=2 vacuums expired rows (bounded state: the index
    holds only the TTL window's admissions), and a full replay from a
    fresh checkpoint leaves the doc sink unchanged."""
    from sparkstreaming_gmall_demo_spark.streaming import txn

    _write_doc_batches(
        spark,
        tmp_path,
        [
            [(0, "alpha")],
            [(1, "beta")],
            [(2, "alpha")],  # alpha stamp 0 >= 2-2 -> still live -> suppressed
            [(3, "gamma")],
        ],
    )
    _run_ttl_gate(spark, tmp_path, "ckpt1", ttl=2, compact_every=2)
    out = str(tmp_path / "novel_ttl")
    got = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert got == {0, 1, 3}
    # vacuum at batch 3 kept only stamps >= 1: (beta,1), (gamma,3)
    rows = {
        (r.fingerprint is not None, r.admit_batch)
        for r in txn.snapshot(spark, str(tmp_path / "fp_index_ttl")).collect()
    }
    assert {b for _, b in rows} == {1, 3}

    _run_ttl_gate(spark, tmp_path, "ckpt2", ttl=2, compact_every=2)
    assert {
        r.doc_id for r in spark.read.parquet(out).collect()
    } == got  # keyed append: replay adds nothing to the doc sink


# ---------------------------------------------------------------------------
# Curriculum schedule
# ---------------------------------------------------------------------------
def test_curriculum_schedule_orders_by_difficulty_then_md5(spark):
    rows = [(i, 10 if i < 4 else 5) for i in range(8)]  # docs 4..7 easier
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    out = samp_ops.curriculum_schedule(df, "n_chars", k=8, salt="x").collect()
    assert [r["step"] for r in out] == list(range(1, 9))
    # all easy docs (n_chars 5) come before every hard one
    assert [r["n_chars"] for r in sorted(out, key=lambda r: r["step"])] == [
        5, 5, 5, 5, 10, 10, 10, 10,
    ]
    # within a level, the md5-priority order, not id order
    easy = [r["doc_id"] for r in out if r["n_chars"] == 5]
    want = sorted(
        [4, 5, 6, 7],
        key=lambda i: (hashlib.md5(f"{i}x".encode()).hexdigest()[:8], i),
    )
    assert easy == want


def test_curriculum_schedule_k_bounds_and_determinism(spark):
    df = spark.createDataFrame(
        [(i, i % 3) for i in range(30)], "doc_id long, n_chars long"
    )
    a = [tuple(r) for r in samp_ops.curriculum_schedule(df, "n_chars", k=10).collect()]
    b = [
        tuple(r)
        for r in samp_ops.curriculum_schedule(
            df.repartition(7), "n_chars", k=10
        ).collect()
    ]
    assert len(a) == 10 and a == b


def test_curriculum_schedule_plans_topk_not_global_sort(spark):
    df = spark.createDataFrame([(i, i) for i in range(100)], "doc_id long, n_chars long")
    plan = (
        samp_ops.curriculum_schedule(df, "n_chars", k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan, plan


# ---------------------------------------------------------------------------
# OOV sweep
# ---------------------------------------------------------------------------
def test_oov_sweep_hand_case(spark):
    # 10 tokens: a x4, b x3, c x2, d x1 -> top1 covers a (oov 6/10),
    # top2 covers a,b (oov 3/10), top4 covers all (oov 0)
    df = spark.createDataFrame(
        [(0, "a a a a b b"), (1, "b c c d")], "doc_id long, text string"
    )
    out = {
        r["top_n"]: r.asDict() for r in vocab_ops.oov_sweep(df, [1, 2, 4]).collect()
    }
    assert out[1]["n_tokens"] == 10 and out[1]["oov_tokens"] == 6
    assert out[1]["oov_bp"] == 6000
    assert out[2]["oov_tokens"] == 3 and out[2]["oov_bp"] == 3000
    assert out[4]["oov_tokens"] == 0 and out[4]["oov_bp"] == 0


def test_oov_sweep_agrees_with_oov_rate_at_each_size(spark):
    # the sweep's corpus-level number at size N == sum over langs of
    # oov_rate(vocab_build(N)) — the single-pass trick changes nothing
    df = spark.createDataFrame(
        [(0, "en", "a a b c"), (1, "de", "b d d e")],
        "doc_id long, lang string, text string",
    )
    sweep = {
        r["top_n"]: r["oov_tokens"]
        for r in vocab_ops.oov_sweep(df, [2, 3]).collect()
    }
    for n in (2, 3):
        voc = vocab_ops.vocab_build(df, top_n=n)
        per_lang = vocab_ops.oov_rate(df, voc)
        total = per_lang.agg(F.sum("oov_tokens").alias("s")).collect()[0]["s"]
        assert sweep[n] == total, n


def test_oov_sweep_probe_broadcasts_single_token_shuffle(spark):
    df = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    plan = (
        vocab_ops.oov_sweep(df, [1, 2])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan, plan


# ---------------------------------------------------------------------------
# kNN label propagation
# ---------------------------------------------------------------------------
def _emb_df(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def test_knn_label_prop_majority_vote(spark):
    # query 0 sits on the x-axis; its 3 nearest are two label-7 vecs
    # and one label-3 vec -> majority 7 with 2 votes.
    rows = [
        (0, [1.0, 0.0], 3),
        (1, [0.9, 0.1], 7),
        (2, [0.9, -0.1], 7),
        (3, [0.7, 0.3], 3),
        (4, [0.0, 1.0], 5),
    ]
    out = sim_ops.knn_label_propagation(
        _emb_df(spark, rows), query_mod=5, k=3
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["vec_id"] == 0 and r["true_label"] == 3
    assert r["predicted_label"] == 7 and r["votes"] == 2


def test_knn_label_prop_excludes_self_and_breaks_ties_low_label(spark):
    # query 0's own row must not vote; the 2-2 vote tie between labels
    # 4 and 9 resolves to the LOWER label.
    rows = [
        (0, [1.0, 0.0], 9),
        (1, [1.0, 0.01], 9),
        (2, [1.0, -0.01], 9),
        (3, [1.0, 0.02], 4),
        (4, [1.0, -0.02], 4),
    ]
    out = sim_ops.knn_label_propagation(
        _emb_df(spark, rows), query_mod=5, k=4
    ).collect()
    r = out[0]
    assert r["predicted_label"] == 4 and r["votes"] == 2


def test_knn_label_prop_deterministic_under_repartition(spark):
    import random

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)], i % 4) for i in range(60)
    ]
    df = _emb_df(spark, rows)
    a = sorted(
        tuple(r) for r in sim_ops.knn_label_propagation(df, query_mod=10).collect()
    )
    b = sorted(
        tuple(r)
        for r in sim_ops.knn_label_propagation(
            df.repartition(9), query_mod=10
        ).collect()
    )
    assert a == b and len(a) == 6


# ---------------------------------------------------------------------------
# Streaming quality gate (rules + classifier cascade)
# ---------------------------------------------------------------------------
def test_quality_gate_streaming_matches_batch_and_replays_noop(spark, sf_dir, tmp_path):
    import pyarrow.parquet as pq

    from sparkstreaming_gmall_demo_spark.operators.text import (
        gopher_rules,
        hashed_classifier_score,
    )
    from sparkstreaming_gmall_demo_spark.streaming import pipelines, txn

    table = pq.read_table(f"{sf_dir}/documents.parquet")
    topic = tmp_path / "topic"
    topic.mkdir()
    n = table.num_rows
    step = (n + 1) // 2
    for i in range(2):
        pq.write_table(table.slice(i * step, step), str(topic / f"c{i}.parquet"))

    out = str(tmp_path / "gated")
    counts_table = str(tmp_path / "gate_counts")
    schema = "doc_id long, text string, lang string, source string, n_chars long"

    def run(ckpt):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(topic))
        )
        q = pipelines.quality_gate_pipeline(
            stream, out, counts_table, str(tmp_path / ckpt),
            trigger={"availableNow": True},
        )
        q.awaitTermination()

    run("ckpt1")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    want = {
        r["doc_id"]: (r["rules_keep"], r["score_sum"], r["admitted"])
        for r in gopher_rules(docs)
        .withColumn("score_sum", hashed_classifier_score("text"))
        .select(
            "doc_id",
            F.col("keep").cast("int").alias("rules_keep"),
            "score_sum",
            (F.col("keep") & (F.col("score_sum") >= 0)).cast("int").alias("admitted"),
        )
        .collect()
    }
    got = {
        r["doc_id"]: (r["rules_keep"], r["score_sum"], r["admitted"])
        for r in spark.read.parquet(out).collect()
    }
    assert got == want  # streaming == batch, per doc

    # monitoring counts: per-batch rows sum to the batch totals and the
    # admitted rows agree with the doc sink
    counts = txn.snapshot(spark, counts_table).collect()
    admitted_total = sum(r["n_docs"] for r in counts if r["rule"] == "admitted")
    assert admitted_total == sum(1 for v in want.values() if v[2] == 1)
    assert {r["batch_id"] for r in counts} == {0, 1}
    v_before = txn.current_version(counts_table)

    run("ckpt2")  # full replay from a fresh checkpoint
    assert {
        r["doc_id"]: (r["rules_keep"], r["score_sum"], r["admitted"])
        for r in spark.read.parquet(out).collect()
    } == want
    assert txn.current_version(counts_table) == v_before  # counts untouched


# ---------------------------------------------------------------------------
# Curation funnel
# ---------------------------------------------------------------------------
def test_curation_funnel_hand_case(spark):
    from sparkstreaming_gmall_demo_spark.operators.text import (
        curation_funnel,
        gopher_rules,
        hashed_classifier_score,
    )

    good = "the " + " ".join(f"w{i:03d}" for i in range(24))  # passes rules
    docs = [
        (0, good),
        (1, good),          # exact duplicate of 0 -> dedup drops one
        (2, "the cat"),     # fails too_few_tokens
        (3, good.upper()),  # case variant: rules outcome may differ; fp same as 0
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = {r["stage"]: r.asDict() for r in curation_funnel(df).collect()}
    assert rows["input"]["n_docs"] == 4 and rows["input"]["dropped"] == 0
    # independently recompute the gates
    flagged = gopher_rules(df).withColumn("s", hashed_classifier_score("text"))
    got = flagged.select("doc_id", "keep", "s").collect()
    n_rules = sum(1 for r in got if r["keep"])
    n_cls = sum(1 for r in got if r["keep"] and r["s"] >= 0)
    assert rows["rules_pass"]["n_docs"] == n_rules
    assert rows["rules_pass"]["dropped"] == 4 - n_rules
    assert rows["classifier_pass"]["n_docs"] == n_cls
    # survivors are distinct lower(text) fingerprints among gate-passers
    surv = {r["doc_id"] for r in got if r["keep"] and r["s"] >= 0}
    fps = {dict(docs)[d].lower() for d in surv}
    assert rows["dedup_survivor"]["n_docs"] == len(fps)


def test_curation_funnel_is_monotone_and_conserves(spark, sf_dir):
    from sparkstreaming_gmall_demo_spark.operators.text import curation_funnel
    from sparkstreaming_gmall_demo_spark.sources.fixtures import load_table

    rows = sorted(
        curation_funnel(load_table(spark, sf_dir, "documents")).collect(),
        key=lambda r: r["stage_order"],
    )
    counts = [r["n_docs"] for r in rows]
    assert counts == sorted(counts, reverse=True)  # never grows
    for prev, cur in zip(rows, rows[1:]):
        assert cur["dropped"] == prev["n_docs"] - cur["n_docs"]


def test_ttl_gate_migrates_legacy_unbounded_index(spark, tmp_path):
    """Enabling ttl_batches against an index table built by the
    unbounded mode must not crash: legacy rows (no admit_batch) are
    stamped as just-admitted on first contact and suppress for a full
    TTL from the switch-over."""
    from sparkstreaming_gmall_demo_spark.streaming import txn

    # seed a legacy single-column index containing alpha's fingerprint
    import hashlib

    legacy = spark.createDataFrame(
        [(hashlib.md5(b"alpha").hexdigest(),)], "fingerprint string"
    )
    txn.merge_keyed(legacy, str(tmp_path / "fp_index_ttl"), ["fingerprint"])

    _write_doc_batches(
        spark,
        tmp_path,
        [
            [(0, "alpha")],  # suppressed: legacy row stamped live
            [(1, "beta")],   # novel -> admitted
            [(2, "alpha")],  # still suppressed via the REWRITTEN table
        ],
    )
    _run_ttl_gate(spark, tmp_path, "ckpt1", ttl=3)
    got = {
        r.doc_id for r in spark.read.parquet(str(tmp_path / "novel_ttl")).collect()
    }
    assert got == {1}
    # the one-time rewrite left a uniformly two-column index
    idx = txn.snapshot(spark, str(tmp_path / "fp_index_ttl"))
    assert set(idx.columns) == {"fingerprint", "admit_batch"}
    assert idx.filter(F.col("admit_batch").isNull()).count() == 0
