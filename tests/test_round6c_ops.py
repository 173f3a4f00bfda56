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
