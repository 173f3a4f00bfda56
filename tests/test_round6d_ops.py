"""Round-6 fourth-wave operator tests: UniMax water-filling quotas,
Zipf slope fitting, source JS-divergence, embedding health audit,
Wilson-LCB source ranking, and the n-gram novelty curve.

These pin the operators behind the wave-4 oracle entries
(plans/extensions.py ext_unimax_mix / ext_zipf_slope /
ext_source_divergence / ext_embedding_health / ext_wilson_source_rank
/ ext_ngram_novelty) against hand fixtures and independent Python
models — the discipline of test_round6_ops.py..test_round6c_ops.py."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from sparkstreaming_gmall_demo_spark.operators import sampling as samp_ops
from sparkstreaming_gmall_demo_spark.operators import similarity as sim_ops
from sparkstreaming_gmall_demo_spark.operators import text as text_ops
from sparkstreaming_gmall_demo_spark.operators import vocab as vocab_ops


# ---------------------------------------------------------------------------
# UniMax water-filling
# ---------------------------------------------------------------------------
def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, lang string")


def _unimax_model(counts: dict[str, int], budget: int, cap: int) -> dict[str, int]:
    """The paper's sequential greedy loop in EXACT fraction arithmetic
    (no per-step flooring — the fractional allocations all equal the
    water level theta), then the operator's documented integerization:
    alloc = min(avail, floor(theta)). A model that floored per step
    would roll each group's rounding loss forward and hand the last
    group a larger share — a different (order-dependent) contract."""
    from fractions import Fraction

    items = sorted(counts.items(), key=lambda kv: (kv[1] * cap, kv[0]))
    rem, rem_groups = Fraction(budget), len(items)
    out = {}
    for lang, n in items:
        share = rem / rem_groups
        frac = min(Fraction(n * cap), share)
        out[lang] = min(n * cap, max(math.floor(round(float(share), 6)), 0)) \
            if frac == share else n * cap
        rem -= frac
        rem_groups -= 1
    return out


def test_unimax_water_level_bisects(spark):
    # avail: a=4, b=8, c=20; budget 18 -> a saturates (4*3=12<=18),
    # b: 4+8*2=20>18 -> water level theta=(18-4)/2=7 -> b=7, c=7.
    counts = {"a": 2, "b": 4, "c": 10}
    rows = []
    i = 0
    for lang, n in counts.items():
        for _ in range(n):
            rows.append((i, lang))
            i += 1
    out = {
        r["lang"]: r.asDict()
        for r in samp_ops.unimax_quotas(_docs(spark, rows), "lang", 18, 2).collect()
    }
    assert out["a"]["alloc"] == 4 and out["b"]["alloc"] == 7 and out["c"]["alloc"] == 7
    assert out["a"]["epochs_permille"] == 2000  # full 2 epochs
    assert out["c"]["epochs_permille"] == 700


def test_unimax_all_saturate_when_budget_exceeds_corpus(spark):
    counts = {"a": 3, "b": 5}
    rows = [(i, lang) for i, lang in enumerate(
        [l for l, n in counts.items() for _ in range(n)])]
    out = {
        r["lang"]: r["alloc"]
        for r in samp_ops.unimax_quotas(_docs(spark, rows), "lang", 10_000, 2).collect()
    }
    assert out == {"a": 6, "b": 10}


def test_unimax_matches_sequential_model(spark):
    counts = {"a": 1, "b": 3, "c": 7, "d": 19, "e": 50}
    rows = [(i, lang) for i, lang in enumerate(
        [l for l, n in counts.items() for _ in range(n)])]
    df = _docs(spark, rows)
    for budget in (5, 40, 77, 120, 200):
        got = {
            r["lang"]: r["alloc"]
            for r in samp_ops.unimax_quotas(df, "lang", budget, 3).collect()
        }
        assert got == _unimax_model(counts, budget, 3), budget


# ---------------------------------------------------------------------------
# Zipf slope
# ---------------------------------------------------------------------------
def test_zipf_slope_exact_power_law(spark):
    # freqs 8,4,2,1 over ranks 1..4: ln f = ln 8 - ln2 * ln r / ln ...
    # Construct exact slope -1 in log2 space: f_r = 16 / 2^r gives
    # ln f = ln 16 - r ln 2, which is NOT linear in ln r. Instead use
    # f_r = C / r (slope exactly -1): freqs 12, 6, 4, 3 = 12/r.
    words = []
    for rank, freq in enumerate([12, 6, 4, 3], start=1):
        words.extend([f"w{rank}"] * freq)
    df = spark.createDataFrame(
        [(0, "en", " ".join(words))], "doc_id bigint, lang string, text string"
    )
    row = vocab_ops.zipf_slope(df, top_v=4).collect()[0]
    assert row["v"] == 4
    assert abs(row["slope"] + 1.0) < 1e-9
    assert abs(row["intercept"] - math.log(12.0)) < 1e-3


def test_zipf_slope_rank_tiebreak_deterministic(spark):
    # two tokens with equal counts: rank order must be (cnt DESC,
    # token ASC) — the slope is then a fixed value, same every run.
    df = spark.createDataFrame(
        [(0, "en", "b b a a c")], "doc_id bigint, lang string, text string"
    )
    r1 = vocab_ops.zipf_slope(df, top_v=3).collect()[0]
    r2 = vocab_ops.zipf_slope(df.repartition(8), top_v=3).collect()[0]
    assert r1["slope"] == r2["slope"] and r1["intercept"] == r2["intercept"]


def test_zipf_slope_single_token_language_is_null_not_nan(spark):
    """Round-6 ADVICE: v=1 means var_pop(lx)=0 — the guarded division
    must report slope/intercept NULL (no line fits one point), and the
    healthy language in the same frame keeps its fit."""
    df = spark.createDataFrame(
        [(0, "xx", "only only only"), (1, "en", "a a b")],
        "doc_id bigint, lang string, text string",
    )
    out = {r["lang"]: r for r in vocab_ops.zipf_slope(df, top_v=4).collect()}
    assert out["xx"]["v"] == 1
    assert out["xx"]["slope"] is None and out["xx"]["intercept"] is None
    assert out["en"]["v"] == 2 and out["en"]["slope"] is not None


# ---------------------------------------------------------------------------
# Source divergence
# ---------------------------------------------------------------------------
def _jsd_model(p: dict, q: dict) -> float:
    tot_p, tot_q = sum(p.values()), sum(q.values())
    out = 0.0
    for t in set(p) | set(q):
        pp = p.get(t, 0) / tot_p
        qq = q.get(t, 0) / tot_q
        m = (pp + qq) / 2
        if pp:
            out += 0.5 * pp * math.log(pp / m)
        if qq:
            out += 0.5 * qq * math.log(qq / m)
    return out


def test_source_divergence_identical_source_is_zero(spark):
    df = spark.createDataFrame(
        [(0, "a", "x y z"), (1, "b", "x y z")],
        "doc_id bigint, source string, text string",
    )
    vocab = vocab_ops.vocab_build(df, 10)
    out = {r["source"]: r["jsd4"] for r in vocab_ops.source_divergence(df, vocab).collect()}
    # each source's distribution equals... NOT the corpus exactly
    # (corpus = both), but here both sources are identical, so each
    # equals the pooled corpus -> JSD 0 on both.
    assert out == {"a": 0.0, "b": 0.0}


def test_source_divergence_matches_python_model(spark):
    rows = [
        (0, "a", "x x y"),
        (1, "a", "x z"),
        (2, "b", "y y z w"),
        (3, "b", "w w"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, text string")
    vocab = vocab_ops.vocab_build(df, 10)
    got = {r["source"]: r["jsd4"] for r in vocab_ops.source_divergence(df, vocab).collect()}
    corpus: dict[str, int] = {}
    per_src: dict[str, dict[str, int]] = {}
    for _, src, text in rows:
        d = per_src.setdefault(src, {})
        for t in text.split(" "):
            corpus[t] = corpus.get(t, 0) + 1
            d[t] = d.get(t, 0) + 1
    for src, dist in per_src.items():
        assert abs(got[src] - _jsd_model(dist, corpus)) < 1e-4, src


def test_source_divergence_bounded_by_ln2(spark):
    # disjoint vocabularies: JSD vs corpus is strictly below ln 2
    # (the corpus contains the source itself), and positive.
    df = spark.createDataFrame(
        [(0, "a", "x x x"), (1, "b", "y y y")],
        "doc_id bigint, source string, text string",
    )
    vocab = vocab_ops.vocab_build(df, 10)
    for r in vocab_ops.source_divergence(df, vocab).collect():
        assert 0.0 < r["jsd4"] < math.log(2.0)


# ---------------------------------------------------------------------------
# Embedding health
# ---------------------------------------------------------------------------
def test_embedding_health_hand_case(spark):
    rows = [
        (0, [3.0, 4.0], 0),          # norm 5
        (1, [0.0, 0.0], 0),          # zero norm
        (2, [float("nan"), 1.0], 1),  # one non-finite
        (3, [1.0, 2.0, 2.0], 1),     # ragged: dim 3, norm 3
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>, label int")
    out = {r["label"]: r.asDict() for r in sim_ops.embedding_health(df).collect()}
    assert out[0]["n_vecs"] == 2 and out[0]["n_zero_norm"] == 1
    assert out[0]["dim_min"] == 2 and out[0]["dim_max"] == 2
    assert out[0]["avg_norm"] == 2.5 and out[0]["max_norm"] == 5.0
    assert out[1]["n_nonfinite"] == 1
    assert out[1]["dim_min"] == 2 and out[1]["dim_max"] == 3
    assert out[1]["max_norm"] == 3.0


def test_embedding_health_null_element_counts_as_nonfinite(spark):
    """Round-6 ADVICE: a NULL array element must land in n_nonfinite —
    before the fix it nulled the norm (dropping the vector from the
    envelope) while isnan(NULL)'s three-valued logic counted nf=0, so
    the malformed vector was reported NOWHERE."""
    rows = [
        (0, [None, 1.0], 0),   # NULL element: non-finite, no norm
        (1, [3.0, 4.0], 0),    # healthy: norm 5
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>, label int")
    out = sim_ops.embedding_health(df).collect()[0]
    assert out["n_vecs"] == 2
    assert out["n_nonfinite"] == 1
    assert out["n_zero_norm"] == 0
    # envelope computed over the one finite vector only
    assert out["avg_norm"] == 5.0 and out["min_norm"] == 5.0 and out["max_norm"] == 5.0


# ---------------------------------------------------------------------------
# Wilson source rank
# ---------------------------------------------------------------------------
def _wilson_lcb(k: int, n: int, z: float = 1.96) -> float:
    p = k / n
    z2 = z * z
    return (p + z2 / (2 * n) - z * math.sqrt((p * (1 - p) + z2 / (4 * n)) / n)) / (
        1 + z2 / n
    )


def test_wilson_rank_small_perfect_source_loses(spark):
    # source "tiny": 2/2 keeps; source "big": 90/100 keeps.
    # Raw ratio ranks tiny first; Wilson LCB must rank big first.
    # Build texts with known keep outcome by probing the classifier.
    probe = spark.createDataFrame(
        [(i, f"t{i}") for i in range(200)], "doc_id bigint, text string"
    ).select("doc_id", "text", (text_ops.hashed_classifier_score("text") >= 0).alias("k"))
    kept = [r["text"] for r in probe.filter("k").limit(100).collect()]
    dropped = [r["text"] for r in probe.filter("NOT k").limit(10).collect()]
    assert len(kept) >= 92 and len(dropped) >= 10
    rows = [(i, "tiny", kept[i]) for i in range(2)]
    rows += [(100 + i, "big", kept[2 + i]) for i in range(90)]
    rows += [(500 + i, "big", dropped[i]) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, text string")
    out = {r["source"]: r.asDict() for r in text_ops.wilson_source_rank(df).collect()}
    assert out["tiny"]["keep_bp"] == 10000 and out["big"]["keep_bp"] == 9000
    assert out["big"]["rank"] == 1 and out["tiny"]["rank"] == 2
    assert out["big"]["wilson_lcb_bp"] == math.floor(_wilson_lcb(90, 100) * 10000)
    assert out["tiny"]["wilson_lcb_bp"] == math.floor(_wilson_lcb(2, 2) * 10000)


# ---------------------------------------------------------------------------
# N-gram novelty
# ---------------------------------------------------------------------------
def test_ngram_novelty_hand_case(spark):
    # batches by doc_id % 2: batch 0 = docs 0,2; batch 1 = doc 1.
    # doc0: "a b c" -> grams {a b, b c}; doc2: "a b" -> {a b};
    # doc1: "b c d" -> {b c, c d}.
    # batch 0 grams {ab, bc} (both new); batch 1 {bc, cd}: bc seen in
    # batch 0 -> n_new 1 of 2.
    df = spark.createDataFrame(
        [(0, "a b c"), (1, "b c d"), (2, "a b")],
        "doc_id bigint, text string",
    )
    out = {r["batch"]: r.asDict() for r in text_ops.ngram_novelty(df, 2).collect()}
    assert out[0]["n_grams"] == 2 and out[0]["n_new"] == 2 and out[0]["new_bp"] == 10000
    assert out[1]["n_grams"] == 2 and out[1]["n_new"] == 1 and out[1]["new_bp"] == 5000


def test_ngram_novelty_digest_is_md5_of_bigram(spark):
    df = spark.createDataFrame([(0, "hello world")], "doc_id bigint, text string")
    # single bigram; verify the operator counts it once and the digest
    # convention (first 16 hex of md5("hello world")) drives dedup:
    # a second doc with the same bigram in another batch is not new.
    df2 = spark.createDataFrame(
        [(0, "hello world"), (1, "hello world")], "doc_id bigint, text string"
    )
    out = {r["batch"]: r["n_new"] for r in text_ops.ngram_novelty(df2, 2).collect()}
    assert out == {0: 1, 1: 0}
    expected = hashlib.md5(b"hello world").hexdigest()[:16]
    got = (
        df.select(
            F.explode(
                F.array_distinct(
                    F.expr(
                        "transform(slice(split(text, ' '), 1, "
                        "size(split(text, ' ')) - 1), "
                        "(t, i) -> substring(md5(concat_ws(' ', t, "
                        "element_at(split(text, ' '), i + 2))), 1, 16))"
                    )
                )
            ).alias("d")
        ).collect()[0]["d"]
    )
    assert got == expected


def test_ngram_novelty_single_token_docs_contribute_nothing(spark):
    df = spark.createDataFrame(
        [(0, "a b"), (1, "x")], "doc_id bigint, text string"
    )
    out = {r["batch"]: r["n_grams"] for r in text_ops.ngram_novelty(df, 2).collect()}
    assert out == {0: 1}


def test_reference_divergence_vs_pooled_corpus_is_source_divergence(spark):
    # freezing the reference AS the pooled corpus distribution must
    # reproduce source_divergence exactly — same q values, same fold.
    rows = [
        (0, "a", "x x y"),
        (1, "a", "x z"),
        (2, "b", "y y z w"),
        (3, "b", "w w"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, text string")
    vocab = vocab_ops.vocab_build(df, 10)
    ref = vocab_ops.vocab_distribution(vocab)
    a = {r["source"]: r.asDict() for r in vocab_ops.source_divergence(df, vocab).collect()}
    b = {r["source"]: r.asDict() for r in vocab_ops.reference_divergence(df, ref).collect()}
    assert a == b


def test_reference_divergence_detects_drift(spark):
    # reference frozen on x/y text; a drifted slice (all z/w) must
    # score strictly higher JSD than a conforming slice.
    base = spark.createDataFrame(
        [(0, "a", "x y x y"), (1, "a", "x y")],
        "doc_id bigint, source string, text string",
    )
    ref = vocab_ops.vocab_distribution(vocab_ops.vocab_build(base, 10))
    conforming = spark.createDataFrame(
        [(2, "a", "x y")], "doc_id bigint, source string, text string"
    )
    # drifted slice still must share SOME support with the reference
    # (tokens outside it are ignored by construction)
    drifted = spark.createDataFrame(
        [(3, "a", "y y y y y y")], "doc_id bigint, source string, text string"
    )
    j_ok = vocab_ops.reference_divergence(conforming, ref).collect()[0]["jsd4"]
    j_bad = vocab_ops.reference_divergence(drifted, ref).collect()[0]["jsd4"]
    assert j_ok == 0.0  # "x y" ~ exactly the reference mix
    assert j_bad > j_ok
