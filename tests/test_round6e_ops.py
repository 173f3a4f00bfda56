"""Round-6 fifth-wave operator tests: winnowing fingerprints (MOSS),
the source content-overlap matrix, and per-language classifier
calibration — hand fixtures + independent Python models, including the
winnowing DETECTION GUARANTEE property (any shared token run of length
>= w + k - 1 shares a selected fingerprint)."""

from __future__ import annotations

import hashlib
import random

from pyspark.sql import functions as F

from sparkstreaming_gmall_demo_spark.operators import text as text_ops


# ---------------------------------------------------------------------------
# Winnowing
# ---------------------------------------------------------------------------
def _winnow_model(tokens: list[str], k: int, w: int) -> set[tuple[int, int]]:
    """Direct restatement of the paper: hash k-grams, window of w,
    keep each window's min (ties -> leftmost), dedupe."""
    grams = [" ".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)]
    keys = [
        int(hashlib.md5(g.encode()).hexdigest()[:10], 16) * 1048576 + i + 1
        for i, g in enumerate(grams)
    ]
    out = set()
    for j in range(len(keys) - w + 1):
        key = min(keys[j : j + w])
        out.add((key % 1048576, key // 1048576))
    return out


def _fp_df(spark, docs: dict[int, str]):
    return spark.createDataFrame(
        [(i, t) for i, t in docs.items()], "doc_id bigint, text string"
    )


def test_winnowing_matches_python_model(spark):
    rng = random.Random(7)
    docs = {
        i: " ".join(rng.choice("abcdefgh") for _ in range(rng.randint(7, 40)))
        for i in range(12)
    }
    got: dict[int, set] = {}
    for r in text_ops.winnowing_fingerprints(_fp_df(spark, docs), 4, 4).collect():
        got.setdefault(r.doc_id, set()).add((r.pos, r.fp))
    want = {
        i: _winnow_model(t.split(" "), 4, 4)
        for i, t in docs.items()
        if len(t.split(" ")) >= 7
    }
    assert got == want


def test_winnowing_detection_guarantee(spark):
    # plant the same (w + k - 1)-token run inside two otherwise
    # unrelated documents at different offsets: they MUST share a
    # selected fingerprint value (position-independent).
    k, w = 4, 4
    run = "p q r s t u v"  # w + k - 1 = 7 tokens
    rng = random.Random(13)
    for trial in range(5):
        pre_a = " ".join(rng.choice("abc") for _ in range(rng.randint(0, 9)))
        post_a = " ".join(rng.choice("abc") for _ in range(rng.randint(0, 9)))
        pre_b = " ".join(rng.choice("xyz") for _ in range(rng.randint(0, 9)))
        post_b = " ".join(rng.choice("xyz") for _ in range(rng.randint(0, 9)))
        doc_a = " ".join(x for x in (pre_a, run, post_a) if x)
        doc_b = " ".join(x for x in (pre_b, run, post_b) if x)
        rows = text_ops.winnowing_fingerprints(
            _fp_df(spark, {0: doc_a, 1: doc_b}), k, w
        ).collect()
        fps = {0: set(), 1: set()}
        for r in rows:
            fps[r.doc_id].add(r.fp)
        assert fps[0] & fps[1], (trial, doc_a, doc_b)


def test_winnowing_density_and_short_doc(spark):
    # expected density ~2/(w+1); assert selected strictly fewer than
    # all grams on a long doc, and short docs (< k+w-1 tokens) drop.
    long_doc = " ".join(f"t{i % 17}" for i in range(200))
    df = _fp_df(spark, {0: long_doc, 1: "a b c"})
    rows = text_ops.winnowing_fingerprints(df, 4, 4).collect()
    assert {r.doc_id for r in rows} == {0}
    n_grams = 200 - 4 + 1
    n_sel = len(rows)
    assert 0 < n_sel < n_grams / 2  # well under half; ~2/(w+1)=0.4


# ---------------------------------------------------------------------------
# Source overlap matrix
# ---------------------------------------------------------------------------
def test_source_overlap_matrix_hand_case(spark):
    rows = [
        (0, "a", "x"),
        (1, "a", "y"),
        (2, "a", "x"),   # dup inside a: collapses in distinct fps
        (3, "b", "x"),
        (4, "b", "z"),
        (5, "c", "w"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, text string")
    out = {
        (r.source_a, r.source_b): r.asDict()
        for r in text_ops.source_overlap_matrix(df).collect()
    }
    ab = out[("a", "b")]
    assert ab["fps_a"] == 2 and ab["fps_b"] == 2 and ab["shared_fps"] == 1
    assert ab["overlap_bp"] == 5000
    assert ("a", "c") not in out and ("b", "c") not in out  # no overlap rows


def test_source_overlap_full_mirror_reads_10000(spark):
    rows = [(0, "big", "x"), (1, "big", "y"), (2, "big", "z"), (3, "small", "x")]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, text string")
    out = text_ops.source_overlap_matrix(df).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.source_a, r.source_b) == ("big", "small")
    assert r.overlap_bp == 10000  # containment-normalized by the small side


# ---------------------------------------------------------------------------
# Quality calibration
# ---------------------------------------------------------------------------
def test_quality_calibration_hand_case(spark):
    # score each candidate text once, then build languages with KNOWN
    # score multisets; verify percentiles against the Python model.
    import statistics

    probe = spark.createDataFrame(
        [(i, f"t{i}") for i in range(40)], "doc_id bigint, text string"
    ).select("doc_id", "text", text_ops.hashed_classifier_score("text").alias("s"))
    scored = [(r.text, r.s) for r in probe.collect()]
    la = scored[:7]
    lb = scored[7:20]
    rows = [(i, "aa", t) for i, (t, _) in enumerate(la)]
    rows += [(100 + i, "bb", t) for i, (t, _) in enumerate(lb)]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string, text string")
    out = {r.lang: r.asDict() for r in text_ops.quality_calibration(df).collect()}

    for lang, sub in (("aa", la), ("bb", lb)):
        vals = sorted(s for _, s in sub)
        # exact interpolated percentile (inclusive / type-7), the
        # definition both engines implement
        def pct(p):
            idx = (len(vals) - 1) * p
            lo, hi = int(idx), min(int(idx) + 1, len(vals) - 1)
            return vals[lo] + (vals[hi] - vals[lo]) * (idx - lo)

        assert out[lang]["n_docs"] == len(vals)
        assert abs(out[lang]["p50"] - pct(0.5)) < 1e-6, lang
        assert abs(out[lang]["p10"] - pct(0.1)) < 1e-6, lang
        assert abs(out[lang]["p90"] - pct(0.9)) < 1e-6, lang
        keep = sum(1 for v in vals if v >= 0)
        assert out[lang]["keep_bp"] == keep * 10000 // len(vals)
        del pct
