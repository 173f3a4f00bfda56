"""Exhaustive boundary sweeps for the arithmetic-sensitive operators.

Instead of per-example round-trips, each sweep ships ALL cases through
one Spark job and compares against a pure-Python reference model —
thousands of cases per test at one job's cost.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from sparkstreaming_gmall_demo_spark.functions import permille
from sparkstreaming_gmall_demo_spark.operators import pagination as page_ops
from sparkstreaming_gmall_demo_spark.operators.text import ROLLING_MOD, rolling_fingerprint


def test_permille_matches_java_math_round_exhaustively(spark):
    """permille must equal Java Math.round(cnt*1000D/total) = floor(x+0.5)
    for every cnt 0..total across awkward totals (odd, prime, huge)."""
    totals = [1, 2, 3, 7, 9, 11, 400, 997, 1000, 12345]
    cases = [(c, t) for t in totals for c in range(0, t + 1, max(1, t // 500))]
    df = spark.createDataFrame(cases, ["cnt", "total"])
    got = {
        (r.cnt, r.total): r.p
        for r in df.select("cnt", "total", permille("cnt", "total").alias("p")).collect()
    }
    for c, t in cases:
        want = int(math.floor(c * 1000.0 / t + 0.5))
        assert got[(c, t)] == want, (c, t)


def _py_rolling(text: str) -> int:
    import hashlib

    acc = 0
    for tok in text.split(" "):
        v = int(hashlib.md5(tok.encode()).hexdigest()[:7], 16)
        acc = (acc * 31 + v) % ROLLING_MOD
    return acc


def test_rolling_fingerprint_matches_python_model(spark):
    """Spark fold == pure-Python fold on adversarial token streams:
    repeats, order swaps, empty tokens, unicode."""
    texts = [
        "a", "a a", "a b", "b a",  # order-sensitivity
        "a a a a a a a a a a",
        " leading", "trailing ", "double  space",  # empty tokens from split
        "münchen 北京 café",
        "the quick brown fox jumps over the lazy dog",
    ] + [f"tok{i} tok{(i*7)%13} tok{(i*11)%17}" for i in range(200)]
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    got = {r.text: r.rolling_fp for r in rolling_fingerprint(df).collect()}
    for t in texts:
        assert got[t] == _py_rolling(t), repr(t)


def test_pagination_partitions_the_ordered_stream(spark):
    """Pages must concatenate to exactly the ordered whole — no gaps,
    no overlaps, deterministic — for sizes that divide and don't."""
    rows = [(f"id{i:03d}", i) for i in range(20)]
    df = spark.createDataFrame(rows, ["event_id", "v"])
    want = sorted(r[0] for r in rows)
    for size in (1, 3, 7, 20, 50):
        seen: list = []
        p = 1
        while True:
            page = [
                r.event_id
                for r in page_ops.page(df, ["event_id"], p, size).collect()
            ]
            if not page:
                break
            seen.extend(page)
            p += 1
        assert seen == want, f"size={size}"
