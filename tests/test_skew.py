"""Salted two-phase aggregation == direct aggregation, on skewed data."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparkstreaming_gmall_demo_spark.operators.skew import salted_agg


@pytest.fixture()
def skewed(spark):
    # one hot key with 5000 rows, 50 cold keys with 10 each
    rows = [("hot", i, float(i % 97)) for i in range(5000)]
    for k in range(50):
        rows += [(f"cold{k:02d}", i, float(i)) for i in range(10)]
    return spark.createDataFrame(rows, ["k", "v", "x"])


def test_salted_agg_equals_direct(spark, skewed):
    direct = {
        r.k: (r.s, r.c, r.mn, r.mx)
        for r in skewed.groupBy("k")
        .agg(F.sum("v").alias("s"), F.count("v").alias("c"),
             F.min("x").alias("mn"), F.max("x").alias("mx"))
        .collect()
    }
    salted = {
        r.k: (r.s, r.c, r.mn, r.mx)
        for r in salted_agg(
            skewed, ["k"],
            {"s": ("sum", "v"), "c": ("count", "v"),
             "mn": ("min", "x"), "mx": ("max", "x")},
            salt=8,
        ).collect()
    }
    assert salted == direct


def test_salted_agg_deterministic_salting(spark, skewed):
    a = salted_agg(skewed, ["k"], {"s": ("sum", "v")}, salt=8).collect()
    b = salted_agg(skewed, ["k"], {"s": ("sum", "v")}, salt=8).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_salted_agg_rejects_non_algebraic(spark, skewed):
    with pytest.raises(ValueError):
        salted_agg(skewed, ["k"], {"d": ("count_distinct", "v")})
