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


def test_aqe_splits_skewed_join(spark):
    """AQE must detect and split the hot key's partition in a skewed
    sort-merge join (thresholds lowered to trigger at test scale)."""
    hot = [(1, f"payload-{i:06d}" * 20) for i in range(20000)]
    cold = [(k, "x") for k in range(2, 2000)]
    left = spark.createDataFrame(hot + cold, ["k", "v"])
    right = spark.createDataFrame([(k, k * 10) for k in range(0, 2000)], ["k", "w"])

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
        "spark.sql.shuffle.partitions": "8",
    }
    old = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        joined = left.join(right, "k")
        # execute THIS dataframe (count() would plan a separate query
        # and AQE only finalizes executed plans)
        assert len(joined.collect()) == len(hot) + len(cold)  # k=1..1999 all match
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, "AQE did not split the skewed partition"
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)
