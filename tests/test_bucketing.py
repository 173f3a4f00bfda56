"""Bucketed co-located joins: plan must contain no Exchange; results
must equal the plain join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparkstreaming_gmall_demo_spark.operators.bucketing import (
    bucketed_join,
    write_bucketed,
)
from sparkstreaming_gmall_demo_spark.sources.fixtures import load_table


@pytest.fixture()
def bucketed_tables(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    write_bucketed(orders, "b_orders", "o_orderkey", 4, str(tmp_path / "o"))
    write_bucketed(lineitem, "b_lineitem", "o_orderkey", 4, str(tmp_path / "l"))
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    lt, rt = bucketed_tables
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, lt, rt, "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, "bucketed join still shuffles"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed_tables):
    lt, rt = bucketed_tables
    got = (
        bucketed_join(spark, lt, rt, "o_orderkey")
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("c"), F.sum("l_quantity").alias("q"))
        .collect()
    )
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    want = (
        orders.join(lineitem, orders["o_orderkey"] == lineitem["l_orderkey"])
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("c"), F.sum("l_quantity").alias("q"))
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
