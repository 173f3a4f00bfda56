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


def test_compact_to_bucketed_round_trip(spark, sf_dir, tmp_path):
    """Streaming-append layout (many small files) -> one bucketed
    layout: same rows, and a join on the bucket key no longer shuffles
    the compacted side."""
    from sparkstreaming_gmall_demo_spark.operators.bucketing import (
        compact_to_bucketed,
    )

    src = str(tmp_path / "append_sink")
    orders = load_table(spark, sf_dir, "orders")
    # simulate micro-batch appends: two slices written separately
    orders.filter(F.col("o_orderkey") % 2 == 0).write.mode("append").parquet(src)
    orders.filter(F.col("o_orderkey") % 2 == 1).write.mode("append").parquet(src)

    compact_to_bucketed(spark, src, "b_compacted", "o_orderkey", 4,
                        str(tmp_path / "compacted"))
    try:
        got = spark.table("b_compacted")
        assert got.count() == orders.count()

        other = load_table(spark, sf_dir, "lineitem").withColumnRenamed(
            "l_orderkey", "o_orderkey"
        )
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = (
                got.join(other, "o_orderkey")
                ._jdf.queryExecution().executedPlan().toString()
            )
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        # exactly one Exchange: the non-bucketed lineitem side
        assert plan.count("Exchange") == 1, plan
    finally:
        spark.sql("DROP TABLE IF EXISTS b_compacted")


def test_idempotent_append_bucketed_replay_and_plan(spark, tmp_path):
    from sparkstreaming_gmall_demo_spark.operators.bucketing import (
        idempotent_append_bucketed,
    )

    path = str(tmp_path / "sink")
    rows = lambda ids: spark.createDataFrame(
        [(i, f"payload-{i}") for i in ids], "sale_detail_id string, v string"
    )
    try:
        idempotent_append_bucketed(rows(["a", "b"]), "b_sink", "sale_detail_id", 4, path)
        # overlapping batch: only "c" is new
        idempotent_append_bucketed(rows(["b", "c"]), "b_sink", "sale_detail_id", 4, path)
        # full replay of the second batch: inserts nothing
        idempotent_append_bucketed(rows(["b", "c"]), "b_sink", "sale_detail_id", 4, path)
        got = sorted(r.sale_detail_id for r in spark.table("b_sink").collect())
        assert got == ["a", "b", "c"]

        # the replay-guard probe must not shuffle the sink side
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            probe = rows(["x"]).join(
                spark.table("b_sink").select("sale_detail_id"),
                on="sale_detail_id", how="left_anti",
            )
            plan = probe._jdf.queryExecution().executedPlan().toString()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        assert plan.count("Exchange") == 1, plan  # batch side only
    finally:
        spark.sql("DROP TABLE IF EXISTS b_sink")


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
