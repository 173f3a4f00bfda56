"""Join operators: the sale-detail denormalization family.

Reference semantics reproduced:
- stream-stream full outer equi-join on order_id with 1:N fanout
  (reference app/SaleDetailApp.scala:50-51) plus its hand-rolled Redis
  TTL-10s late-data completion (:53-139) -- in batch form a plain
  ``full_outer`` join; the streaming form with watermarks lives in
  streaming.pipelines.
- per-record Redis dimension lookup (reference
  app/SaleDetailApp.scala:142-157) -> broadcast hash join against the
  dim table: the single biggest scale win over the reference (no
  per-record network round-trips; dim ships once per executor).

Scale notes: orders and lineitem are both large -> Spark picks
sort-merge with AQE skew splitting for the full outer (broadcast is
impossible for full outer anyway); customer is small relative to the
fact side -> explicit ``broadcast()`` hint so the dim join adds no
shuffle. At 100 TB, bucketing both fact tables on the order key would
remove the remaining shuffle entirely; the declarative form here lets
AQE/bucketing do that without code change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def full_outer_fanout_join(left: DataFrame, right: DataFrame, key_left: str, key_right: str) -> DataFrame:
    """Full outer equi-join keeping both unmatched sides (reference
    app/SaleDetailApp.scala:50-51 fullOuterJoin semantics, incl. 1:N
    fanout of details under one order).

    SHUFFLE_HASH hint on the smaller (left/orders) side: full outer
    can't broadcast, and hash beats sort-merge here by skipping both
    sorts; Spark's shuffled hash join spills build-side partitions, and
    AQE still splits skewed keys, so this holds at cluster scale.
    """
    return left.hint("SHUFFLE_HASH").join(
        right, left[key_left] == right[key_right], "full_outer"
    )


def dim_enrich(fact: DataFrame, dim: DataFrame, fact_key, dim_key: str) -> DataFrame:
    """Left broadcast join against a dimension table.

    Replaces the reference's per-record Redis GET enrichment (reference
    app/SaleDetailApp.scala:146-151; NPEs on a cache miss -- we keep
    nulls via left join instead).
    """
    fact_key = F.col(fact_key) if isinstance(fact_key, str) else fact_key
    return fact.join(F.broadcast(dim), fact_key == dim[dim_key], "left")


def sale_detail_wide(orders: DataFrame, lineitem: DataFrame, customer: DataFrame) -> DataFrame:
    """The 3-way denormalization over the fixture schema:
    orders FULL OUTER lineitem on the order key, LEFT broadcast join to
    customer -- the reference's order/detail/user wide row
    (reference app/SaleDetailApp.scala:50-157, bean/SaleDetail.scala:19-58).
    """
    joined = full_outer_fanout_join(orders, lineitem, "o_orderkey", "l_orderkey")
    return dim_enrich(joined, customer, orders["o_custkey"], "c_custkey")
