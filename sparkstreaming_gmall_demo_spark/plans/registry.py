"""Declared query registry: the correctness contract (SURVEY §2.10).

Each entry pairs a PySpark DataFrame builder with the equivalent ANSI
SQL for the DuckDB oracle. Column names and types are aligned on both
sides (the driver's comparator sorts columns by name and hashes values,
so every computed column is explicitly aliased AND cast identically).

Canonical output forms (engine-portability rules):
- counts            -> BIGINT (Spark count == DuckDB count(*))
- hour-of-day       -> INTEGER (DuckDB hour() is BIGINT -> cast)
- money sums        -> DECIMAL(18,2) internally (exact, order-independent),
  but the FINAL projection is round(CAST(x AS DOUBLE), 2) on BOTH sides:
  the driver comparator string-compares rendered values and Decimal
  '1704893.20' != float-rendered '1704893.2' (round-1 driver red).
- arrays            -> never in the output; array_join(sort_array(x), ',')
  (driver canonicalizer can't hash ndarray cells)
- window starts     -> 'yyyy-MM-dd HH:mm:ss' strings
- ratios            -> floor(x + 0.5) Java-Math.round semantics, BIGINT
- doubles           -> round(x, 4)

Fixed parameters are chosen to be non-degenerate at every fixture
scale factor (verified: >=2 orders on ORDERS_DATE at sf0.001; alert
query non-empty at sf0.001 with 1h/threshold-2).
"""

from __future__ import annotations

import datetime as _dt
from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.fixtures import events_date_filter, load_table
from .. import functions as gfn
from ..functions import money, money_out, log_date, log_hour, permille
from ..operators import agg as agg_ops
from ..operators import asof as asof_ops
from ..operators import dedup as dedup_ops
from ..operators import joins as join_ops
from ..operators import pagination as page_ops
from ..operators import sessions as sess_ops
from ..operators import text as text_ops
from ..operators import windows as win_ops

# -- fixed, scale-independent parameters -----------------------------------
EVENTS_DATE = "2024-01-05"
# q38's "yesterday" derived, not hardcoded (review finding: a second
# literal would silently desynchronize from EVENTS_DATE on a fixture
# change — the scan prune would drop the day before the frame's own
# filter could see it)
EVENTS_DATE_PREV = (
    _dt.date.fromisoformat(EVENTS_DATE) - _dt.timedelta(days=1)
).isoformat()
ORDERS_DATE = "1995-01-18"
ALERT_WINDOW = "1 hour"          # reference uses 5 min (app/AlertApp.scala:39);
ALERT_MIN_DISTINCT = 2           # and threshold 3 (:62). Fixture events are
                                 # sparser than the reference's burst generator,
                                 # so the declared query uses 1h/2 to exercise
                                 # both the >=N and the veto arms with data.
SEARCH_KEYWORD = "spark join"
SEARCH_LANG = "en"
PAGE_EVENT_TYPE = "click"
PAGE_NO, PAGE_SIZE = 3, 20
BAND_SEGMENT = "BUILDING"


@dataclass
class QuerySpec:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]  # ANSI SQL for DuckDB; None -> rows-only check
    description: str
    # Operator-only plan for the benchmark. The invariant-style entries
    # (approximate op compared in-plan against its exact twin) are the
    # right CORRECTNESS contract but the wrong THROUGHPUT measure: the
    # declared build times approx + exact + full-outer compare, tripling
    # the benched cost of an operator that did not get slower (round-2
    # verdict). When set, bench.py times this plan; the driver's
    # correctness check still runs ``build``.
    bench_build: Optional[Callable[[SparkSession, str], DataFrame]] = None
    # EAGER builders do the operator's real work INSIDE build (persist
    # + collect, blocks released before returning) and return an
    # already-materialized local-row frame. The registry's default
    # contract is lazy — the returned plan composes freely and nothing
    # heavy runs until the caller's action (small bounded artifact
    # collects like codebook training aside) — and every entry keeps
    # it except those flagged here: timing or re-triggering an eager
    # entry's RETURNED frame measures nothing; wrap the BUILD call
    # itself (bench.py's timed region is build + collect, so it
    # charges eager entries correctly by construction).
    eager: bool = False


REGISTRY: dict[str, QuerySpec] = {}


def _register(
    name: str, oracle: Optional[str], description: str, eager: bool = False
):
    def deco(fn):
        REGISTRY[name] = QuerySpec(name, fn, oracle, description, eager=eager)
        return fn

    return deco


def _bench(name: str):
    """Attach an operator-only bench plan to an already-registered
    entry (see QuerySpec.bench_build)."""

    def deco(fn):
        if name not in REGISTRY:
            raise KeyError(f"_bench before _register for {name}")
        REGISTRY[name].bench_build = fn
        return fn

    return deco


# ---------------------------------------------------------------------------
# Q1 -- DAU total: dedup count for a date
# (reference handler/DauHandler.scala:17-22,61-73 + mapper/DauMapper.xml:4-6)
# ---------------------------------------------------------------------------
@_register(
    "q1_dau_total",
    f"""
    SELECT count(DISTINCT user_id) AS dau
    FROM events
    WHERE CAST(ts AS DATE) = DATE '{EVENTS_DATE}'
    """,
    "DAU total for a date (cross-batch dedup count)",
)
def q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.filter(events_date_filter(events, EVENTS_DATE))
        .agg(F.count_distinct("user_id").alias("dau"))
    )


# ---------------------------------------------------------------------------
# Q2 -- DAU per hour, each user counted in the hour of their FIRST event
# of the day (reference DauHandler.scala:20 keeps the first record per
# mid+date; DauMapper.xml:8-11 groups the kept rows by hour)
# ---------------------------------------------------------------------------
@_register(
    "q2_dau_hourly",
    f"""
    SELECT CAST(hour(first_ts) AS INTEGER) AS log_hour, count(*) AS ct
    FROM (
        SELECT user_id, min(ts) AS first_ts
        FROM events
        WHERE CAST(ts AS DATE) = DATE '{EVENTS_DATE}'
        GROUP BY user_id
    )
    GROUP BY 1 ORDER BY 1
    """,
    "DAU per hour, user counted in first-seen hour",
)
def q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    first = (
        events.filter(events_date_filter(events, EVENTS_DATE))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_ts"))
    )
    return (
        first.groupBy(log_hour("first_ts").alias("log_hour"))
        .agg(F.count("*").alias("ct"))
        .orderBy("log_hour")
    )


# ---------------------------------------------------------------------------
# Q3 -- GMV total for a date (reference mapper/OrderMapper.xml:4-8)
# ---------------------------------------------------------------------------
@_register(
    "q3_gmv_total",
    f"""
    SELECT round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS gmv
    FROM orders
    WHERE CAST(o_orderdate AS DATE) = DATE '{ORDERS_DATE}'
    """,
    "GMV total for a date (decimal money sum, double output surface)",
)
def q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(log_date("o_orderdate") == F.lit(ORDERS_DATE).cast("date"))
        .agg(money_out(F.sum(money("o_totalprice"))).alias("gmv"))
    )


# ---------------------------------------------------------------------------
# Q4 -- GMV per hour (reference mapper/OrderMapper.xml:10-16). Fixture
# o_orderdate is date-grained (hour always 0) -- kept for reference
# parity; q4b below exercises real hours on the events stream.
# ---------------------------------------------------------------------------
@_register(
    "q4_gmv_hourly",
    f"""
    SELECT CAST(hour(o_orderdate) AS INTEGER) AS create_hour,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS gmv
    FROM orders
    WHERE CAST(o_orderdate AS DATE) = DATE '{ORDERS_DATE}'
    GROUP BY 1 ORDER BY 1
    """,
    "GMV per hour of order create time",
)
def q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(log_date("o_orderdate") == F.lit(ORDERS_DATE).cast("date"))
        .groupBy(log_hour("o_orderdate").alias("create_hour"))
        .agg(money_out(F.sum(money("o_totalprice"))).alias("gmv"))
        .orderBy("create_hour")
    )


@_register(
    "q4b_purchase_value_hourly",
    f"""
    SELECT CAST(hour(ts) AS INTEGER) AS log_hour,
           round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_value,
           count(*) AS ct
    FROM events
    WHERE CAST(ts AS DATE) = DATE '{EVENTS_DATE}' AND event_type = 'purchase'
    GROUP BY 1 ORDER BY 1
    """,
    "hourly purchase value on the event stream (non-degenerate hours)",
)
def q4b(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.filter(
            (events_date_filter(events, EVENTS_DATE))
            & (F.col("event_type") == "purchase")
        )
        .groupBy(log_hour("ts").alias("log_hour"))
        .agg(
            money_out(F.sum(money("value"))).alias("total_value"),
            F.count("*").alias("ct"),
        )
        .orderBy("log_hour")
    )


# ---------------------------------------------------------------------------
# Q5 -- sale-detail wide join (reference app/SaleDetailApp.scala:50-157):
# orders FULL OUTER lineitem LEFT customer, aggregated by segment with
# the NULL group kept.
# ---------------------------------------------------------------------------
@_register(
    "q5_sale_detail_join",
    """
    SELECT c_mktsegment,
           count(*) AS cnt,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS revenue
    FROM orders
    FULL OUTER JOIN lineitem ON o_orderkey = l_orderkey
    LEFT JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment NULLS FIRST
    """,
    "3-way denormalization join aggregated by segment",
)
def q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    customer = load_table(spark, sf_dir, "customer")
    wide = join_ops.sale_detail_wide(orders, lineitem, customer)
    return (
        wide.groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("cnt"),
            money_out(F.sum(money("l_extendedprice"))).alias("revenue"),
        )
        .orderBy(F.asc_nulls_first("c_mktsegment"))
    )


# ---------------------------------------------------------------------------
# Q6 -- coupon-alert window (reference app/AlertApp.scala:39-66): per
# event-time window and user, >= N distinct qualifying events AND no
# disqualifying event. Declared form: tumbling window for determinism.
# ---------------------------------------------------------------------------
@_register(
    "q6_alert_window",
    f"""
    SELECT strftime(time_bucket(INTERVAL '{ALERT_WINDOW}', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           user_id,
           CAST(count(DISTINCT CASE WHEN event_type = 'purchase' THEN event_id END) AS BIGINT) AS qualify_count,
           array_to_string(list_sort(list_distinct(list(event_type))), ',') AS event_types
    FROM events
    GROUP BY time_bucket(INTERVAL '{ALERT_WINDOW}', ts), user_id
    HAVING count(DISTINCT CASE WHEN event_type = 'purchase' THEN event_id END) >= {ALERT_MIN_DISTINCT}
       AND max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) = 0
    ORDER BY window_start, user_id
    """,
    "windowed alert: >=N distinct qualifiers and no veto event",
)
def q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    alerts = agg_ops.alert_aggregate(
        grouped_cols=[win_ops.tumbling("ts", ALERT_WINDOW).alias("w"), F.col("user_id")],
        qualify=F.col("event_type") == "purchase",
        qualify_id=F.col("event_id"),
        disqualify=F.col("event_type") == "error",
        df=events,
        min_distinct=ALERT_MIN_DISTINCT,
    )
    return alerts.select(
        win_ops.window_start_str(F.col("w")).alias("window_start"),
        F.col("user_id"),
        F.col("qualify_count"),
        # serialized, not ARRAY: the driver canonicalizer can't hash ndarray
        # cells (round-1 q6 err) — same info, scalar output surface
        F.array_join(F.sort_array(F.col("event_types")), ",").alias("event_types"),
    ).orderBy("window_start", "user_id")


# ---------------------------------------------------------------------------
# Q7 -- first-record-per-group dedup (reference handler/DauHandler.scala:17-22)
# with a checksum projection so the kept-row choice is verified.
# ---------------------------------------------------------------------------
@_register(
    "q7_first_per_group",
    """
    SELECT count(*) AS kept,
           CAST(sum(event_id) AS BIGINT) AS id_sum,
           min(event_id) AS id_min,
           max(event_id) AS id_max
    FROM (
        SELECT event_id,
               row_number() OVER (
                   PARTITION BY user_id, CAST(ts AS DATE)
                   ORDER BY ts, event_id
               ) AS rn
        FROM events
    )
    WHERE rn = 1
    """,
    "keep first event per user per day; checksum the kept set",
)
def q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    kept = dedup_ops.first_per_group(
        events.withColumn("log_date", log_date("ts")),
        keys=["user_id", "log_date"],
        order=["ts", "event_id"],
    )
    return kept.agg(
        F.count("*").alias("kept"),
        F.sum("event_id").cast("long").alias("id_sum"),
        F.min("event_id").alias("id_min"),
        F.max("event_id").alias("id_max"),
    )


# ---------------------------------------------------------------------------
# Q8 -- top-k groups by count (reference PublisherServiceImpl.java:89-95
# ES terms agg, size=k)
# ---------------------------------------------------------------------------
@_register(
    "q8_topk_users",
    """
    SELECT user_id, cnt FROM (
        SELECT user_id, count(*) AS cnt
        FROM events
        GROUP BY user_id
    )
    ORDER BY cnt DESC, user_id ASC
    LIMIT 10
    """,
    "top-10 users by event count (terms-agg analog)",
)
def q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return agg_ops.topk_groups(events, "user_id", 10)


# ---------------------------------------------------------------------------
# Q9 -- keyword AND-match + term filter (reference
# PublisherServiceImpl.java:84-87): ES analyzes both document and query
# (lowercase, tokenize) before the operator=AND match — mirrored by the
# analyzer-lite normalization on BOTH engines ("Spark," matches
# "spark"); lang term filter; page of doc ids + total alongside (the
# getTotal() envelope, :108).
# ---------------------------------------------------------------------------
@_register(
    "q9_keyword_search",
    f"""
    WITH matches AS (
        SELECT doc_id
        FROM documents
        WHERE lang = '{SEARCH_LANG}'
          AND list_contains(list_filter(string_split_regex(regexp_replace(lower(text), '([㐀-䶿一-鿿豈-﫿])', ' \\1 ', 'g'), '[^\\p{{L}}\\p{{N}}]+'), t -> t != ''), 'spark')
          AND list_contains(list_filter(string_split_regex(regexp_replace(lower(text), '([㐀-䶿一-鿿豈-﫿])', ' \\1 ', 'g'), '[^\\p{{L}}\\p{{N}}]+'), t -> t != ''), 'join')
    )
    SELECT doc_id, (SELECT count(*) FROM matches) AS total
    FROM matches
    ORDER BY doc_id
    LIMIT 10
    """,
    "analyzed keyword AND-match with total-hits envelope",
)
def q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    matches = text_ops.keyword_and_match(
        docs.filter(F.col("lang") == SEARCH_LANG), "text", SEARCH_KEYWORD
    ).select("doc_id")
    with_total = matches.withColumn("total", F.count("*").over(Window.partitionBy()))
    return with_total.orderBy("doc_id").limit(10)


# ---------------------------------------------------------------------------
# Q10 -- demographic bands + per-mille Java rounding (reference
# PublisherServiceImpl.java:125-179)
# ---------------------------------------------------------------------------
@_register(
    "q10_banded_ratios",
    f"""
    WITH seg AS (SELECT c_acctbal FROM customer WHERE c_mktsegment = '{BAND_SEGMENT}'),
    t AS (
        SELECT count(*) AS total,
               sum(CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END) AS c0,
               sum(CASE WHEN c_acctbal >= 0 AND c_acctbal < 5000 THEN 1 ELSE 0 END) AS c1,
               sum(CASE WHEN c_acctbal >= 5000 THEN 1 ELSE 0 END) AS c2
        FROM seg
    )
    SELECT band, CAST(cnt AS BIGINT) AS cnt,
           CAST(floor(cnt * 1000.0 / total + 0.5) AS BIGINT) AS ratio_permille
    FROM (
        SELECT 'negative' AS band, c0 AS cnt, total FROM t
        UNION ALL SELECT 'low', c1, total FROM t
        UNION ALL SELECT 'high', c2, total FROM t
    )
    ORDER BY band
    """,
    "acctbal bands within a segment, per-mille Math.round ratios",
)
def q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    seg = customer.filter(F.col("c_mktsegment") == BAND_SEGMENT)
    bands = [
        ("negative", F.col("c_acctbal") < 0),
        ("low", (F.col("c_acctbal") >= 0) & (F.col("c_acctbal") < 5000)),
        ("high", F.col("c_acctbal") >= 5000),
    ]
    return agg_ops.banded_ratios(seg, "c_acctbal", bands).orderBy("band")


# ---------------------------------------------------------------------------
# Q11 -- pagination (reference PublisherServiceImpl.java:98-99):
# page PAGE_NO of PAGE_SIZE under a stable order.
# ---------------------------------------------------------------------------
@_register(
    "q11_pagination",
    f"""
    SELECT event_id, user_id, event_type
    FROM events
    WHERE event_type = '{PAGE_EVENT_TYPE}'
    ORDER BY event_id
    LIMIT {PAGE_SIZE} OFFSET {(PAGE_NO - 1) * PAGE_SIZE}
    """,
    "offset/limit pagination under stable total order",
)
def q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    filtered = events.filter(F.col("event_type") == PAGE_EVENT_TYPE).select(
        "event_id", "user_id", "event_type"
    )
    return page_ops.page(filtered, ["event_id"], PAGE_NO, PAGE_SIZE)


# ---------------------------------------------------------------------------
# Q12 -- idempotent-sink dedup keys (reference app/AlertApp.scala:74 doc
# id = mid + ts/1000/60; MyEsUtil.scala:55-58 upsert): distinct
# (user, minute-bucket) keys of the Q6 alert stream.
# ---------------------------------------------------------------------------
@_register(
    "q12_alert_dedup_keys",
    f"""
    WITH alerts AS (
        SELECT time_bucket(INTERVAL '{ALERT_WINDOW}', ts) AS wb, user_id
        FROM events
        GROUP BY 1, user_id
        HAVING count(DISTINCT CASE WHEN event_type = 'purchase' THEN event_id END) >= {ALERT_MIN_DISTINCT}
           AND max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) = 0
    )
    SELECT count(*) AS n_alert_keys FROM (
        SELECT DISTINCT user_id, CAST(floor(epoch(wb) / 60) AS BIGINT) AS minute_bucket
        FROM alerts
    )
    """,
    "distinct idempotent alert sink keys (user, minute bucket)",
)
def q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    alerts = agg_ops.alert_aggregate(
        grouped_cols=[win_ops.tumbling("ts", ALERT_WINDOW).alias("w"), F.col("user_id")],
        qualify=F.col("event_type") == "purchase",
        qualify_id=F.col("event_id"),
        disqualify=F.col("event_type") == "error",
        df=events,
        min_distinct=ALERT_MIN_DISTINCT,
    )
    keys = alerts.select(
        "user_id",
        (F.unix_timestamp(F.col("w").getField("start")) / 60).cast("long").alias("minute_bucket"),
    ).dropDuplicates(["user_id", "minute_bucket"])
    return keys.agg(F.count("*").alias("n_alert_keys"))


# ---------------------------------------------------------------------------
# Q13 -- generic JSON property-map aggregation: the CDC column-map
# surface (reference gamll-canal/.../CanalClient.java:77-82 builds a
# JSONObject column->value per row; SURVEY §1.2 maps it to
# MapType(String,String)). Parse the per-event props JSON into a map,
# explode entries, aggregate per (event_type, key) — schema-on-read
# over semi-structured payloads with no fixed column set.
# ---------------------------------------------------------------------------
@_register(
    "q13_props_map_agg",
    """
    SELECT event_type, pk AS prop_key, count(*) AS cnt,
           CAST(sum(CAST(json_extract(props, '$.' || pk) AS BIGINT)) AS BIGINT) AS val_sum,
           CAST(min(CAST(json_extract(props, '$.' || pk) AS BIGINT)) AS BIGINT) AS val_min,
           CAST(max(CAST(json_extract(props, '$.' || pk) AS BIGINT)) AS BIGINT) AS val_max
    FROM (SELECT event_type, props, unnest(json_keys(props)) AS pk FROM events)
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "JSON property map exploded + aggregated per (event_type, key)",
)
def q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    entries = events.select(
        "event_type",
        F.explode(F.from_json("props", "map<string,bigint>")).alias(
            "prop_key", "prop_val"
        ),
    )
    return (
        entries.groupBy("event_type", "prop_key")
        .agg(
            F.count("*").alias("cnt"),
            F.sum("prop_val").alias("val_sum"),
            F.min("prop_val").alias("val_min"),
            F.max("prop_val").alias("val_max"),
        )
        .orderBy("event_type", "prop_key")
    )


# ---------------------------------------------------------------------------
# Q14 -- star join rollup: fact orders against the customer -> nation
# -> region dimension chain. The reference's serving layer denormalizes
# exactly this way (dim enrichment before aggregation, J3); at scale
# the whole dim chain broadcasts, so the fact table never shuffles for
# the joins — only the final per-region aggregate exchanges
# (partial-agg combined map-side).
# ---------------------------------------------------------------------------
@_register(
    "q14_star_join_rollup",
    """
    SELECT r_name AS region,
           count(*) AS n_orders,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS revenue,
           count(DISTINCT o_custkey) AS n_customers
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name ORDER BY r_name
    """,
    "fact-to-dim-chain star join rolled up per region",
)
def q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    dims = (
        customer.join(F.broadcast(nation), customer["c_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .select("c_custkey", "r_name")
    )
    return (
        orders.join(F.broadcast(dims), orders["o_custkey"] == dims["c_custkey"])
        .groupBy(F.col("r_name").alias("region"))
        .agg(
            F.count("*").alias("n_orders"),
            money_out(F.sum(money("o_totalprice"))).alias("revenue"),
            F.count_distinct("o_custkey").alias("n_customers"),
        )
        .orderBy("region")
    )


# ---------------------------------------------------------------------------
# Q15 -- hierarchical rollup: per (event_type, hour) counts with
# subtotal and grand-total levels in one pass (GROUPING SETS). Not in
# the reference (its dashboard queries each level separately —
# DauMapper.xml:4-6 vs :8-11 are two round trips); Spark computes the
# lattice in a single shuffle with partial aggregation, which is the
# serving-layer upgrade at scale.
# ---------------------------------------------------------------------------
@_register(
    "q15_rollup_hourly",
    f"""
    SELECT event_type,
           CAST(hour(ts) AS INTEGER) AS log_hour,
           CAST(GROUPING(event_type, hour(ts)) AS INTEGER) AS gid,
           count(*) AS cnt,
           round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_value
    FROM events
    WHERE CAST(ts AS DATE) = DATE '{EVENTS_DATE}'
    GROUP BY ROLLUP(event_type, hour(ts))
    ORDER BY gid, event_type NULLS FIRST, log_hour NULLS FIRST
    """,
    "ROLLUP lattice (detail, per-type subtotal, grand total) in one pass",
)
def q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    day = events.filter(events_date_filter(events, EVENTS_DATE))
    return (
        day.rollup("event_type", log_hour("ts").alias("log_hour"))
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.count("*").alias("cnt"),
            money_out(F.sum(money("value"))).alias("total_value"),
        )
        .select("event_type", "log_hour", "gid", "cnt", "total_value")
        .orderBy(
            "gid",
            F.asc_nulls_first("event_type"),
            F.asc_nulls_first("log_hour"),
        )
    )


# ---------------------------------------------------------------------------
# Q16 -- supplier/part enrichment: lineitem facts against the part and
# supplier dims, top brands by revenue within a part type. Rounds out
# fixture coverage (every driver table is now exercised) with the
# second star pattern: two independent broadcast dims on one fact.
# ---------------------------------------------------------------------------
@_register(
    "q16_brand_revenue",
    """
    SELECT p_brand,
           count(*) AS n_items,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS revenue,
           count(DISTINCT s_nationkey) AS n_supplier_nations
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    WHERE p_type = 'ECONOMY'
    GROUP BY p_brand
    ORDER BY revenue DESC, p_brand
    LIMIT 10
    """,
    "top part brands by revenue with supplier-nation breadth",
)
def q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    supplier = load_table(spark, sf_dir, "supplier")
    return (
        lineitem.join(F.broadcast(part), lineitem["l_partkey"] == part["p_partkey"])
        .join(F.broadcast(supplier), lineitem["l_suppkey"] == supplier["s_suppkey"])
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_items"),
            money_out(F.sum(money("l_extendedprice"))).alias("revenue"),
            F.count_distinct("s_nationkey").alias("n_supplier_nations"),
        )
        .orderBy(F.desc("revenue"), F.asc("p_brand"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Q17 -- as-of join: for each order, the customer's most recent STRICTLY
# earlier order (point-in-time lookup; operators/asof.py). The oracle
# states the same semantics relationally (max earlier date per order) —
# quadratic in SQL, single sort in the engine.
# ---------------------------------------------------------------------------
@_register(
    "q17_asof_prev_order",
    """
    WITH prev AS (
        SELECT a.o_orderkey, a.o_orderpriority, a.o_orderdate,
               max(b.o_orderdate) AS prev_date
        FROM orders a LEFT JOIN orders b
          ON a.o_custkey = b.o_custkey AND b.o_orderdate < a.o_orderdate
        GROUP BY a.o_orderkey, a.o_orderpriority, a.o_orderdate
    )
    SELECT o_orderpriority AS priority,
           count(*) AS n_orders,
           count(prev_date) AS n_with_prev,
           round(avg(date_diff('day', prev_date, o_orderdate)), 4) AS avg_gap_days,
           CAST(max(date_diff('day', prev_date, o_orderdate)) AS BIGINT) AS max_gap_days
    FROM prev
    GROUP BY 1 ORDER BY 1
    """,
    "as-of self-join: days since the customer's previous order",
)
def q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    enriched = asof_ops.asof_join(
        orders.select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"),
        orders.select("o_custkey", "o_orderdate"),
        key="o_custkey",
        left_ts="o_orderdate",
        right_ts="o_orderdate",
        strict=True,
    )
    gap = F.datediff(F.col("o_orderdate"), F.col("asof_ts"))
    return (
        enriched.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count("*").alias("n_orders"),
            F.count(F.col("asof_ts")).alias("n_with_prev"),
            F.round(F.avg(gap), 4).alias("avg_gap_days"),
            F.max(gap).cast("long").alias("max_gap_days"),
        )
        .orderBy("priority")
    )


# ---------------------------------------------------------------------------
# Q18 -- analytic window functions over an aggregate: daily GMV with a
# running (cumulative) total and day-over-day delta. The reference's
# dashboard recomputes totals client-side per request
# (dw-chart/controller/IndexController.java renders per-hour arrays the
# Java code re-walks); one windowed pass replaces that. Both window
# functions share one ORDER BY d spec -> one sort after the (tiny)
# daily aggregate.
# ---------------------------------------------------------------------------
RUNNING_MONTH_START, RUNNING_MONTH_END = "1995-01-01", "1995-02-01"


@_register(
    "q18_running_gmv",
    f"""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS gmv
        FROM orders
        WHERE CAST(o_orderdate AS DATE) >= DATE '{RUNNING_MONTH_START}'
          AND CAST(o_orderdate AS DATE) <  DATE '{RUNNING_MONTH_END}'
        GROUP BY 1
    )
    SELECT strftime(d, '%Y-%m-%d') AS day,
           round(CAST(gmv AS DOUBLE), 2) AS gmv,
           round(CAST(sum(gmv) OVER (ORDER BY d) AS DOUBLE), 2) AS cum_gmv,
           round(CAST(gmv - lag(gmv) OVER (ORDER BY d) AS DOUBLE), 2) AS delta
    FROM daily ORDER BY d
    """,
    "daily GMV with running total and day-over-day delta",
)
def q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    daily = (
        orders.filter(
            (log_date("o_orderdate") >= F.lit(RUNNING_MONTH_START).cast("date"))
            & (log_date("o_orderdate") < F.lit(RUNNING_MONTH_END).cast("date"))
        )
        .groupBy(log_date("o_orderdate").alias("d"))
        .agg(F.sum(money("o_totalprice")).cast("decimal(18,2)").alias("gmv"))
    )
    w = Window.orderBy("d")
    return (
        daily.select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            money_out("gmv").alias("gmv"),
            money_out(F.sum("gmv").over(w)).alias("cum_gmv"),
            money_out(F.col("gmv") - F.lag("gmv").over(w)).alias("delta"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# Q19 -- semi/anti join: customer activity split per segment. The
# reference's only anti-join is the dedup probe (J4,
# handler/DauHandler.scala:35-44); this is the declarative serving-side
# form: EXISTS -> left_semi, NOT EXISTS -> left_anti, both
# broadcast-able on the probe side at scale because only the key column
# of orders is needed.
# ---------------------------------------------------------------------------
@_register(
    "q19_semi_anti_segments",
    """
    WITH flags AS (
        SELECT c_mktsegment, c_custkey,
               EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c_custkey) AS has_order
        FROM customer
    )
    SELECT c_mktsegment,
           CAST(sum(CASE WHEN has_order THEN 1 ELSE 0 END) AS BIGINT) AS with_orders,
           CAST(sum(CASE WHEN NOT has_order THEN 1 ELSE 0 END) AS BIGINT) AS without_orders
    FROM flags GROUP BY 1 ORDER BY 1
    """,
    "per-segment customer counts with/without orders (semi + anti join)",
)
def q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    on = customer["c_custkey"] == orders["o_custkey"]
    semi = (
        customer.join(orders, on, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("with_orders"))
    )
    anti = (
        customer.join(orders, on, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("without_orders"))
    )
    return (
        semi.join(anti, "c_mktsegment", "full_outer")
        .select(
            "c_mktsegment",
            F.coalesce("with_orders", F.lit(0)).cast("long").alias("with_orders"),
            F.coalesce("without_orders", F.lit(0)).cast("long").alias("without_orders"),
        )
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# Q20 -- batch gap sessionization (operators/sessions.py): the offline
# twin of the streaming applyInPandasWithState sessionizer
# (streaming/stateful.py), expressed with two window functions in one
# sort. Corpus-level session shape stats make the output compact and
# hashable.
# ---------------------------------------------------------------------------
SESSION_GAP_S = 1800


@_register(
    "q20_sessionization",
    f"""
    WITH marked AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL THEN 1
                    WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w)
                         > {SESSION_GAP_S} * 1000000 THEN 1
                    ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
        SELECT user_id,
               sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_id
        FROM marked
    ),
    per AS (
        SELECT user_id, session_id, count(*) AS n_events
        FROM numbered GROUP BY 1, 2
    )
    SELECT count(*) AS n_sessions,
           CAST(max(n_events) AS BIGINT) AS max_events,
           round(avg(n_events), 4) AS avg_events,
           count(DISTINCT user_id) AS n_users
    FROM per
    """,
    "gap-based sessionization: corpus session-shape stats",
)
def q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    per = sess_ops.session_stats(
        events, key="user_id", ts_col="ts",
        gap_seconds=SESSION_GAP_S, tiebreak="event_id",
    )
    return per.agg(
        F.count("*").alias("n_sessions"),
        F.max("n_events").cast("long").alias("max_events"),
        F.round(F.avg("n_events"), 4).alias("avg_events"),
        F.count_distinct("user_id").alias("n_users"),
    )


# ---------------------------------------------------------------------------
# Q21 -- set operations (EXCEPT / INTERSECT / UNION DISTINCT). Absent
# from the reference (SURVEY §2.9) but free in Spark SQL; declared so
# the coverage is gated. Audience overlap is the natural form: users
# who click but never purchase, both, either.
# ---------------------------------------------------------------------------
@_register(
    "q21_set_ops",
    """
    SELECT 'both_types' AS metric, count(*) AS n FROM (
        SELECT user_id FROM events WHERE event_type = 'click'
        INTERSECT
        SELECT user_id FROM events WHERE event_type = 'purchase')
    UNION ALL
    SELECT 'either_type', count(*) FROM (
        SELECT DISTINCT user_id FROM events
        WHERE event_type IN ('click', 'purchase'))
    UNION ALL
    SELECT 'only_click', count(*) FROM (
        SELECT user_id FROM events WHERE event_type = 'click'
        EXCEPT
        SELECT user_id FROM events WHERE event_type = 'purchase')
    ORDER BY metric
    """,
    "audience overlap via EXCEPT / INTERSECT / UNION-distinct",
)
def q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    # one (metric, n) row per set operation — unioned, not cross-joined:
    # three scalar aggregates glued with a nested-loop join would trip
    # the no-cartesian plan guardrail for nothing
    events = load_table(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select("user_id")
    purchases = events.filter(F.col("event_type") == "purchase").select("user_id")

    def tagged(df: DataFrame, metric: str) -> DataFrame:
        return df.agg(
            F.lit(metric).alias("metric"), F.count("*").alias("n")
        )

    return (
        tagged(clicks.intersect(purchases), "both_types")
        .union(tagged(clicks.union(purchases).distinct(), "either_type"))
        .union(tagged(clicks.subtract(purchases), "only_click"))
        .orderBy("metric")
    )


# ---------------------------------------------------------------------------
# Q22 -- pivot: hour × event-type count matrix for a day. The
# dashboard's hourly series (reference Controller.java:94-99 merges
# today/yesterday maps client-side) as one relational reshape. Pivot
# values are declared explicitly: Spark otherwise runs a distinct-scan
# job just to discover the column set, and the output schema must be
# fixed for the serving layer anyway.
# ---------------------------------------------------------------------------
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@_register(
    "q22_pivot_hourly_types",
    f"""
    SELECT CAST(hour(ts) AS INTEGER) AS log_hour,
           {", ".join(
               f"CAST(sum(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS {t}"
               for t in EVENT_TYPES
           )}
    FROM events
    WHERE CAST(ts AS DATE) = DATE '{EVENTS_DATE}'
    GROUP BY 1 ORDER BY 1
    """,
    "hour × event-type pivot matrix for a day",
)
def q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    pivoted = (
        events.filter(events_date_filter(events, EVENTS_DATE))
        .groupBy(log_hour("ts").alias("log_hour"))
        .pivot("event_type", EVENT_TYPES)
        .count()
        .na.fill(0, EVENT_TYPES)
    )
    return pivoted.select(
        "log_hour", *[F.col(t).cast("long").alias(t) for t in EVENT_TYPES]
    ).orderBy("log_hour")


# ---------------------------------------------------------------------------
# Q23 -- ntile decile profiling: customer balance distribution in 10
# equal-frequency buckets. The serving layer's band query (Q10) uses
# fixed thresholds; deciles are the data-driven variant an analyst
# actually asks for. ntile ties are broken by the PK so both engines
# number identically.
#
# Scale note: an unpartitioned window is a single-partition sort —
# acceptable for a dimension-sized input (customers), wrong for facts.
# At fact scale compute approx_percentile cutoffs (mergeable t-digest,
# map-side) and band by threshold instead; exact ntile rank parity is
# what this declared form buys, and only a dim can afford it.
# ---------------------------------------------------------------------------
@_register(
    "q23_balance_deciles",
    """
    SELECT decile, count(*) AS cnt,
           round(min(c_acctbal), 4) AS min_bal,
           round(max(c_acctbal), 4) AS max_bal,
           round(avg(c_acctbal), 4) AS avg_bal
    FROM (
        SELECT c_acctbal,
               CAST(ntile(10) OVER (ORDER BY c_acctbal, c_custkey) AS INTEGER) AS decile
        FROM customer
    )
    GROUP BY decile ORDER BY decile
    """,
    "equal-frequency balance deciles via ntile",
)
def q23(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    deciles = customer.select(
        "c_acctbal",
        F.ntile(10)
        .over(Window.orderBy("c_acctbal", "c_custkey"))
        .cast("int")
        .alias("decile"),
    )
    return (
        deciles.groupBy("decile")
        .agg(
            F.count("*").alias("cnt"),
            F.round(F.min("c_acctbal"), 4).alias("min_bal"),
            F.round(F.max("c_acctbal"), 4).alias("max_bal"),
            F.round(F.avg("c_acctbal"), 4).alias("avg_bal"),
        )
        .orderBy("decile")
    )


# ---------------------------------------------------------------------------
# Q24 -- CUBE lattice over the document corpus: every (lang, source)
# margin in one pass. Completes the grouping-set family started by
# Q15's ROLLUP — the corpus-composition report (how much of each
# language from each source) needs all four margins, and computing
# them separately would scan 4×.
# ---------------------------------------------------------------------------
@_register(
    "q24_corpus_cube",
    """
    SELECT lang, source,
           CAST(GROUPING(lang, source) AS INTEGER) AS gid,
           count(*) AS cnt,
           CAST(sum(n_chars) AS BIGINT) AS chars_sum
    FROM documents
    GROUP BY CUBE(lang, source)
    ORDER BY gid, lang NULLS FIRST, source NULLS FIRST
    """,
    "CUBE margins of corpus composition (lang × source)",
)
def q24(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.cube("lang", "source")
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.count("*").alias("cnt"),
            F.sum("n_chars").cast("long").alias("chars_sum"),
        )
        .select("lang", "source", "gid", "cnt", "chars_sum")
        .orderBy("gid", F.asc_nulls_first("lang"), F.asc_nulls_first("source"))
    )


# ---------------------------------------------------------------------------
# Q25 -- conversion funnel: per day, users whose first view precedes
# their first click precedes their first purchase. Event-ORDER
# analytics the reference's dashboard can't ask of Phoenix/ES at all —
# one conditional-min aggregate per user-day, no self-joins (the naive
# 3-way events self-join shuffles the fact three times).
# ---------------------------------------------------------------------------
@_register(
    "q25_funnel_daily",
    """
    WITH firsts AS (
        SELECT CAST(ts AS DATE) AS d, user_id,
               min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
               min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
               min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
        FROM events GROUP BY 1, 2
    )
    SELECT strftime(d, '%Y-%m-%d') AS day,
           CAST(sum(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS viewed,
           CAST(sum(CASE WHEN t_view < t_click THEN 1 ELSE 0 END) AS BIGINT) AS clicked_after_view,
           CAST(sum(CASE WHEN t_view < t_click AND t_click < t_purchase THEN 1 ELSE 0 END) AS BIGINT) AS full_funnel
    FROM firsts GROUP BY d ORDER BY day
    """,
    "daily view->click->purchase funnel on first-event ordering",
)
def q25(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    first_of = lambda t: F.min(  # noqa: E731
        F.when(F.col("event_type") == t, F.col("ts"))
    )
    firsts = (
        events.groupBy(log_date("ts").alias("d"), F.col("user_id"))
        .agg(
            first_of("view").alias("t_view"),
            first_of("click").alias("t_click"),
            first_of("purchase").alias("t_purchase"),
        )
    )
    return (
        firsts.groupBy("d")
        .agg(
            F.sum(F.when(F.col("t_view").isNotNull(), 1).otherwise(0))
            .cast("long").alias("viewed"),
            F.sum(F.when(F.col("t_view") < F.col("t_click"), 1).otherwise(0))
            .cast("long").alias("clicked_after_view"),
            F.sum(
                F.when(
                    (F.col("t_view") < F.col("t_click"))
                    & (F.col("t_click") < F.col("t_purchase")),
                    1,
                ).otherwise(0)
            ).cast("long").alias("full_funnel"),
        )
        .select(F.date_format("d", "yyyy-MM-dd").alias("day"),
                "viewed", "clicked_after_view", "full_funnel")
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# Q26 -- next-day retention: of each day's active users, how many
# return the following day. The DAU serving query's (Q1/Q2) natural
# companion — the reference dashboard juxtaposes today/yesterday
# (Controller.java:79,94-99) but never computes the cohort overlap.
# Engine plan: ONE scan — distinct (user, day), then lead(day) per
# user tells whether the next active day is adjacent; the self-join
# formulation (the oracle's statement of the semantics) would scan
# and shuffle the distinct set twice.
# ---------------------------------------------------------------------------
@_register(
    "q26_next_day_retention",
    """
    WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events)
    SELECT strftime(a.d, '%Y-%m-%d') AS day,
           count(*) AS actives,
           CAST(sum(CASE WHEN b.user_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS retained,
           CAST(floor(sum(CASE WHEN b.user_id IS NOT NULL THEN 1 ELSE 0 END) * 1000.0
                      / count(*) + 0.5) AS BIGINT) AS retention_permille
    FROM ud a
    LEFT JOIN ud b ON a.user_id = b.user_id AND b.d = a.d + 1
    GROUP BY a.d ORDER BY day
    """,
    "next-day retention per active-day cohort with per-mille ratio",
)
def q26(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    ud = events.select("user_id", log_date("ts").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    flagged = ud.withColumn(
        "is_retained",
        (F.lead("d").over(w) == F.date_add(F.col("d"), 1)).cast("int"),
    )
    return (
        flagged.groupBy("d")
        .agg(
            F.count("*").alias("actives"),
            F.coalesce(F.sum("is_retained"), F.lit(0))
            .cast("long").alias("retained"),
        )
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            "actives",
            "retained",
            permille("retained", "actives").alias("retention_permille"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# Q27 -- SLIDING event-time window (reference app/AlertApp.scala:39:
# .window(Minutes(5)) sliding every batch). Q6 declares the tumbling
# form for simplicity; this gates the overlap semantics themselves:
# each event belongs to window_len/slide windows. Spark's window()
# assigns [start, start+len) buckets natively; the oracle enumerates
# the same starts arithmetically (strictly t-len < start <= t at
# microsecond precision).
# ---------------------------------------------------------------------------
SLIDE_WIN_US = 3_600_000_000   # 1 hour
SLIDE_STEP_US = 1_800_000_000  # 30 minutes


@_register(
    "q27_sliding_window_counts",
    f"""
    WITH e AS (
        SELECT user_id, epoch_us(ts) AS t
        FROM events WHERE CAST(ts AS DATE) = DATE '{EVENTS_DATE}'
    ),
    assigned AS (
        SELECT user_id,
               unnest(range(
                   CAST(floor((t - {SLIDE_WIN_US}) / {SLIDE_STEP_US}) AS BIGINT) + 1,
                   CAST(floor(t / {SLIDE_STEP_US}) AS BIGINT) + 1
               )) AS k
        FROM e
    )
    SELECT strftime(make_timestamp(k * {SLIDE_STEP_US}), '%Y-%m-%d %H:%M:%S') AS window_start,
           count(*) AS n_events,
           count(DISTINCT user_id) AS n_users
    FROM assigned
    GROUP BY k ORDER BY window_start
    """,
    "1h window sliding 30min: per-window event + user counts",
)
def q27(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.filter(events_date_filter(events, EVENTS_DATE))
        .groupBy(win_ops.sliding("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.count_distinct("user_id").alias("n_users"),
        )
        .select(
            win_ops.window_start_str(F.col("w")).alias("window_start"),
            "n_events",
            "n_users",
        )
        .orderBy("window_start")
    )


# ---------------------------------------------------------------------------
# Q28 -- statistical aggregates (stddev/corr): the family SURVEY §2.6
# notes as absent from the reference but free in Spark SQL — declared
# so the coverage is gated. Per order-priority: order-value dispersion
# and the correlation between a customer's account balance and their
# order's value. Doubles rounded to 4 dp (sum-order noise is ~1e-12
# relative at this magnitude; the canonical-forms rule absorbs it).
# ---------------------------------------------------------------------------
@_register(
    "q28_priority_stats",
    """
    SELECT o_orderpriority AS priority,
           count(*) AS n_orders,
           round(avg(o_totalprice), 4) AS avg_price,
           round(stddev_samp(o_totalprice), 4) AS sd_price,
           round(corr(o_totalprice, c_acctbal), 4) AS corr_price_balance
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY 1 ORDER BY 1
    """,
    "dispersion + correlation stats per order priority",
)
def q28(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    return (
        orders.join(F.broadcast(customer), orders["o_custkey"] == customer["c_custkey"])
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
            F.round(F.stddev_samp("o_totalprice"), 4).alias("sd_price"),
            F.round(F.corr("o_totalprice", "c_acctbal"), 4).alias("corr_price_balance"),
        )
        .orderBy("priority")
    )


# ---------------------------------------------------------------------------
# Q29 -- top-k PER GROUP (Q8 is global top-k): the heaviest users of
# each event type via a rank window over a pre-aggregate. The
# aggregate shrinks the fact to (type, user) counts BEFORE the window
# sorts — ranking raw events would sort the whole fact table; ranking
# counts sorts one row per active pair.
# ---------------------------------------------------------------------------
TOPK_PER_GROUP = 3


@_register(
    "q29_topk_per_type",
    f"""
    SELECT event_type, user_id, cnt, CAST(rnk AS INTEGER) AS rnk
    FROM (
        SELECT event_type, user_id, cnt,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY cnt DESC, user_id) AS rnk
        FROM (SELECT event_type, user_id, count(*) AS cnt
              FROM events GROUP BY 1, 2)
    )
    WHERE rnk <= {TOPK_PER_GROUP}
    ORDER BY event_type, rnk
    """,
    "top-3 users per event type (rank window over a pre-aggregate)",
)
def q29(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    counts = events.groupBy("event_type", "user_id").agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("event_type").orderBy(F.desc("cnt"), F.asc("user_id"))
    return (
        counts.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= TOPK_PER_GROUP)
        .orderBy("event_type", "rnk")
    )

# ---------------------------------------------------------------------------
# Q30 -- GROUPING SETS: the third grouping-lattice shape (Q15 ROLLUP is
# the prefix lattice, Q24 CUBE the full one; GROUPING SETS picks
# arbitrary members). Two independent one-dimensional margins of the
# order book plus the grand total in ONE scan — the hand-written
# alternative is a UNION ALL of three aggregates, three scans.
# ---------------------------------------------------------------------------
@_register(
    "q30_grouping_sets",
    """
    SELECT o_orderpriority AS priority, o_orderstatus AS status,
           CAST(GROUPING(o_orderpriority, o_orderstatus) AS INTEGER) AS gid,
           count(*) AS cnt,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
    ORDER BY gid, priority NULLS FIRST, status NULLS FIRST
    """,
    "order margins by priority, by status, and overall via GROUPING SETS",
)
def q30(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupingSets(
            [[F.col("o_orderpriority")], [F.col("o_orderstatus")], []],
            F.col("o_orderpriority"),
            F.col("o_orderstatus"),
        )
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.count("*").alias("cnt"),
            money_out(F.sum(money("o_totalprice"))).alias("total"),
        )
        .select(
            F.col("o_orderpriority").alias("priority"),
            F.col("o_orderstatus").alias("status"),
            "gid", "cnt", "total",
        )
        .orderBy("gid", F.asc_nulls_first("priority"), F.asc_nulls_first("status"))
    )


# ---------------------------------------------------------------------------
# Q31 -- moving-frame window (ROWS BETWEEN 6 PRECEDING AND CURRENT
# ROW): 7-row trailing GMV over the daily pre-aggregate. Q18's running
# total is the unbounded-preceding frame; this gates the BOUNDED frame
# — and the pre-aggregate shrinks the fact to <=90 rows before the
# unpartitioned window sort, so the single-partition sort is a
# driver-sized detail, not a scale hazard. ROWS (not RANGE): absent
# days make the frame span more than 7 calendar days — n_days exposes
# the actual frame width so the semantics are self-describing.
# ---------------------------------------------------------------------------
MOVING_FROM, MOVING_TO = "1995-01-01", "1995-03-31"


@_register(
    "q31_moving_gmv",
    f"""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS gmv
        FROM orders
        WHERE CAST(o_orderdate AS DATE) BETWEEN DATE '{MOVING_FROM}' AND DATE '{MOVING_TO}'
        GROUP BY 1
    )
    SELECT strftime(d, '%Y-%m-%d') AS day,
           round(CAST(gmv AS DOUBLE), 2) AS gmv,
           round(CAST(sum(gmv) OVER w AS DOUBLE), 2) AS gmv_7d,
           CAST(count(*) OVER w AS INTEGER) AS n_days
    FROM daily
    WINDOW w AS (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    ORDER BY day
    """,
    "7-row trailing GMV window over the daily aggregate",
)
def q31(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    daily = (
        orders.filter(
            F.to_date("o_orderdate").between(
                F.lit(MOVING_FROM).cast("date"), F.lit(MOVING_TO).cast("date")
            )
        )
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(F.sum(money("o_totalprice")).cast("decimal(18,2)").alias("gmv"))
    )
    w = Window.orderBy("d").rowsBetween(-6, 0)
    return (
        daily.withColumn("gmv_7d", money_out(F.sum("gmv").over(w)))
        .withColumn("n_days", F.count("*").over(w).cast("int"))
        .select(F.date_format("d", "yyyy-MM-dd").alias("day"),
                money_out("gmv").alias("gmv"), "gmv_7d", "n_days")
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# Q32 -- whole-partition window comparison: orders strictly above their
# own customer's average order value, counted per market segment. The
# frameless PARTITION BY window (no ORDER BY) is the one window shape
# Q18/Q23/Q31 don't cover. Exactness: "price > avg" is evaluated as
# "price * n > sum" in DECIMAL — no division, so both engines compare
# exactly and no borderline float case can flip.
# ---------------------------------------------------------------------------
@_register(
    "q32_above_customer_avg",
    """
    WITH co AS (
        SELECT o_custkey, CAST(o_totalprice AS DECIMAL(18,2)) AS price,
               sum(CAST(o_totalprice AS DECIMAL(18,2)))
                   OVER (PARTITION BY o_custkey) AS tot,
               count(*) OVER (PARTITION BY o_custkey) AS n
        FROM orders
    )
    SELECT c_mktsegment AS segment,
           count(*) AS n_above,
           round(CAST(sum(price) AS DOUBLE), 2) AS sum_above
    FROM co JOIN customer ON o_custkey = c_custkey
    WHERE price * n > tot
    GROUP BY 1 ORDER BY 1
    """,
    "orders above their customer's average order value, per segment",
)
def q32(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    w = Window.partitionBy("o_custkey")
    co = (
        orders.select("o_custkey", money("o_totalprice").alias("price"))
        .withColumn("tot", F.sum("price").over(w))
        .withColumn("n", F.count("*").over(w))
        .filter(F.col("price") * F.col("n") > F.col("tot"))
    )
    return (
        co.join(F.broadcast(customer), co["o_custkey"] == customer["c_custkey"])
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count("*").alias("n_above"),
            money_out(F.sum("price")).alias("sum_above"),
        )
        .orderBy("segment")
    )


# ---------------------------------------------------------------------------
# Q33 -- fixed-width histogram of event values: pure integer bucket
# arithmetic (floor(value/width) with clamping), portable to any
# engine — deliberately NOT width_bucket(), which DuckDB lacks. One
# scan, one shuffle on 10 keys; min/max per bucket are order-exact on
# doubles so no rounding policy is needed.
# ---------------------------------------------------------------------------
HIST_WIDTH, HIST_BUCKETS = 50.0, 10


@_register(
    "q33_value_histogram",
    f"""
    SELECT CAST(least(greatest(floor(value / {HIST_WIDTH}), 0), {HIST_BUCKETS - 1}) AS INTEGER) AS bucket,
           count(*) AS cnt,
           round(min(value), 4) AS v_min,
           round(max(value), 4) AS v_max
    FROM events
    GROUP BY 1 ORDER BY 1
    """,
    "fixed-width value histogram with clamped integer buckets",
)
def q33(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    bucket = F.least(
        F.greatest(F.floor(F.col("value") / HIST_WIDTH), F.lit(0)),
        F.lit(HIST_BUCKETS - 1),
    ).cast("int")
    return (
        events.groupBy(bucket.alias("bucket"))
        .agg(
            F.count("*").alias("cnt"),
            F.round(F.min("value"), 4).alias("v_min"),
            F.round(F.max("value"), 4).alias("v_max"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# Q34 -- entry/exit analysis: each user-day's FIRST and LAST event type
# (ordered by ts with the unique event_id as tiebreak), then user-day
# counts per (first, last) pair. Engine plan: ONE aggregation via
# min_by/max_by over a struct sort key — single shuffle, no window
# sort of the raw fact. The oracle states the same semantics the
# portable way (two row_number windows) since DuckDB's arg_min/arg_max
# take no composite ordering key.
# ---------------------------------------------------------------------------
@_register(
    "q34_entry_exit_pairs",
    """
    WITH ranked AS (
        SELECT user_id, CAST(ts AS DATE) AS d, event_type,
               row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                                  ORDER BY ts, event_id) AS rn_a,
               row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                                  ORDER BY ts DESC, event_id DESC) AS rn_d
        FROM events
    ),
    pairs AS (
        SELECT user_id, d,
               max(CASE WHEN rn_a = 1 THEN event_type END) AS first_type,
               max(CASE WHEN rn_d = 1 THEN event_type END) AS last_type
        FROM ranked GROUP BY 1, 2
    )
    SELECT first_type, last_type, count(*) AS n_user_days
    FROM pairs GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "user-day entry/exit event-type pairs via min_by/max_by",
)
def q34(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    key = F.struct(F.col("ts"), F.col("event_id"))
    pairs = (
        events.groupBy(F.col("user_id"), log_date("ts").alias("d"))
        .agg(
            F.min_by("event_type", key).alias("first_type"),
            F.max_by("event_type", key).alias("last_type"),
        )
    )
    return (
        pairs.groupBy("first_type", "last_type")
        .agg(F.count("*").alias("n_user_days"))
        .orderBy("first_type", "last_type")
    )


# ---------------------------------------------------------------------------
# Q35 -- RANGE-frame window over a calendar axis: trailing 7 CALENDAR
# days of GMV. The complement of Q31's ROWS frame — with absent days,
# ROWS spans more than a week while RANGE spans exactly the value
# interval regardless of how many rows fall in it. Portable form:
# order by epoch-day integer with RANGE BETWEEN 6 PRECEDING (Spark's
# rangeBetween takes numeric offsets; DuckDB accepts the same).
# ---------------------------------------------------------------------------
@_register(
    "q35_range_frame_gmv",
    f"""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS gmv
        FROM orders
        WHERE CAST(o_orderdate AS DATE) BETWEEN DATE '{MOVING_FROM}' AND DATE '{MOVING_TO}'
        GROUP BY 1
    )
    SELECT strftime(d, '%Y-%m-%d') AS day,
           round(CAST(gmv AS DOUBLE), 2) AS gmv,
           round(CAST(sum(gmv) OVER w AS DOUBLE), 2) AS gmv_7cal,
           CAST(count(*) OVER w AS INTEGER) AS n_days
    FROM daily
    WINDOW w AS (ORDER BY CAST(datediff('day', DATE '1970-01-01', d) AS BIGINT)
                 RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
    ORDER BY day
    """,
    "trailing 7-calendar-day GMV via a RANGE window frame",
)
def q35(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    daily = (
        orders.filter(
            F.to_date("o_orderdate").between(
                F.lit(MOVING_FROM).cast("date"), F.lit(MOVING_TO).cast("date")
            )
        )
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(F.sum(money("o_totalprice")).cast("decimal(18,2)").alias("gmv"))
        .withColumn("epoch_day", F.datediff("d", F.lit("1970-01-01").cast("date")))
    )
    w = Window.orderBy("epoch_day").rangeBetween(-6, 0)
    return (
        daily.withColumn("gmv_7cal", money_out(F.sum("gmv").over(w)))
        .withColumn("n_days", F.count("*").over(w).cast("int"))
        .select(F.date_format("d", "yyyy-MM-dd").alias("day"),
                money_out("gmv").alias("gmv"), "gmv_7cal", "n_days")
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# Q36 -- NATIVE session windows: Spark's session_window() operator,
# gated against the same lag+cumsum semantics Q20 states manually.
# Boundary note: session_window treats an exactly-gap-sized silence as
# a session break (windows are [start, start+gap) and merge only on
# overlap), so the oracle marks a new session at diff >= gap — Q20's
# manual formulation uses strict >; the two queries pin BOTH boundary
# conventions. total_active_us is last-minus-first in integer micros
# (exact in both engines).
# ---------------------------------------------------------------------------
@_register(
    "q36_native_session_window",
    f"""
    WITH marked AS (
        SELECT user_id, ts, event_id,
               CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w)
                    >= {SESSION_GAP_S} * 1000000 THEN 1
                    ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
        SELECT user_id, ts,
               sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_id
        FROM marked
    ),
    per AS (
        SELECT user_id, session_id, count(*) AS n_events,
               epoch_us(max(ts)) - epoch_us(min(ts)) AS active_us
        FROM numbered GROUP BY 1, 2
    )
    SELECT count(*) AS n_sessions,
           CAST(max(n_events) AS BIGINT) AS max_events,
           count(DISTINCT user_id) AS n_users,
           CAST(sum(active_us) AS BIGINT) AS total_active_us
    FROM per
    """,
    "session stats via Spark's native session_window operator",
)
def q36(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    per = (
        events.groupBy(
            F.session_window("ts", f"{SESSION_GAP_S} seconds").alias("w"),
            "user_id",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
    )
    return per.agg(
        F.count("*").alias("n_sessions"),
        F.max("n_events").cast("long").alias("max_events"),
        F.count_distinct("user_id").alias("n_users"),
        F.sum(
            gfn.epoch_micros("last_ts") - gfn.epoch_micros("first_ts")
        ).cast("long").alias("total_active_us"),
    )


# ---------------------------------------------------------------------------
# Q9b -- relevance-ORDERED search page: closes the one declared semantic
# gap vs the reference's ES-score pagination (PublisherServiceImpl.java:98-99
# pages hits by practical score; q9/serving substitute id order). The
# integer tf*(1e6 DIV df) proxy makes the ranking engine-exact — see
# operators/text.py:scored_search for the 100 TB plan shape.
# ---------------------------------------------------------------------------
_ANALYZE_SQL = (
    "list_filter(string_split_regex(regexp_replace(lower(text), "
    "'([㐀-䶿一-鿿豈-﫿])', ' \\1 ', 'g'), '[^\\p{L}\\p{N}]+'), t -> t != '')"
)


@_register(
    "q9b_scored_search",
    f"""
    WITH base AS (
        SELECT doc_id,
               CAST(len(list_filter({_ANALYZE_SQL}, t -> t = 'spark')) AS BIGINT) AS tf_0,
               CAST(len(list_filter({_ANALYZE_SQL}, t -> t = 'join')) AS BIGINT) AS tf_1
        FROM documents WHERE lang = '{SEARCH_LANG}'
    ),
    dfs AS (
        SELECT CAST(sum(CASE WHEN tf_0 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_0,
               CAST(sum(CASE WHEN tf_1 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_1
        FROM base
    )
    SELECT doc_id,
           CAST(tf_0 * (1000000 // df_0) + tf_1 * (1000000 // df_1) AS BIGINT) AS score
    FROM base, dfs
    WHERE tf_0 > 0 AND tf_1 > 0
    ORDER BY score DESC, doc_id ASC
    LIMIT 10
    """,
    "relevance-ordered search page (integer tf/df score, deterministic ties)",
)
def q9b(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return text_ops.scored_search(
        docs.filter(F.col("lang") == SEARCH_LANG), "text", SEARCH_KEYWORD, k=10
    )


# ---------------------------------------------------------------------------
# Q37 -- weekly cohort retention matrix: the standard growth-analytics
# triangle the reference dashboard's today/yesterday juxtaposition
# (Controller.java:79,94-99) is a 1x2 slice of. Engine plan: ONE scan
# -- distinct (user, week), then min(week) per user via a window over
# the already-distinct frame (no self-join, no second scan); a user
# active in a week is exactly one row there, so the final count(*) per
# (cohort, offset) IS the distinct-user count.
# ---------------------------------------------------------------------------
@_register(
    "q37_cohort_retention",
    """
    WITH uw AS (
        SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk
        FROM events
    ),
    c AS (
        SELECT user_id, wk,
               min(wk) OVER (PARTITION BY user_id) AS cw
        FROM uw
    )
    SELECT strftime(cw, '%Y-%m-%d') AS cohort_week,
           CAST(date_diff('day', cw, wk) // 7 AS BIGINT) AS week_offset,
           count(*) AS n_users
    FROM c GROUP BY cw, wk
    ORDER BY cohort_week, week_offset
    """,
    "weekly cohort retention matrix (first-active week x offset)",
)
def q37(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    uw = events.select(
        "user_id", F.date_trunc("week", "ts").cast("date").alias("wk")
    ).distinct()
    w = Window.partitionBy("user_id")
    c = uw.withColumn("cw", F.min("wk").over(w))
    return (
        c.groupBy("cw", "wk")
        .agg(F.count("*").cast("long").alias("n_users"))
        .select(
            F.date_format("cw", "yyyy-MM-dd").alias("cohort_week"),
            (F.datediff("wk", "cw") / 7).cast("long").alias("week_offset"),
            "n_users",
        )
        .orderBy("cohort_week", "week_offset")
    )


# ---------------------------------------------------------------------------
# Q38 -- /realtime-hours endpoint envelope as a declared, driver-gated
# query: the today+yesterday DAU hour map the reference assembles
# client-side from two Phoenix queries (Controller.java:76-100 via
# PublisherServiceImpl.java:53-63 + DauMapper.xml:8-11). Here the
# two-day merge is in-plan: ONE scan pruned to both days feeds the
# first-sighting dedup, the hour rollup, and the today/yesterday label.
# The build goes through serving.realtime_hours_frame — the exact plan
# the dict endpoint collects — so a green driver row gates the served
# path, not a test twin.
#
# Oracle note: DuckDB 1.0.0 returns ZERO rows for
# `CAST(ts AS DATE) IN (DATE 'a', DATE 'b')` over the fixture's
# TIMESTAMP(NANOS) column while the `=`-equality form matches — write
# two-date prunes as `= OR =`, never IN.
# ---------------------------------------------------------------------------
@_register(
    "q38_realtime_hours_envelope",
    f"""
    WITH firsts AS (
        SELECT user_id, CAST(ts AS DATE) AS log_date, min(ts) AS first_ts
        FROM events
        WHERE CAST(ts AS DATE) = DATE '{EVENTS_DATE}'
           OR CAST(ts AS DATE) = DATE '{EVENTS_DATE_PREV}'
        GROUP BY 1, 2
    )
    SELECT CASE WHEN log_date = DATE '{EVENTS_DATE}' THEN 'today'
                ELSE 'yesterday' END AS day,
           lpad(CAST(hour(first_ts) AS VARCHAR), 2, '0') AS log_hour,
           count(*) AS value
    FROM firsts GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "realtime-hours endpoint: today+yesterday DAU hour map, one pruned scan",
)
def q38(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .. import serving

    events = load_table(spark, sf_dir, "events")
    # two-day prune as typed RANGE predicates on the raw ts column so
    # it reaches the parquet scan (events_date_filter discipline — a
    # cast-wrapped date filter above the aggregate never pushes down);
    # the frame's own log_date filter is then a no-op re-statement
    two_days = events.filter(
        events_date_filter(events, EVENTS_DATE)
        | events_date_filter(events, EVENTS_DATE_PREV)
    )
    # the deduped DAU serving table derived from the raw stream: first
    # sighting per (user, day) — same shape the dau pipeline persists
    dau = (
        two_days.groupBy("user_id", log_date("ts").alias("log_date"))
        .agg(F.min("ts").alias("first_ts"))
        .select("user_id", "log_date", log_hour("first_ts").alias("log_hour"))
    )
    return serving.realtime_hours_frame(dau, None, "dau", EVENTS_DATE)
