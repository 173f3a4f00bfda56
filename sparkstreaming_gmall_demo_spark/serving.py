"""The publisher REST endpoints re-expressed as Spark SQL over the
serving tables (SURVEY §7.1 step 5; reference gmall-publisher).

Endpoint parity:
- ``realtime_total``   = GET /realtime-total?date=D
  (reference controller/Controller.java:36-70)
- ``realtime_hours``   = GET /realtime-hours?id=...&date=D
  (reference controller/Controller.java:76-100: yesterday = date-1)
- ``sale_detail``      = GET /sale_detail?date=D&keyword=K&startpage=P&size=S
  (reference controller/Controller.java:103-108 +
  service/impl/PublisherServiceImpl.java:82-192)

Each function returns the same JSON-shaped dict the reference emits,
including the quirks: the hardcoded new_mid value 233
(Controller.java:58), hour keys as two-digit strings (Phoenix stores
the "HH" split of SimpleDateFormat output), and the
``Math.round(x*1000/total)/10`` one-decimal per-mille ratios with
female = 100 - male (PublisherServiceImpl.java:137-139,169-170).

The serving tables are the streaming pipelines' outputs (date-
partitioned parquet): a date-filtered endpoint query partition-prunes
to one day's files — the same pushdown story as Phoenix server-side
aggregation over the rowkey-prefixed table.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _java_round_half_up(x: float) -> int:
    """Java Math.round(double): floor(x + 0.5)."""
    import math

    return int(math.floor(x + 0.5))


# ---------------------------------------------------------------------------
# /realtime-total
# ---------------------------------------------------------------------------
def realtime_total(dau: DataFrame, orders: DataFrame, date: str) -> list:
    """[dau total, new_mid (hardcoded 233 — Controller.java:58), GMV].

    dau: serving table keyed (mid, log_date) — one row per active
    device-day, so the total is a partition-pruned count (A6).
    orders: GMV serving table with create_date/total_amount (A8).
    """
    dau_total = dau.filter(F.col("log_date") == F.lit(date)).count()
    amount = (
        orders.filter(F.col("create_date") == F.lit(date))
        .agg(F.sum("total_amount").alias("s"))
        .collect()[0]["s"]  # collect-bound: 1-row agg
    )
    amount_total = float(amount) if amount is not None else 0.0
    return [
        {"id": "dau", "name": "新增日活", "value": dau_total},
        {"id": "new_mid", "name": "新增设备", "value": 233},
        {"id": "order_amount", "name": "新增交易额", "value": amount_total},
    ]


# ---------------------------------------------------------------------------
# /realtime-hours
# ---------------------------------------------------------------------------
def realtime_hours_frame(
    dau: DataFrame, orders: DataFrame, id: str, date: str
) -> DataFrame:
    """Plan-level /realtime-hours: the today+yesterday hour map as
    ordered rows ``(day, log_hour, value)`` — the declared, driver-
    gated form of the endpoint (registry q38_realtime_hours_envelope).

    The yesterday date math is Controller.java:79; the today/yesterday
    merge the reference assembles client-side from two Phoenix queries
    (Controller.java:80-99 via PublisherServiceImpl.java:53-63) happens
    in-plan here: ONE scan partition-pruned to the two days, `day`
    derived from the date column. The dict endpoint below collects this
    single frame instead of running one job per day.

    Hour keys are two-digit strings ("HH") exactly as Phoenix stores
    the SimpleDateFormat split — preserved so the envelope is
    byte-identical to the reference's JSON keys.
    """
    yesterday = (_dt.date.fromisoformat(date) - _dt.timedelta(days=1)).isoformat()
    if id == "dau":
        # count per hour of first sighting (DauMapper.xml:8-11 over the
        # already-deduped DAU table)
        src, date_col, hour_col = dau, "log_date", "log_hour"
        value = F.count("*").cast("long").alias("value")
    elif id == "order_amount":
        src, date_col, hour_col = orders, "create_date", "create_hour"
        value = F.sum("total_amount").cast("double").alias("value")
    else:
        raise ValueError(f"id must be 'dau' or 'order_amount', got {id!r}")
    d = F.col(date_col).cast("date")
    two = src.filter(
        (d == F.lit(date).cast("date")) | (d == F.lit(yesterday).cast("date"))
    )
    return (
        two.groupBy(date_col, hour_col)
        .agg(value)
        .select(
            F.when(F.col(date_col).cast("date") == F.lit(date).cast("date"), "today")
            .otherwise("yesterday")
            .alias("day"),
            F.lpad(F.col(hour_col).cast("string"), 2, "0").alias("log_hour"),
            "value",
        )
        .orderBy("day", "log_hour")
    )


def realtime_hours(dau: DataFrame, orders: DataFrame, id: str, date: str) -> dict:
    """{"today": {HH: v}, "yesterday": {HH: v}} for id in
    {dau, order_amount} (Controller.java:76-100). Thin envelope over
    realtime_hours_frame — one collect, both days.

    An unknown id returns {"today": None, "yesterday": None}: the
    reference controller leaves both maps null when neither branch
    matches (Controller.java:82-97 — todayHourMap/yesterdayHourMap
    stay null and are serialized as JSON nulls), so the endpoint
    tolerates unknown ids rather than erroring. Only the plan-level
    realtime_hours_frame (a programming API, not the endpoint) raises."""
    if id not in ("dau", "order_amount"):
        return {"today": None, "yesterday": None}
    out: dict = {"today": {}, "yesterday": {}}
    for r in realtime_hours_frame(dau, orders, id, date).collect():  # collect-bound: <= 24 hourly rows
        v = r["value"]
        out[r["day"]][r["log_hour"]] = float(v) if id == "order_amount" else v
    return out


# ---------------------------------------------------------------------------
# /sale_detail
# ---------------------------------------------------------------------------
def keyword_and_match(col, keyword: str):
    """ES match-with-AND-operator semantics
    (PublisherServiceImpl.java:86): every analyzed token of the keyword
    must appear in the analyzed field. Uses the shared analyzer-lite
    normalization (operators/text.py:analyze — lowercase +
    non-alphanumeric split on both field and query), same as Q9/F6."""
    from .operators.text import analyze, analyze_keyword

    tokens_col = analyze(col)
    cond = None
    for tok in analyze_keyword(keyword):
        c = F.array_contains(tokens_col, tok)
        cond = c if cond is None else (cond & c)
    return cond if cond is not None else F.lit(True)


def _relevance_score(day: DataFrame, text_col: str, keyword: str):
    """Integer tf×(1e6 DIV df) relevance of ``text_col`` vs the
    analyzed keyword (operators/text.py:scored_search semantics).
    Document frequencies are computed over ``day`` — the searchable
    index, mirroring ES idf over the index rather than the hit set —
    and arrive as one broadcast 1-row aggregate."""
    from .operators.text import analyze, analyze_keyword

    terms = analyze_keyword(keyword)
    toks = analyze(F.col(text_col))

    def _tf(term: str):
        return F.size(F.filter(toks, lambda x: x == F.lit(term)))

    dfs = day.agg(
        *[
            F.sum((_tf(t) > 0).cast("long")).alias(f"_df_{i}")
            for i, t in enumerate(terms)
        ]
    )
    score = None
    for i, t in enumerate(terms):
        part = _tf(t).cast("long") * F.expr(f"1000000 DIV _df_{i}")
        score = part if score is None else score + part
    return dfs, score.cast("long")


def sale_detail(
    sale: DataFrame, date: str, keyword: str, startpage: int, size: int,
    order: str = "id",
) -> dict:
    """{"total": N, "stat": [age stat, gender stat], "detail": rows}.

    One filtered scan feeds three consumers (total count, demographic
    aggregates, detail page) — the batch is persisted across them, the
    Spark analog of ES computing hits + aggs in one pass
    (PublisherServiceImpl.java:82-108).

    ``order="id"`` pages by a deterministic ORDER BY sale_detail_id
    (SURVEY §2.8 O2). ``order="score"`` restores the reference's
    relevance-ORDERED page (PublisherServiceImpl.java:98-99 pages ES
    practical-score order) via the engine-exact integer tf/df proxy,
    ties broken by sale_detail_id — same rank semantics, reproducible
    across engines and partitionings.
    """
    if order not in ("id", "score"):
        raise ValueError(f"order must be 'id' or 'score', got {order!r}")
    day = sale.filter(F.col("dt") == F.lit(date))
    filtered = day.filter(
        keyword_and_match(F.col("sku_name"), keyword)
    ).persist()
    try:
        total = filtered.count()

        # age bands from the user_age terms agg (Impl.java:125-139)
        band = filtered.agg(
            F.sum(F.when(F.col("user_age") < 20, 1).otherwise(0)).alias("low20"),
            F.sum(F.when(F.col("user_age") >= 30, 1).otherwise(0)).alias("up30"),
            F.sum(F.when(F.col("user_gender") == "M", 1).otherwise(0)).alias("male"),
        ).collect()[0]  # collect-bound: 1-row agg
        if total > 0:
            low20_ratio = _java_round_half_up(band["low20"] * 1000.0 / total) / 10.0
            up30_ratio = _java_round_half_up(band["up30"] * 1000.0 / total) / 10.0
            male_ratio = _java_round_half_up(band["male"] * 1000.0 / total) / 10.0
        else:
            low20_ratio = up30_ratio = male_ratio = 0.0
        # middle band and female derived by subtraction, reproducing the
        # reference's asymmetry (Impl.java:141,170)
        mid_ratio = _java_round_half_up((100.0 - low20_ratio - up30_ratio) * 10.0) / 10.0
        female_ratio = _java_round_half_up((100.0 - male_ratio) * 10.0) / 10.0

        stat = [
            {
                "title": "用户年龄占比",
                "options": [
                    {"name": "20岁以下", "value": low20_ratio},
                    {"name": "20岁以下到30岁", "value": mid_ratio},
                    {"name": "30岁及30岁以上", "value": up30_ratio},
                ],
            },
            {
                "title": "用户性别占比",
                "options": [
                    {"name": "男", "value": male_ratio},
                    {"name": "女", "value": female_ratio},
                ],
            },
        ]

        start = (startpage - 1) * size  # Impl.java:98
        if order == "score":
            dfs, score = _relevance_score(day, "sku_name", keyword)
            ordered = (
                filtered.crossJoin(F.broadcast(dfs))
                .withColumn("_score", score)
                .orderBy(F.col("_score").desc(), F.col("sale_detail_id").asc())
                .drop(*[c for c in dfs.columns], "_score")
            )
        else:
            ordered = filtered.orderBy("sale_detail_id")
        page = ordered.offset(start).limit(size)
        detail = [r.asDict() for r in page.collect()]  # collect-bound: one page (limit size)
    finally:
        filtered.unpersist()
    return {"total": total, "stat": stat, "detail": detail}


def search_documents(
    docs: DataFrame,
    embeddings: DataFrame,
    keyword: str,
    query_vec_id: int,
    page: int = 1,
    size: int = 10,
    depth: int = 50,
) -> dict:
    """Hybrid document search envelope — the engine-side extension of
    the reference's scored search surface (PublisherServiceImpl.java
    pages ES-scored hits; this fuses that sparse arm with a dense ANN
    arm by RRF, operators/retrieval.py). Returns
    ``{"total": N, "page": p, "size": s, "hits": [...]}`` where total
    counts BM25 OR-matches and hits are the requested page of the
    fused ranking (rrf desc, doc_id tiebreak — deterministic paging,
    SURVEY §2.8 discipline).

    ``depth`` bounds both arms; pages beyond the fused depth return
    empty — by design, like ES's max_result_window: deep paging over
    rank fusion is a product smell, not an engine feature."""
    from .operators.retrieval import hybrid_rrf
    from .operators.text import analyze, analyze_keyword

    if page < 1 or size < 1:
        raise ValueError("page and size must be >= 1")
    terms = analyze_keyword(keyword)
    # validate BEFORE paying the count job: a keyword that analyzes to
    # zero terms would build an untyped empty array for arrays_overlap
    # and only fail later inside bm25_topk — late and inconsistent
    if not terms:
        raise ValueError(
            f"keyword {keyword!r} analyzes to zero terms; nothing to search"
        )
    # total = OR-match count only: a bare filter + count, NOT the BM25
    # top-k plan — ordering work would be 100% discarded by count(),
    # and with k unbounded Spark can't use TakeOrderedAndProject (it
    # would fall back to a full global sort)
    total = docs.filter(
        F.arrays_overlap(analyze("text"), F.array(*[F.lit(t) for t in terms]))
    ).count()
    fused = hybrid_rrf(
        docs, embeddings, keyword, query_vec_id, k=depth, depth=depth
    )
    start = (page - 1) * size
    hits = [r.asDict() for r in fused.offset(start).limit(size).collect()]  # collect-bound: one page (limit size)
    return {"total": total, "page": page, "size": size, "hits": hits}
