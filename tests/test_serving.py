"""Endpoint-envelope tests for serving.py against the reference's
observable JSON shapes (reference controller/Controller.java,
service/impl/PublisherServiceImpl.java)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from sparkstreaming_gmall_demo_spark import serving


@pytest.fixture()
def dau_table(spark):
    rows = [
        ("m1", "2023-11-14", 8), ("m2", "2023-11-14", 8), ("m3", "2023-11-14", 9),
        ("m1", "2023-11-13", 22),
    ]
    return (
        spark.createDataFrame(rows, ["mid", "log_date", "log_hour"])
        .withColumn("log_date", F.to_date("log_date"))
    )


@pytest.fixture()
def gmv_table(spark):
    rows = [
        ("o1", "2023-11-14", 10, "10.50"), ("o2", "2023-11-14", 10, "1.25"),
        ("o3", "2023-11-14", 11, "4.00"), ("o4", "2023-11-13", 23, "7.00"),
    ]
    return (
        spark.createDataFrame(rows, ["id", "create_date", "create_hour", "total_amount"])
        .withColumn("create_date", F.to_date("create_date"))
        .withColumn("total_amount", F.col("total_amount").cast("decimal(18,2)"))
    )


def test_realtime_total_envelope(dau_table, gmv_table):
    got = serving.realtime_total(dau_table, gmv_table, "2023-11-14")
    assert got == [
        {"id": "dau", "name": "新增日活", "value": 3},
        {"id": "new_mid", "name": "新增设备", "value": 233},  # Controller.java:58
        {"id": "order_amount", "name": "新增交易额", "value": 15.75},
    ]


def test_realtime_total_empty_day(dau_table, gmv_table):
    got = serving.realtime_total(dau_table, gmv_table, "2023-01-01")
    assert got[0]["value"] == 0 and got[2]["value"] == 0.0


def test_realtime_hours_dau(dau_table, gmv_table):
    got = serving.realtime_hours(dau_table, gmv_table, "dau", "2023-11-14")
    assert got == {
        "today": {"08": 2, "09": 1},
        "yesterday": {"22": 1},
    }


def test_realtime_hours_unknown_id_returns_null_maps(dau_table, gmv_table):
    """The reference controller leaves both hour maps null for an
    unknown id (Controller.java:82-97) — the endpoint must tolerate
    unknown ids with {"today": None, "yesterday": None}, not raise."""
    got = serving.realtime_hours(dau_table, gmv_table, "no_such_id", "2023-11-14")
    assert got == {"today": None, "yesterday": None}
    # the plan-level frame builder is a programming API and DOES raise
    with pytest.raises(ValueError):
        serving.realtime_hours_frame(dau_table, gmv_table, "no_such_id", "2023-11-14")


def test_realtime_hours_order_amount(dau_table, gmv_table):
    got = serving.realtime_hours(dau_table, gmv_table, "order_amount", "2023-11-14")
    assert got == {
        "today": {"10": 11.75, "11": 4.00},
        "yesterday": {"23": 7.00},
    }


@pytest.fixture()
def sale_table(spark):
    # 8 matching docs: ages 15,16,25,26,35,36,45,19 / genders M,M,M,F,F,F,M,F
    rows = []
    ages = [15, 16, 25, 26, 35, 36, 45, 19]
    genders = ["M", "M", "M", "F", "F", "F", "M", "F"]
    for i, (age, g) in enumerate(zip(ages, genders)):
        rows.append((f"d{i:02d}", "2023-11-14", "red widget deluxe", age, g))
    # non-matching keyword and other-day rows must be excluded
    rows.append(("d98", "2023-11-14", "blue gadget", 99, "M"))
    rows.append(("d99", "2023-11-13", "red widget", 99, "M"))
    return spark.createDataFrame(
        rows, ["sale_detail_id", "dt", "sku_name", "user_age", "user_gender"]
    ).withColumn("dt", F.to_date("dt"))


def test_sale_detail_envelope(sale_table):
    got = serving.sale_detail(sale_table, "2023-11-14", "widget red", 1, 3)
    assert got["total"] == 8
    age_stat, gender_stat = got["stat"]
    # low20 = 3/8 = 37.5%; up30 = 3/8 = 37.5%; mid = 100-37.5-37.5 = 25.0
    assert age_stat["title"] == "用户年龄占比"
    assert [o["value"] for o in age_stat["options"]] == [37.5, 25.0, 37.5]
    # male 4/8 = 50.0, female = 100-50 = 50.0
    assert [o["value"] for o in gender_stat["options"]] == [50.0, 50.0]
    # page 1, size 3, ordered by sale_detail_id
    assert [d["sale_detail_id"] for d in got["detail"]] == ["d00", "d01", "d02"]


def test_sale_detail_pagination_boundaries(sale_table):
    page3 = serving.sale_detail(sale_table, "2023-11-14", "widget", 3, 3)
    assert [d["sale_detail_id"] for d in page3["detail"]] == ["d06", "d07"]
    page4 = serving.sale_detail(sale_table, "2023-11-14", "widget", 4, 3)
    assert page4["detail"] == []


def test_sale_detail_reference_rounding_asymmetry(spark):
    # 3 docs, 1 male: male = round(1000/3)/10 = 33.3, female = 66.7
    # ages: one per band -> low20 = up30 = 33.3, mid = 33.4 (derived by
    # subtraction, NOT an independent round — the reference asymmetry)
    rows = [("a", "2023-11-14", "x", 10, "M"), ("b", "2023-11-14", "x", 25, "F"),
            ("c", "2023-11-14", "x", 40, "F")]
    sale = spark.createDataFrame(
        rows, ["sale_detail_id", "dt", "sku_name", "user_age", "user_gender"]
    ).withColumn("dt", F.to_date("dt"))
    got = serving.sale_detail(sale, "2023-11-14", "x", 1, 10)
    assert [o["value"] for o in got["stat"][0]["options"]] == [33.3, 33.4, 33.3]
    assert [o["value"] for o in got["stat"][1]["options"]] == [33.3, 66.7]


def test_sale_detail_empty_result(sale_table):
    got = serving.sale_detail(sale_table, "2023-11-14", "nonexistent-kw", 1, 5)
    assert got["total"] == 0 and got["detail"] == []
    assert [o["value"] for o in got["stat"][1]["options"]] == [0.0, 100.0]


def test_sale_detail_score_order_ranks_by_relevance(spark):
    """order="score": rows with more keyword-term occurrences (weighted
    by rarity over the day's index) page first; ties fall back to
    sale_detail_id; the hit SET equals the id-ordered variant's."""
    rows = [
        # widget appears in all 4 (common); red in 2 (rare -> heavier)
        ("d0", "2023-11-14", "widget red red", 10, "M"),     # tf r=2
        ("d1", "2023-11-14", "widget widget red", 20, "F"),  # tf r=1, w=2
        ("d2", "2023-11-14", "widget red", 30, "M"),         # tf 1/1
        ("d3", "2023-11-14", "widget blue", 40, "F"),        # no 'red' -> excluded
    ]
    sale = spark.createDataFrame(
        rows, ["sale_detail_id", "dt", "sku_name", "user_age", "user_gender"]
    ).withColumn("dt", F.to_date("dt"))
    got = serving.sale_detail(sale, "2023-11-14", "widget red", 1, 10, order="score")
    ids = [d["sale_detail_id"] for d in got["detail"]]
    # df(widget)=4 -> w=250000; df(red)=3 -> w=333333
    # d0: 1*250000+2*333333 = 916666 ; d1: 2*250000+1*333333 = 833333
    # d2: 250000+333333 = 583333
    assert ids == ["d0", "d1", "d2"]
    by_id = serving.sale_detail(sale, "2023-11-14", "widget red", 1, 10)
    assert sorted(ids) == sorted(d["sale_detail_id"] for d in by_id["detail"])
    assert got["total"] == by_id["total"] == 3
    # score column must not leak into the envelope
    assert "_score" not in got["detail"][0]


def test_sale_detail_score_order_tie_breaks_on_id(spark):
    """Equal-score hits (identical sku_name token profile) keep the
    deterministic id order within and across pages."""
    rows = [(f"d{9 - i}", "2023-11-14", "widget red", 20, "M") for i in range(6)]
    sale = spark.createDataFrame(
        rows, ["sale_detail_id", "dt", "sku_name", "user_age", "user_gender"]
    ).withColumn("dt", F.to_date("dt"))
    p1 = serving.sale_detail(sale, "2023-11-14", "widget red", 1, 4, order="score")
    p2 = serving.sale_detail(sale, "2023-11-14", "widget red", 2, 4, order="score")
    ids = [d["sale_detail_id"] for d in p1["detail"] + p2["detail"]]
    assert ids == ["d4", "d5", "d6", "d7", "d8", "d9"]
