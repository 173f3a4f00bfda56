"""CDC routing tests (S2/P8): envelope parse, (table, type) routing,
after-image JSON round-trip — mirroring CanalClient.java's handler
semantics including the user_info INSERT∪UPDATE rule."""

from __future__ import annotations

import json

from sparkstreaming_gmall_demo_spark.streaming import cdc


def env(table, typ, data, ts=1700000000000):
    return json.dumps(
        {"database": "gmall", "table": table, "type": typ, "ts": ts, "data": data}
    )


def make_raw(spark, records):
    return spark.createDataFrame([(r,) for r in records], ["value"])


def test_route_all_tables_and_types(spark):
    records = [
        env("order_info", "INSERT", {"id": "o1", "total_amount": "9.99"}),
        env("order_info", "UPDATE", {"id": "o1", "total_amount": "0.00"}),  # dropped
        env("order_detail", "INSERT", {"id": "d1", "order_id": "o1"}),
        env("order_detail", "DELETE", {"id": "d1"}),  # dropped
        env("user_info", "INSERT", {"id": "u1", "gender": "M"}),
        env("user_info", "UPDATE", {"id": "u1", "gender": "F"}),  # kept: CanalClient.java:106-107
        env("other_table", "INSERT", {"id": "x"}),  # unrouted table
    ]
    topics = cdc.route_all(cdc.parse_envelope(make_raw(spark, records)))
    assert set(topics) == {"gmall_order_info", "gmall_order_detail", "gmall_user_info"}

    orders = [json.loads(r.value) for r in topics["gmall_order_info"].collect()]
    assert orders == [{"id": "o1", "total_amount": "9.99"}]

    details = [json.loads(r.value) for r in topics["gmall_order_detail"].collect()]
    assert details == [{"id": "d1", "order_id": "o1"}]

    users = sorted(
        (json.loads(r.value) for r in topics["gmall_user_info"].collect()),
        key=lambda d: d["gender"],
    )
    assert users == [{"id": "u1", "gender": "F"}, {"id": "u1", "gender": "M"}]


def test_route_carries_binlog_ts(spark):
    raw = make_raw(spark, [env("order_info", "INSERT", {"id": "o9"}, ts=123456)])
    out = cdc.route(cdc.parse_envelope(raw), "order_info", ("INSERT",)).collect()
    assert out[0].cdc_ts == 123456


def test_routed_payload_reparses_downstream(spark):
    """The router's output value must parse under the topic schema the
    pipelines consume (round-trip: CDC map -> JSON -> from_json)."""
    from sparkstreaming_gmall_demo_spark import schemas
    from sparkstreaming_gmall_demo_spark.streaming import sources

    raw = make_raw(
        spark,
        [env("user_info", "INSERT",
             {"id": "u1", "login_name": "ln", "user_level": "2",
              "birthday": "1990-06-15", "gender": "M", "ignored_extra": "x"})],
    )
    routed = cdc.route(cdc.parse_envelope(raw), "user_info", ("INSERT", "UPDATE"))
    parsed = sources.parse_topic(routed.select("value"), schemas.USER_INFO,
                                 ts_from_millis=None).collect()
    assert parsed[0].id == "u1" and parsed[0].gender == "M"
    assert parsed[0]._corrupt is None


def test_parse_topic_tolerates_schema_drift(spark):
    """Upstream producers evolve: an ADDED unknown field must be
    silently dropped (fastjson parity, SURVEY §1.1) and a MISSING
    declared field must arrive null — neither may corrupt-flag or kill
    the parse."""
    from pyspark.sql import types as T

    from sparkstreaming_gmall_demo_spark.streaming.sources import parse_topic

    schema = T.StructType([
        T.StructField("id", T.StringType()),
        T.StructField("amount", T.DoubleType()),
        T.StructField("ts", T.LongType()),
    ])
    raw = spark.createDataFrame(
        [
            ('{"id": "a", "amount": 1.5, "ts": 1000, "new_field": "x"}',),
            ('{"id": "b", "ts": 2000}',),  # amount missing
        ],
        ["value"],
    )
    rows = {r.id: r for r in parse_topic(raw, schema).collect()}
    assert rows["a"]._corrupt is None and rows["a"].amount == 1.5
    assert "new_field" not in rows["a"].asDict()
    assert rows["b"]._corrupt is None and rows["b"].amount is None
    assert rows["b"].event_ts is not None  # ts surfaced as event time
