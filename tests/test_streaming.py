"""Chunked-replay tests: each streaming pipeline is fed its topic as
JSON-lines chunk files, one query run per chunk (restart from the same
checkpoint = micro-batch + crash-recovery simulation), and the final
serving table must equal the one-shot batch computation (SURVEY §5.2).

Watermark flushing: stream-stream outer joins and append-mode window
aggregates emit held state only when the watermark advances past it,
so replays end with a far-future sentinel chunk (SURVEY §7.3.5); the
sentinel rows are filtered out of assertions.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sparkstreaming_gmall_demo_spark import schemas
from sparkstreaming_gmall_demo_spark.streaming import pipelines, sources

MS = 1000
BASE = 1700000000 * MS  # 2023-11-14 22:13:20 UTC


def write_chunk(topic_dir, name: str, records: list) -> None:
    topic_dir.mkdir(parents=True, exist_ok=True)
    (topic_dir / name).write_text(
        "\n".join(json.dumps(r) for r in records) + "\n"
    )


def run_available(start_query_fn) -> None:
    q = start_query_fn()
    q.awaitTermination()


# ---------------------------------------------------------------------------
# DAU
# ---------------------------------------------------------------------------
def test_dau_streaming_equals_batch(spark, tmp_path):
    topic = tmp_path / "topic"
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def rec(mid, ts):
        return {"mid": mid, "uid": f"u-{mid}", "appid": "gmall", "area": "a",
                "os": "ios", "ch": "c", "type": "startup", "vs": "1", "ts": ts}

    chunks = [
        [rec("m1", BASE + 1), rec("m1", BASE + 60_000), rec("m2", BASE + 5_000)],
        [rec("m1", BASE + 120_000), rec("m3", BASE + 7_000), rec("m2", BASE + 8_000)],
        # next day: m1 counts again
        [rec("m1", BASE + 86_400_000 + 1_000)],
    ]
    all_recs = [r for c in chunks for r in c]
    for i, chunk in enumerate(chunks):
        write_chunk(topic, f"chunk{i}.jsonl", chunk)
        run_available(
            lambda: pipelines.dau_pipeline(
                sources.parse_topic(
                    sources.file_topic_stream(spark, str(topic)), schemas.STARTUP_LOG
                ),
                out, ckpt, trigger={"availableNow": True},
            )
        )

    got = {
        (r.mid, str(r.log_date), r.log_hour)
        for r in spark.read.parquet(out).collect()
    }
    batch = (
        spark.createDataFrame(
            [(r["mid"], r["ts"]) for r in all_recs], ["mid", "ts"]
        )
        .withColumn("event_ts", F.timestamp_millis("ts"))
        .withColumn("log_date", F.to_date("event_ts"))
        .groupBy("mid", "log_date")
        .agg(F.min("event_ts").alias("first_ts"))
        .select("mid", "log_date", F.hour("first_ts").alias("log_hour"))
    )
    want = {(r.mid, str(r.log_date), r.log_hour) for r in batch.collect()}
    assert got == want
    # exactly one row per (mid, day)
    assert spark.read.parquet(out).count() == len(want)


# ---------------------------------------------------------------------------
# GMV
# ---------------------------------------------------------------------------
def test_gmv_streaming_idempotent_append(spark, tmp_path):
    topic = tmp_path / "topic"
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def order(oid, amount, hour):
        return {"id": oid, "user_id": f"u{oid}", "total_amount": amount,
                "create_time": f"2023-11-14 {hour:02d}:30:00", "order_status": "1001"}

    write_chunk(topic, "c0.jsonl", [order("o1", 10.50, 10), order("o2", 20.25, 11)])
    write_chunk(topic, "c1.jsonl", [order("o2", 20.25, 11), order("o3", 5.00, 11)])

    def start():
        return pipelines.gmv_pipeline(
            sources.parse_topic(
                sources.file_topic_stream(spark, str(topic)),
                schemas.ORDER_INFO,
                ts_from_millis=None,
            ),
            out, ckpt, trigger={"availableNow": True},
        )

    run_available(start)
    result = spark.read.parquet(out)
    assert result.count() == 3  # o2 replay inserted once
    total = result.agg(F.sum("total_amount")).collect()[0][0]
    assert str(total) == "35.75"
    hours = {
        (r.create_hour, str(r.s))
        for r in result.groupBy("create_hour").agg(
            F.sum("total_amount").alias("s")
        ).collect()
    }
    assert hours == {(10, "10.50"), (11, "25.25")}


# ---------------------------------------------------------------------------
# Alert
# ---------------------------------------------------------------------------
def test_alert_window_streaming(spark, tmp_path):
    topic = tmp_path / "topic"
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def ev(mid, uid, evid, ts, itemid="i1"):
        return {"mid": mid, "uid": uid, "appid": "gmall", "area": "a", "os": "ios",
                "ch": "c", "type": "event", "evid": evid, "pgid": "p", "npgid": "n",
                "itemid": itemid, "ts": ts}

    w0 = (BASE // 300_000) * 300_000  # align to the 5-min window start
    chunks = [
        # m1: 3 distinct uids coupon, no clickItem -> alert
        # m2: 3 uids coupon but clickItem present -> suppressed (A5)
        # m3: only 2 distinct uids -> below threshold (A3)
        [ev("m1", "u1", "coupon", w0 + 1_000), ev("m1", "u2", "coupon", w0 + 2_000),
         ev("m2", "u1", "coupon", w0 + 3_000), ev("m2", "u2", "coupon", w0 + 4_000)],
        [ev("m1", "u3", "coupon", w0 + 5_000), ev("m2", "u3", "coupon", w0 + 6_000),
         ev("m2", "u9", "clickItem", w0 + 7_000),
         ev("m3", "u1", "coupon", w0 + 8_000), ev("m3", "u2", "coupon", w0 + 9_000)],
        # far-future sentinel advances the watermark past the window
        [ev("zz-sentinel", "u0", "other", w0 + 3_600_000)],
    ]
    for i, chunk in enumerate(chunks):
        write_chunk(topic, f"c{i}.jsonl", chunk)
        run_available(
            lambda: pipelines.alert_pipeline(
                sources.parse_topic(
                    sources.file_topic_stream(spark, str(topic)), schemas.EVENT_LOG
                ),
                out, ckpt, trigger={"availableNow": True},
            )
        )

    rows = spark.read.parquet(out).filter(~F.col("mid").startswith("zz-")).collect()
    assert [r.mid for r in rows] == ["m1"]
    assert sorted(rows[0].uids) == ["u1", "u2", "u3"]
    assert rows[0].events == ["coupon", "coupon", "coupon"]


# ---------------------------------------------------------------------------
# User dim
# ---------------------------------------------------------------------------
USER_STREAM = T.StructType(
    schemas.USER_INFO.fields + [T.StructField("op_ts", T.LongType())]
)


def test_idempotent_append_batch_hwm_skips_probe_for_fresh_batches(
    spark, tmp_path, monkeypatch
):
    """Batch-id high-water-mark (round-2 verdict item 8): a batch id
    above the recorded mark has never touched the sink, so the probe
    (prune collect + sink scan + anti-join) must be skipped outright;
    a replayed id (crash before checkpoint commit) must take the full
    guard and stay duplicate-free; the mark is claimed BEFORE the
    write so the crash direction is safe."""
    from sparkstreaming_gmall_demo_spark.streaming import sinks

    import shutil

    out = str(tmp_path / "out")
    probed = []
    orig = sinks._idempotent_append_inner
    monkeypatch.setattr(
        sinks,
        "_idempotent_append_inner",
        lambda *a, **k: (probed.append(1), orig(*a, **k))[1],
    )

    df1 = spark.createDataFrame([("1", "a"), ("2", "b")], ["id", "v"])
    sinks.idempotent_append(df1, out, ["id"], None, batch_id=0)
    assert probed == []  # fresh id: fast path, no probe
    assert spark.read.parquet(out).count() == 2

    # at-least-once replay of the SAME id: full guard, no duplicates
    sinks.idempotent_append(df1, out, ["id"], None, batch_id=0)
    assert probed == [1]
    assert spark.read.parquet(out).count() == 2

    # next fresh id: fast path again
    df2 = spark.createDataFrame([("3", "c")], ["id", "v"])
    sinks.idempotent_append(df2, out, ["id"], None, batch_id=1)
    assert probed == [1]
    assert sorted(r.id for r in spark.read.parquet(out).collect()) == ["1", "2", "3"]

    # restart WITHOUT checkpoint over the kept sink: ids restart at
    # 0 <= hwm (the mark lives in the SINK, not the checkpoint) — both
    # re-fed batches take the full guard, nothing duplicates
    sinks.idempotent_append(df1, out, ["id"], None, batch_id=0)
    sinks.idempotent_append(df2, out, ["id"], None, batch_id=1)
    assert probed == [1, 1, 1]
    assert spark.read.parquet(out).count() == 3

    # sink wiped: the mark dies with the data it describes — fresh
    # fast path against the now-empty sink
    shutil.rmtree(out)
    sinks.idempotent_append(df1, out, ["id"], None, batch_id=2)
    assert probed == [1, 1, 1]
    assert spark.read.parquet(out).count() == 2


def test_dim_snapshot_survives_source_overwrite(spark, tmp_path):
    """The cached dim snapshot must be independent of the dim's parquet
    files: after the user_dim pipeline overwrites/compacts them, a
    recomputation of an evicted persist() would read vanished paths
    and fail the micro-batch (round-2 advice). localCheckpoint severs
    the lineage — deleting the source outright must not break the
    snapshot. clear_dim_cache releases the entries."""
    import shutil

    dim = tmp_path / "dim"
    spark.createDataFrame(
        [("1", "M", "2", "1990-06-15"), ("2", "F", "1", "1985-01-02")],
        ["id", "gender", "user_level", "birthday"],
    ).write.parquet(str(dim))

    snap = pipelines._cached_user_dim(spark, str(dim), "2024-01-01")
    assert snap is not None and snap.count() == 2

    shutil.rmtree(dim)  # the overwrite/eviction hazard, made total
    assert snap.count() == 2  # snapshot still serves
    # a vanished dim reads as not-populated (the pre-cache contract)
    assert pipelines._cached_user_dim(spark, str(dim), "2024-01-01") is None

    pipelines.clear_dim_cache()
    assert pipelines._DIM_CACHE == {}


def test_user_dim_last_write_wins(spark, tmp_path):
    topic = tmp_path / "topic"
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def user(uid, gender, level, op_ts):
        return {"id": uid, "login_name": f"l{uid}", "user_level": level,
                "birthday": "1990-06-15", "gender": gender, "op_ts": op_ts}

    write_chunk(topic, "c0.jsonl", [user("1", "M", "1", 100), user("2", "F", "2", 101)])
    run_available(
        lambda: pipelines.user_dim_pipeline(
            sources.parse_topic(
                sources.file_topic_stream(spark, str(topic)), USER_STREAM,
                ts_from_millis=None,
            ),
            out, ckpt, trigger={"availableNow": True},
        )
    )
    write_chunk(topic, "c1.jsonl", [user("1", "F", "3", 200)])  # CDC UPDATE
    run_available(
        lambda: pipelines.user_dim_pipeline(
            sources.parse_topic(
                sources.file_topic_stream(spark, str(topic)), USER_STREAM,
                ts_from_millis=None,
            ),
            out, ckpt, trigger={"availableNow": True},
        )
    )

    rows = {r.id: (r.gender, r.user_level) for r in spark.read.parquet(out).collect()}
    assert rows == {"1": ("F", "3"), "2": ("F", "2")}


# ---------------------------------------------------------------------------
# Sale detail 3-way join
# ---------------------------------------------------------------------------
ORDER_STREAM = T.StructType(
    schemas.ORDER_INFO.fields + [T.StructField("ts", T.LongType())]
)
DETAIL_STREAM = T.StructType(
    schemas.ORDER_DETAIL.fields + [T.StructField("ts", T.LongType())]
)


def test_sale_detail_full_outer_join_with_dim(spark, tmp_path):
    o_topic, d_topic = tmp_path / "orders", tmp_path / "details"
    dim = str(tmp_path / "dim")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # static user dim (the UserInfoApp dependency, made explicit)
    spark.createDataFrame(
        [("u1", "l1", "2", "1990-06-15", "F")], schemas.USER_INFO
    ).write.parquet(dim)

    def order(oid, uid, ts):
        return {"id": oid, "user_id": uid, "total_amount": 99.99,
                "create_time": "2023-11-14 10:00:00", "ts": ts}

    def detail(did, oid, ts):
        return {"id": did, "order_id": oid, "sku_id": "s1", "sku_name": "widget",
                "order_price": 9.99, "sku_num": 2, "ts": ts}

    def start():
        return pipelines.sale_detail_pipeline(
            spark,
            sources.parse_topic(sources.file_topic_stream(spark, str(o_topic)), ORDER_STREAM),
            sources.parse_topic(sources.file_topic_stream(spark, str(d_topic)), DETAIL_STREAM),
            dim, out, ckpt, trigger={"availableNow": True},
        )

    # chunk 0: o1 with one detail now; d2 references order o2 that never comes
    write_chunk(o_topic, "c0.jsonl", [order("o1", "u1", BASE + 1_000)])
    write_chunk(d_topic, "c0.jsonl",
                [detail("d1", "o1", BASE + 2_000), detail("d2", "o2", BASE + 3_000)])
    run_available(start)
    # chunk 1: late detail for o1 (8s later, inside the 10s TTL contract);
    # order o3 that never gets details
    write_chunk(o_topic, "c1.jsonl", [order("o3", "u9", BASE + 10_000)])
    write_chunk(d_topic, "c1.jsonl", [detail("d3", "o1", BASE + 9_000)])
    run_available(start)
    # sentinel on both inputs pushes the watermark far past everything
    write_chunk(o_topic, "c2.jsonl", [order("zz-sentinel", "u0", BASE + 3_600_000)])
    write_chunk(d_topic, "c2.jsonl", [detail("zz-d", "zz-sentinel", BASE + 3_600_000)])
    run_available(start)

    rows = spark.read.parquet(out).filter(~F.col("join_key").startswith("zz-")).collect()
    by_id = {r.sale_detail_id: r for r in rows}
    assert set(by_id) == {"d1", "d3", "d2", "order:o3"}
    # matched 1:N fanout keeps order fields on every detail row
    assert by_id["d1"].order_id == "o1" and by_id["d3"].order_id == "o1"
    # dim enrichment via broadcast join; age as of 2024-01-01, /365 semantics
    assert by_id["d1"].user_gender == "F" and by_id["d1"].user_age == 33
    # detail whose order never arrived: order side null (F4 semantics)
    assert by_id["d2"].order_id is None and by_id["d2"].user_gender is None
    # order with no details: detail side null, kept (full outer)
    assert by_id["order:o3"].detail_id is None and by_id["order:o3"].total_amount is not None


def test_sale_detail_pipeline_bucketed_sink(spark, tmp_path):
    """Same pipeline, bucketed sink mode: replayed chunks still land
    exactly-once, and the sink is a real bucketed table (the replay
    probe needs no sink-side shuffle — plan pinned in
    test_bucketing.py)."""
    o_topic, d_topic = tmp_path / "orders", tmp_path / "details"
    dim = str(tmp_path / "dim")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame(
        [("u1", "l1", "2", "1990-06-15", "F")], schemas.USER_INFO
    ).write.parquet(dim)

    def start():
        return pipelines.sale_detail_pipeline(
            spark,
            sources.parse_topic(sources.file_topic_stream(spark, str(o_topic)), ORDER_STREAM),
            sources.parse_topic(sources.file_topic_stream(spark, str(d_topic)), DETAIL_STREAM),
            dim, out, ckpt, trigger={"availableNow": True},
            bucket_table="b_sale_detail", buckets=4,
        )

    try:
        write_chunk(o_topic, "c0.jsonl",
                    [{"id": "o1", "user_id": "u1", "total_amount": 99.99,
                      "create_time": "2023-11-14 10:00:00", "ts": BASE + 1_000}])
        write_chunk(d_topic, "c0.jsonl",
                    [{"id": "d1", "order_id": "o1", "sku_id": "s1",
                      "sku_name": "widget", "order_price": 9.99, "sku_num": 2,
                      "ts": BASE + 2_000}])
        run_available(start)
        # sentinel flushes join state; also re-delivers nothing new
        write_chunk(o_topic, "c1.jsonl",
                    [{"id": "zz-s", "user_id": "u0", "total_amount": 1.0,
                      "create_time": "2023-11-14 11:00:00", "ts": BASE + 3_600_000}])
        write_chunk(d_topic, "c1.jsonl",
                    [{"id": "zz-d", "order_id": "zz-s", "sku_id": "s",
                      "sku_name": "s", "order_price": 1.0, "sku_num": 1,
                      "ts": BASE + 3_600_000}])
        run_available(start)

        tbl = spark.table("b_sale_detail")
        rows = tbl.filter(~F.col("sale_detail_id").startswith("zz-")).collect()
        assert {r.sale_detail_id for r in rows} == {"d1"}
        assert rows[0].user_gender == "F"
        # it really is bucketed on the sink key
        desc = spark.sql("DESCRIBE TABLE EXTENDED b_sale_detail").collect()
        info = {r.col_name: r.data_type for r in desc}
        assert info.get("Num Buckets") == "4"
        assert "sale_detail_id" in info.get("Bucket Columns", "")
    finally:
        spark.sql("DROP TABLE IF EXISTS b_sale_detail")


# ---------------------------------------------------------------------------
# Corrupt-record policy (P1)
# ---------------------------------------------------------------------------
def test_parse_topic_keeps_corrupt_records(spark, tmp_path):
    topic = tmp_path / "topic"
    write_chunk(topic, "c0.jsonl", [])
    (topic / "c0.jsonl").write_text(
        json.dumps({"mid": "m1", "ts": BASE}) + "\nnot-json-at-all\n"
    )
    df = sources.parse_topic(
        spark.read.text(str(topic)).select("value"), schemas.STARTUP_LOG
    )
    rows = df.collect()
    good = [r for r in rows if r._corrupt is None]
    bad = [r for r in rows if r._corrupt is not None]
    assert len(good) == 1 and good[0].mid == "m1"
    assert len(bad) == 1 and bad[0]._corrupt == "not-json-at-all"


# ---------------------------------------------------------------------------
# Sessionization (applyInPandasWithState custom stateful operator)
# ---------------------------------------------------------------------------
def test_sessionize_gap_semantics(spark, tmp_path):
    from sparkstreaming_gmall_demo_spark.streaming import stateful

    topic = tmp_path / "topic"
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def ev(mid, ts):
        return {"mid": mid, "uid": "u", "appid": "gmall", "area": "a", "os": "ios",
                "ch": "c", "type": "event", "evid": "view", "pgid": "p",
                "npgid": "n", "itemid": "i", "ts": ts}

    chunks = [
        # m1: two events 10s apart (one session, gap=30s); m2: one event
        [ev("m1", BASE), ev("m1", BASE + 10_000), ev("m2", BASE + 5_000)],
        # m1: event 100s after -> beyond gap, closes session 1, opens session 2
        [ev("m1", BASE + 110_000)],
        # sentinel far ahead: watermark passes everything, timeouts fire
        [ev("zz-sentinel", BASE + 3_600_000)],
        # one more empty-ish batch so the advanced watermark triggers timeouts
        [ev("zz-sentinel2", BASE + 7_200_000)],
    ]

    def sink(batch_df, batch_id):
        if batch_df.count() > 0:
            batch_df.write.mode("append").parquet(out)

    for i, chunk in enumerate(chunks):
        write_chunk(topic, f"c{i}.jsonl", chunk)
        q = (
            stateful.sessionize(
                sources.parse_topic(
                    sources.file_topic_stream(spark, str(topic)), schemas.EVENT_LOG
                ).select("mid", "event_ts"),
                gap_seconds=30,
            )
            .writeStream.outputMode("append")
            .foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    rows = spark.read.parquet(out).filter(~F.col("mid").startswith("zz-")).collect()
    sessions = sorted(
        (r.mid, r.session_start.timestamp(), r.session_end.timestamp(), r.n_events)
        for r in rows
    )
    b = BASE / 1000
    assert sessions == [
        ("m1", b, b + 10.0, 2),
        ("m1", b + 110.0, b + 110.0, 1),
        ("m2", b + 5.0, b + 5.0, 1),
    ]


def test_alert_sliding_window_dedups_overlaps(spark, tmp_path):
    """Sliding windows fire the same (mid, minute) alert from multiple
    overlapping windows; the minute-bucket sink key must keep one row
    per mid+minute (the reference's ES doc-id semantics, W3)."""
    topic = tmp_path / "topic"
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def ev(mid, uid, evid, ts):
        return {"mid": mid, "uid": uid, "appid": "g", "area": "a", "os": "i",
                "ch": "c", "type": "e", "evid": evid, "pgid": "p", "npgid": "n",
                "itemid": "it", "ts": ts}

    w0 = (BASE // 300_000) * 300_000
    chunks = [
        [ev("m1", "u1", "coupon", w0 + 1_000), ev("m1", "u2", "coupon", w0 + 2_000),
         ev("m1", "u3", "coupon", w0 + 3_000)],
        [ev("zz-sentinel", "u0", "other", w0 + 3_600_000)],
    ]
    for i, chunk in enumerate(chunks):
        write_chunk(topic, f"c{i}.jsonl", chunk)
        run_available(
            lambda: pipelines.alert_pipeline(
                sources.parse_topic(
                    sources.file_topic_stream(spark, str(topic)), schemas.EVENT_LOG
                ),
                out, ckpt, slide_duration="1 minute",
                trigger={"availableNow": True},
            )
        )

    rows = spark.read.parquet(out).filter(~F.col("mid").startswith("zz-")).collect()
    # 5 overlapping 5-min/1-min windows cover the events, but the
    # minute bucket of the last event is identical -> exactly one row
    assert len(rows) == 1 and rows[0].mid == "m1"
    assert sorted(rows[0].uids) == ["u1", "u2", "u3"]


def test_gmv_dead_letter_quarantines_corrupt_records(spark, tmp_path):
    topic = tmp_path / "topic"
    out = str(tmp_path / "out")
    dlq = str(tmp_path / "dlq")
    ckpt = str(tmp_path / "ckpt")

    topic.mkdir()
    good = json.dumps({"id": "o1", "user_id": "u1", "total_amount": 5.00,
                       "create_time": "2023-11-14 10:00:00"})
    (topic / "c0.jsonl").write_text(good + "\n{broken json!!\n")

    q = pipelines.gmv_pipeline(
        sources.parse_topic(
            sources.file_topic_stream(spark, str(topic)), schemas.ORDER_INFO,
            ts_from_millis=None,
        ),
        out, ckpt, dead_letter=dlq, trigger={"availableNow": True},
    )
    q.awaitTermination()

    assert [r.id for r in spark.read.parquet(out).collect()] == ["o1"]
    quarantined = spark.read.parquet(dlq).collect()
    assert len(quarantined) == 1 and quarantined[0].raw == "{broken json!!"


def test_alert_pipeline_ignores_corrupt_records(spark, tmp_path):
    """A bad JSON line must not create a null-mid group in window
    state (ghost-row regression guard)."""
    topic = tmp_path / "topic"
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def ev(mid, uid, ts):
        return {"mid": mid, "uid": uid, "appid": "g", "area": "a", "os": "i",
                "ch": "c", "type": "e", "evid": "coupon", "pgid": "p",
                "npgid": "n", "itemid": "it", "ts": ts}

    w0 = (BASE // 300_000) * 300_000
    topic.mkdir()
    lines = [json.dumps(ev("m1", f"u{i}", w0 + 1_000 * (i + 1))) for i in range(3)]
    lines.append("][ definitely not json")
    (topic / "c0.jsonl").write_text("\n".join(lines) + "\n")
    write_chunk(topic, "c1.jsonl", [ev("zz-sentinel", "u0", w0 + 3_600_000)])

    for _ in range(2):
        run_available(
            lambda: pipelines.alert_pipeline(
                sources.parse_topic(
                    sources.file_topic_stream(spark, str(topic)), schemas.EVENT_LOG
                ),
                out, ckpt, trigger={"availableNow": True},
            )
        )

    rows = spark.read.parquet(out).filter(~F.col("mid").startswith("zz-")).collect()
    assert [r.mid for r in rows] == ["m1"]
    assert all(r.mid is not None for r in rows)


# ---------------------------------------------------------------------------
# Multi-sink fanout (reference dstream.cache() + N output ops,
# app/DauApp.scala:41-52): serving table + per-batch monitoring counts
# from one persisted batch
# ---------------------------------------------------------------------------
def test_dau_fanout_monitoring_counts(spark, tmp_path):
    topic = tmp_path / "topic"
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    monitor = str(tmp_path / "monitor")

    def rec(mid, ts):
        return {"mid": mid, "uid": f"u-{mid}", "appid": "gmall", "area": "a",
                "os": "ios", "ch": "c", "type": "startup", "vs": "1", "ts": ts}

    chunks = [
        [rec("m1", BASE + 1), rec("m1", BASE + 60_000), rec("m2", BASE + 5_000)],
        [rec("m3", BASE + 7_000), rec("m1", BASE + 120_000)],
    ]
    for i, chunk in enumerate(chunks):
        write_chunk(topic, f"chunk{i}.jsonl", chunk)
        run_available(
            lambda: pipelines.dau_pipeline(
                sources.parse_topic(
                    sources.file_topic_stream(spark, str(topic)), schemas.STARTUP_LOG
                ),
                out, ckpt, trigger={"availableNow": True},
                monitor_path=monitor,
            )
        )

    served = spark.read.parquet(out)
    mon = spark.read.parquet(monitor)
    # every serving row was counted exactly once across the batch probes
    assert mon.agg(F.sum("n_rows")).collect()[0][0] == served.count()
    # the monitor attributes counts to the serving date partition
    assert {str(r.log_date) for r in mon.collect()} == {
        str(r.log_date) for r in served.collect()
    }
    # and batch ids are present for replay forensics
    assert mon.filter(F.col("batch_id").isNull()).count() == 0
    # watermark-lag signal: per-batch event-time bounds cover the data
    bounds = mon.agg(
        F.min("min_event_ts").alias("lo"), F.max("max_event_ts").alias("hi")
    ).collect()[0]
    assert bounds.lo is not None and bounds.lo <= bounds.hi


def test_fanout_unpersists_after_sinks(spark):
    from sparkstreaming_gmall_demo_spark.streaming.sinks import fanout

    df = spark.range(0, 100)
    seen = []
    fanout(df, lambda d: seen.append(d.count()), lambda d: seen.append(d.count()))
    assert seen == [100, 100]
    assert not df.storageLevel.useMemory  # unpersisted after the fanout

    # a failing sink must still unpersist
    try:
        fanout(df, lambda d: 1 / 0)
    except ZeroDivisionError:
        pass
    assert not df.storageLevel.useMemory


def test_idempotent_append_isin_fast_path(spark, tmp_path, monkeypatch):
    """With the sink-size gate forced open, the keyed-probe fast path
    must preserve exact replay idempotency."""
    from sparkstreaming_gmall_demo_spark.streaming import sinks

    monkeypatch.setattr(sinks, "PROBE_ISIN_MIN_SINK_BYTES", 0)
    out = str(tmp_path / "sink")
    b1 = spark.createDataFrame(
        [("k1", "2024-01-01", 1), ("k2", "2024-01-01", 2)], ["mid", "d", "v"]
    )
    b2 = spark.createDataFrame(
        [("k1", "2024-01-01", 9),   # replayed key: must not re-insert
         ("k3", "2024-01-02", 3)],  # new key, new partition
        ["mid", "d", "v"],
    )
    sinks.idempotent_append(b1, out, key_cols=["mid", "d"], partition_cols=["d"])
    sinks.idempotent_append(b2, out, key_cols=["mid", "d"], partition_cols=["d"])
    sinks.idempotent_append(b2, out, key_cols=["mid", "d"], partition_cols=["d"])
    got = {(r.mid, str(r.d), r.v) for r in spark.read.parquet(out).collect()}
    assert got == {("k1", "2024-01-01", 1), ("k2", "2024-01-01", 2),
                   ("k3", "2024-01-02", 3)}


def test_monitoring_counts_idempotent_on_batch_replay(spark, tmp_path):
    """At-least-once foreachBatch: re-running a batch with the same id
    (crash between sink and checkpoint commit) must not double the
    probe row."""
    from sparkstreaming_gmall_demo_spark.streaming.sinks import monitoring_counts

    monitor = str(tmp_path / "monitor")
    df = spark.createDataFrame([("d1", 1), ("d1", 2), ("d2", 3)], ["d", "v"])
    monitoring_counts(df, monitor, batch_id=7, group_col="d")
    monitoring_counts(df, monitor, batch_id=7, group_col="d")  # replay
    monitoring_counts(df, monitor, batch_id=8, group_col="d")
    rows = spark.read.parquet(monitor).collect()
    assert len(rows) == 4  # 2 groups x 2 distinct batches, replay skipped
    assert sum(r.n_rows for r in rows if r.batch_id == 7) == 3


# ---------------------------------------------------------------------------
# Native session windows
# ---------------------------------------------------------------------------
def test_session_window_streaming_equals_batch(spark, tmp_path):
    """Sessions must merge across micro-batches (chunk 1 extends a
    session opened in chunk 0) and close exactly once at watermark
    passage; the final table equals the one-shot batch session_window
    computation."""
    topic = tmp_path / "topic"
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def ev(mid, ts):
        return {"mid": mid, "uid": f"u-{mid}", "appid": "gmall", "area": "a",
                "os": "ios", "ch": "c", "type": "event", "evid": "view",
                "pgid": "p", "npgid": "n", "itemid": "i", "ts": ts}

    chunks = [
        # m1 opens a session; m2 opens another
        [ev("m1", BASE + 1_000), ev("m1", BASE + 30_000), ev("m2", BASE + 5_000)],
        # m2 extends its open session (45s < 60s gap); m1's 120s silence
        # (90s since last) starts a NEW session
        [ev("m2", BASE + 50_000), ev("m1", BASE + 150_000)],
        # sentinel flushes everything
        [ev("zz-sentinel", BASE + 3_600_000)],
    ]
    all_recs = [r for c in chunks for r in c]
    for i, chunk in enumerate(chunks):
        write_chunk(topic, f"c{i}.jsonl", chunk)
        run_available(
            lambda: pipelines.session_pipeline(
                sources.parse_topic(
                    sources.file_topic_stream(spark, str(topic)), schemas.EVENT_LOG
                ),
                out, ckpt, gap="60 seconds", trigger={"availableNow": True},
            )
        )

    got = {
        (r.mid, str(r.session_start), r.n_events)
        for r in spark.read.parquet(out)
        .filter(~F.col("mid").startswith("zz-")).collect()
    }
    batch = (
        spark.createDataFrame([(r["mid"], r["ts"]) for r in all_recs], ["mid", "ts"])
        .filter(~F.col("mid").startswith("zz-"))
        .withColumn("event_ts", F.timestamp_millis("ts"))
        .groupBy(F.session_window("event_ts", "60 seconds").alias("w"), "mid")
        .agg(F.count("*").alias("n_events"))
        .select("mid", F.col("w.start").alias("session_start"), "n_events")
    )
    want = {(r.mid, str(r.session_start), r.n_events) for r in batch.collect()}
    assert got == want
    assert len(got) == 3  # m1 x2 sessions, m2 x1


def test_user_dim_delete_tombstone_survives_replay(spark, tmp_path):
    """CDC DELETE -> tombstone in the dim table: read_dim hides the
    key; an at-least-once replay of an OLDER update must not resurrect
    it (the stored tombstone outranks it); a genuinely newer re-INSERT
    does."""
    from sparkstreaming_gmall_demo_spark.streaming.sinks import (
        merge_last_write_wins, read_dim,
    )

    out = str(tmp_path / "dim")
    schema = "id string, gender string, op string, op_ts long"

    def merge(rows):
        merge_last_write_wins(
            spark.createDataFrame(rows, schema), out,
            key_col="id", version_col="op_ts",
        )

    merge([("1", "M", "INSERT", 100), ("2", "F", "INSERT", 101)])
    merge([("1", "F", "UPDATE", 200)])
    merge([("1", None, "DELETE", 300)])
    # replayed older update (at-least-once upstream): must stay deleted
    merge([("1", "F", "UPDATE", 200)])
    assert {r.id for r in read_dim(spark, out, op_col="op").collect()} == {"2"}
    # newer re-insert resurrects the key
    merge([("1", "X", "INSERT", 400)])
    live = {r.id: r.gender for r in read_dim(spark, out, op_col="op").collect()}
    assert live == {"1": "X", "2": "F"}


def test_compact_partition_preserves_rows_and_replay_guard(spark, tmp_path):
    """Day-close compaction: a partition written by many micro-batches
    collapses to one file, rows and schema unchanged, and the sink's
    replay guard still dedups against the compacted files."""
    from sparkstreaming_gmall_demo_spark.streaming.sinks import (
        compact_partition, idempotent_append,
    )

    out = str(tmp_path / "out")
    schema = "mid string, d string, v long"
    for i in range(4):  # 4 "micro-batches" into the same day
        idempotent_append(
            spark.createDataFrame([(f"m{i}", "2024-01-01", i)], schema),
            out, key_cols=["mid", "d"], partition_cols=["d"],
        )
    part = tmp_path / "out" / "d=2024-01-01"
    files_before = len([f for f in part.iterdir() if f.suffix == ".parquet"])
    assert files_before >= 4

    n = compact_partition(spark, out, "d", "2024-01-01")
    assert n == 1
    rows = {(r.mid, str(r.d), r.v) for r in spark.read.parquet(out).collect()}
    assert rows == {(f"m{i}", "2024-01-01", i) for i in range(4)}

    # replay of an already-written key after compaction: still a no-op
    idempotent_append(
        spark.createDataFrame([("m0", "2024-01-01", 99)], schema),
        out, key_cols=["mid", "d"], partition_cols=["d"],
    )
    assert spark.read.parquet(out).count() == 4
    # absent partition -> 0, no error
    assert compact_partition(spark, out, "d", "1999-12-31") == 0


def test_idempotent_append_null_partition_replay(spark, tmp_path, monkeypatch):
    """A parseable record without create_time lands in the
    __HIVE_DEFAULT_PARTITION__ null partition; replaying its batch must
    not re-append it (the partition prune and the anti-join must both
    be null-safe). Exercised with the byte gate both closed and open."""
    from sparkstreaming_gmall_demo_spark.streaming import sinks

    for gate_open in (False, True):
        if gate_open:
            monkeypatch.setattr(sinks, "PROBE_ISIN_MIN_SINK_BYTES", 0)
        out = str(tmp_path / f"sink_gate_{gate_open}")
        batch = spark.createDataFrame(
            [("k1", None, 1), ("k2", "2024-01-01", 2)],
            "mid string, d string, v int",
        )
        sinks.idempotent_append(batch, out, key_cols=["mid"], partition_cols=["d"])
        sinks.idempotent_append(batch, out, key_cols=["mid"], partition_cols=["d"])
        got = sorted(
            (r.mid, "" if r.d is None else str(r.d), r.v)
            for r in spark.read.parquet(out).collect()
        )
        assert got == [("k1", "", 1), ("k2", "2024-01-01", 2)], gate_open


def test_idempotent_append_null_key_replay(spark, tmp_path):
    """Null KEY components must also dedupe across replays: the
    anti-join compares null-safely, so `null != null` can't resurrect
    an already-written row."""
    from sparkstreaming_gmall_demo_spark.streaming import sinks

    out = str(tmp_path / "sink_null_key")
    batch = spark.createDataFrame(
        [(None, "2024-01-01", 7), ("k1", "2024-01-01", 1)],
        "mid string, d string, v int",
    )
    sinks.idempotent_append(batch, out, key_cols=["mid", "d"], partition_cols=["d"])
    sinks.idempotent_append(batch, out, key_cols=["mid", "d"], partition_cols=["d"])
    got = sorted(
        (r.mid or "", str(r.d), r.v) for r in spark.read.parquet(out).collect()
    )
    assert got == [("", "2024-01-01", 7), ("k1", "2024-01-01", 1)]


def test_sessionize_out_of_order_across_batches(spark, tmp_path):
    """A late-but-within-watermark event that arrives in a LATER batch
    must not rewind the open session's end: the next on-time event
    would then look out-of-gap and split a session the batch
    sessionizer keeps whole (round-1 advice)."""
    from sparkstreaming_gmall_demo_spark.streaming import stateful

    topic = tmp_path / "topic"
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def ev(mid, ts):
        return {"mid": mid, "uid": "u", "appid": "gmall", "area": "a", "os": "ios",
                "ch": "c", "type": "event", "evid": "view", "pgid": "p",
                "npgid": "n", "itemid": "i", "ts": ts}

    # gap 30s, watermark delay 10s. batch1: t=0, t=25s -> watermark
    # 15s. batch2: LATE t=20s (> watermark 15s so it is NOT dropped,
    # earlier than last=25s) — must NOT rewind last to 20s. batch3:
    # t=52s — within gap of the true last 25s (27s diff) but NOT of
    # the rewound 20s (32s diff): with the rewind bug this splits;
    # correct behavior keeps ONE session spanning 0..52s, 4 events.
    chunks = [
        [ev("m1", BASE), ev("m1", BASE + 25_000)],
        [ev("m1", BASE + 20_000)],
        [ev("m1", BASE + 52_000)],
        [ev("zz-sentinel", BASE + 3_600_000)],
        [ev("zz-sentinel2", BASE + 7_200_000)],
    ]

    def sink(batch_df, batch_id):
        if batch_df.count() > 0:
            batch_df.write.mode("append").parquet(out)

    for i, chunk in enumerate(chunks):
        write_chunk(topic, f"c{i}.jsonl", chunk)
        q = (
            stateful.sessionize(
                sources.parse_topic(
                    sources.file_topic_stream(spark, str(topic)), schemas.EVENT_LOG
                ).select("mid", "event_ts"),
                gap_seconds=30,
            )
            .writeStream.outputMode("append")
            .foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    rows = spark.read.parquet(out).filter(~F.col("mid").startswith("zz-")).collect()
    sessions = sorted(
        (r.mid, r.session_start.timestamp(), r.session_end.timestamp(), r.n_events)
        for r in rows
    )
    b = BASE / 1000
    assert sessions == [("m1", b, b + 52.0, 4)]


def test_sessionize_late_event_older_than_session_start(spark, tmp_path):
    """A late event older than (session_start - gap) can NEVER belong
    to the open session — `t - last <= gap` is trivially true for any
    past t, so without the backward-reach guard it would merge and
    stretch the session start back (round-2 advice). The batch
    sessionizer emits it as a separate earlier session; the stateful
    one must too."""
    from sparkstreaming_gmall_demo_spark.streaming import stateful

    topic = tmp_path / "topic"
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def ev(mid, ts):
        return {"mid": mid, "uid": "u", "appid": "gmall", "area": "a", "os": "ios",
                "ch": "c", "type": "event", "evid": "view", "pgid": "p",
                "npgid": "n", "itemid": "i", "ts": ts}

    # gap 30s, watermark 300s (late rows stay live). batch1 opens the
    # session at t=100s/110s. batch2 delivers t=10s and t=20s — both
    # older than start - gap = 70s: they must chain into their OWN
    # earlier session (10..20s, 2 events), not stretch the open one.
    # batch3 t=130s extends the open session (within gap of 110s).
    chunks = [
        [ev("m1", BASE + 100_000), ev("m1", BASE + 110_000)],
        [ev("m1", BASE + 10_000), ev("m1", BASE + 20_000)],
        [ev("m1", BASE + 130_000)],
        [ev("zz-sentinel", BASE + 3_600_000)],
        [ev("zz-sentinel2", BASE + 7_200_000)],
    ]

    def sink(batch_df, batch_id):
        if batch_df.count() > 0:
            batch_df.write.mode("append").parquet(out)

    for i, chunk in enumerate(chunks):
        write_chunk(topic, f"c{i}.jsonl", chunk)
        q = (
            stateful.sessionize(
                sources.parse_topic(
                    sources.file_topic_stream(spark, str(topic)), schemas.EVENT_LOG
                ).select("mid", "event_ts"),
                gap_seconds=30,
                watermark="300 seconds",
            )
            .writeStream.outputMode("append")
            .foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    rows = spark.read.parquet(out).filter(~F.col("mid").startswith("zz-")).collect()
    sessions = sorted(
        (r.mid, r.session_start.timestamp(), r.session_end.timestamp(), r.n_events)
        for r in rows
    )
    b = BASE / 1000
    assert sessions == [
        ("m1", b + 10.0, b + 20.0, 2),
        ("m1", b + 100.0, b + 130.0, 3),
    ]


# ---------------------------------------------------------------------------
# Streaming decontamination: stream-static gate ≡ batch operator
# ---------------------------------------------------------------------------
def test_decontamination_streaming_equals_batch(spark, sf_dir, tmp_path):
    """Documents replayed in 3 chunks through the stream-static gate
    produce exactly the batch flag_contaminated rows — per-doc metrics
    against a static dictionary need no cross-batch state, and a
    replayed chunk is a no-op through the keyed sink."""
    import pyarrow.parquet as pq

    from sparkstreaming_gmall_demo_spark.operators import decontam as dc
    from sparkstreaming_gmall_demo_spark.sources.fixtures import load_table

    docs = load_table(spark, sf_dir, "documents")
    eval_docs = docs.filter(F.col("doc_id") % 20 == 0)
    corpus = docs.filter(F.col("doc_id") % 20 != 0)

    # stage the corpus as 3 parquet chunk files
    topic = tmp_path / "docs_topic"
    topic.mkdir()
    table = pq.read_table(f"{sf_dir}/documents.parquet")
    n = table.num_rows
    step = (n + 2) // 3
    for i in range(3):
        pq.write_table(table.slice(i * step, step), str(topic / f"c{i}.parquet"))

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    for _ in range(2):  # second pass replays all files -> sink no-ops
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(topic))
            .filter(F.col("doc_id") % 20 != 0)
        )
        q = pipelines.decontamination_pipeline(
            stream, eval_docs, out, ckpt, trigger={"availableNow": True}
        )
        q.awaitTermination()

    got = {
        r.doc_id: (r.n_shingles, r.n_overlap, r.contaminated)
        for r in spark.read.parquet(out).collect()
    }
    want = {
        r.doc_id: (r.n_shingles, r.n_overlap, r.contaminated)
        for r in dc.flag_contaminated(corpus, eval_docs).collect()
    }
    assert got == want


def test_deterministic_sample_is_stream_batch_identical(spark, sf_dir, tmp_path):
    """Deterministic md5 sampling is a stateless pure-function filter,
    so it selects the EXACT same rows on a stream as on the batch —
    the property that makes train/eval membership stable when a corpus
    arrives incrementally (df.sample() cannot promise this across
    batch boundaries or reruns)."""
    import pyarrow.parquet as pq

    from sparkstreaming_gmall_demo_spark.operators import sampling as samp

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    want = {r.doc_id for r in samp.deterministic_sample(docs, "doc_id", 0.3).collect()}

    topic = tmp_path / "docs"
    topic.mkdir()
    table = pq.read_table(f"{sf_dir}/documents.parquet")
    step = (table.num_rows + 2) // 3
    for i in range(3):
        pq.write_table(table.slice(i * step, step), str(topic / f"c{i}.parquet"))

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    stream = (
        spark.readStream.schema(
            "doc_id long, text string, lang string, source string, n_chars long"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(topic))
    )
    sampled = samp.deterministic_sample(stream, "doc_id", 0.3).select("doc_id")
    q = (
        sampled.writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert got == want


# ---------------------------------------------------------------------------
# Streaming DSIR gate: stream-static importance scoring ≡ batch
# ---------------------------------------------------------------------------
def test_dsir_gate_streaming_equals_batch_and_replays_noop(spark, sf_dir, tmp_path):
    """Documents replayed in 3 chunks through the stream-static DSIR
    gate produce exactly the batch dsir_scores rows (plus the
    threshold flag) — per-doc scoring against a frozen weight table
    needs no cross-batch state, and a second full replay is a no-op
    through the keyed sink."""
    import pyarrow.parquet as pq

    from sparkstreaming_gmall_demo_spark.operators import importance as imp_ops
    from sparkstreaming_gmall_demo_spark.sources.fixtures import load_table

    docs = load_table(spark, sf_dir, "documents")
    target = docs.filter(F.col("source") == "src0")
    pool = docs.filter(F.col("source") != "src0")
    # freeze the weights once, offline — the gate never retrains
    weights = imp_ops.dsir_weights(target, pool).cache()
    batch_scores = {
        r.doc_id: r.score_micro
        for r in imp_ops.dsir_scores(pool, weights).collect()
    }
    threshold = sorted(batch_scores.values())[len(batch_scores) // 2]

    topic = tmp_path / "docs_topic"
    topic.mkdir()
    table = pq.read_table(f"{sf_dir}/documents.parquet")
    step = (table.num_rows + 2) // 3
    for i in range(3):
        pq.write_table(table.slice(i * step, step), str(topic / f"c{i}.parquet"))

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    for _ in range(2):  # second pass replays all files -> sink no-ops
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(topic))
            .filter(F.col("source") != "src0")
        )
        q = pipelines.dsir_gate_pipeline(
            stream, weights, out, ckpt, threshold_micro=threshold,
            trigger={"availableNow": True},
        )
        q.awaitTermination()

    got = {
        r.doc_id: (r.score_micro, r.admitted)
        for r in spark.read.parquet(out).collect()
    }
    want = {
        d: (s, int(s >= threshold)) for d, s in batch_scores.items()
    }
    assert got == want
    weights.unpersist()


def test_divergence_monitor_streaming_equals_batch_and_replays_noop(
    spark, sf_dir, tmp_path
):
    """Documents replayed in 3 chunks through the stream-static
    divergence monitor produce, per batch and source, exactly the
    batch reference_divergence rows against the frozen reference —
    and a second full replay is a no-op through the (batch_id,
    source)-keyed transactional merge."""
    import pyarrow.parquet as pq

    from sparkstreaming_gmall_demo_spark.operators import vocab as vocab_ops
    from sparkstreaming_gmall_demo_spark.sources.fixtures import load_table

    docs = load_table(spark, sf_dir, "documents")
    # freeze the reference once, offline, on the full corpus snapshot
    ref = vocab_ops.vocab_distribution(vocab_ops.vocab_build(docs, 64)).cache()

    topic = tmp_path / "docs_topic"
    topic.mkdir()
    table = pq.read_table(f"{sf_dir}/documents.parquet")
    step = (table.num_rows + 2) // 3
    chunks = []
    for i in range(3):
        sl = table.slice(i * step, step)
        p = topic / f"c{i}.parquet"
        pq.write_table(sl, str(p))
        # strictly increasing mtimes: the file source orders batches by
        # modification time, and same-tick writes race the chunk order
        # (observed as a full-suite-load flake: batch_id<->chunk
        # mapping shifted) — the _stage_topic discipline
        import os as _os
        import time as _time

        now = _time.time()
        _os.utime(p, (now - 10 + i, now - 10 + i))
        chunks.append(sl)

    counts_table = str(tmp_path / "jsd_counts")
    ckpt = str(tmp_path / "ckpt")
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    for _ in range(2):  # second pass replays all files -> merge no-ops
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(topic))
        )
        q = pipelines.divergence_monitor_pipeline(
            stream, ref, counts_table, ckpt, trigger={"availableNow": True}
        )
        q.awaitTermination()

    from sparkstreaming_gmall_demo_spark.streaming import txn

    got = {
        (r.batch_id, r.source): (r.n_tokens, r.jsd4)
        for r in txn.snapshot(spark, counts_table).collect()
    }
    want = {}
    for bid, sl in enumerate(chunks):
        chunk_df = spark.createDataFrame(sl.to_pandas())
        for r in vocab_ops.reference_divergence(chunk_df, ref).collect():
            want[(bid, r.source)] = (r.n_tokens, r.jsd4)
    assert got == want
    assert len({b for b, _ in got}) == 3
    ref.unpersist()
