"""End-to-end integration: fixture events -> streaming DAU pipeline ->
serving endpoint, cross-checked against the declared batch semantics
(Q1/Q2) on the same data.

This closes the loop the reference never tests: its DauApp -> Phoenix
-> publisher chain has no assertion anywhere that the served numbers
equal the stream input's true distinct-device counts.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from sparkstreaming_gmall_demo_spark import functions as gfn
from sparkstreaming_gmall_demo_spark import serving
from sparkstreaming_gmall_demo_spark.schemas import STARTUP_LOG
from sparkstreaming_gmall_demo_spark.sources.fixtures import load_table
from sparkstreaming_gmall_demo_spark.streaming import pipelines, sources

DATE = "2024-01-05"


def test_fixture_events_through_dau_pipeline_to_serving(spark, sf_dir, tmp_path):
    topic = tmp_path / "topic"
    topic.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # fixture events become startup-log records (mid = device = user_id
    # here), replayed in three chronological chunks
    events = (
        load_table(spark, sf_dir, "events")
        .select(
            F.col("user_id").cast("string").alias("mid"),
            gfn.epoch_millis("ts").alias("ts"),
        )
        .orderBy("ts")
        .collect()
    )
    n = len(events)
    assert n > 0
    chunk_bounds = [(0, n // 3), (n // 3, 2 * n // 3), (2 * n // 3, n)]
    for i, (lo, hi) in enumerate(chunk_bounds):
        recs = [
            {"mid": r.mid, "uid": r.mid, "appid": "gmall", "area": "a",
             "os": "ios", "ch": "c", "type": "startup", "vs": "1", "ts": r.ts}
            for r in events[lo:hi]
        ]
        (topic / f"c{i}.jsonl").write_text(
            "\n".join(json.dumps(x) for x in recs) + "\n"
        )
        q = pipelines.dau_pipeline(
            sources.parse_topic(
                sources.file_topic_stream(spark, str(topic)), STARTUP_LOG
            ),
            out, ckpt, trigger={"availableNow": True},
        )
        q.awaitTermination()

    dau_table = spark.read.parquet(out)
    empty_orders = spark.createDataFrame(
        [], "id string, create_date date, create_hour int, total_amount decimal(18,2)"
    )

    # endpoint total == Q1 semantics (count distinct device for the day)
    got_total = serving.realtime_total(dau_table, empty_orders, DATE)[0]["value"]
    want_total = (
        load_table(spark, sf_dir, "events")
        .filter(F.to_date("ts") == DATE)
        .select("user_id")
        .distinct()
        .count()
    )
    assert got_total == want_total

    # endpoint hours == Q2 semantics (device counted in its first hour)
    got_hours = serving.realtime_hours(dau_table, empty_orders, "dau", DATE)["today"]
    want_hours_rows = (
        load_table(spark, sf_dir, "events")
        .filter(F.to_date("ts") == DATE)
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_ts"))
        .groupBy(F.hour("first_ts").alias("h"))
        .count()
        .collect()
    )
    want_hours = {f"{r.h:02d}": r["count"] for r in want_hours_rows}
    assert got_hours == want_hours


def test_sessionizer_family_agrees_on_fixture(spark, sf_dir):
    """The engine ships three gap sessionizers (manual lag+cumsum,
    native session_window, streaming session_pipeline). On real fixture
    timestamps (nanosecond-random — no exact-gap silences, where the
    two boundary conventions legitimately differ) the batch pair must
    produce identical per-user session multisets."""
    from sparkstreaming_gmall_demo_spark.operators.sessions import session_stats
    from sparkstreaming_gmall_demo_spark.sources.fixtures import load_table

    events = load_table(spark, sf_dir, "events")
    gap = 1800
    manual = {
        (r.user_id, str(r.session_start), str(r.session_end), r.n_events)
        for r in session_stats(
            events, key="user_id", ts_col="ts",
            gap_seconds=gap, tiebreak="event_id",
        ).collect()
    }
    native = {
        (r.user_id, str(r.session_start), str(r.session_end), r.n_events)
        for r in events.groupBy(
            F.session_window("ts", f"{gap} seconds").alias("w"), "user_id"
        )
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
        )
        .select("user_id", "session_start", "session_end", "n_events")
        .collect()
    }
    assert manual == native and len(manual) > 0
