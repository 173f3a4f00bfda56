"""Streaming throughput bench (supplementary to bench.py): end-to-end
rows/s through the DAU and alert pipelines, fixture events replayed as
a file-source stream with full checkpointing, RocksDB state, and the
idempotent sinks engaged.

The fixture is staged as N_CHUNKS time-ordered files and the source
capped at one file per trigger, so the replay runs as N real
micro-batches: watermark advance, state-store read/update/eviction,
and the sink's replay-guard probe are all paid per batch (a
single-batch replay is overhead-dominated and hides them —
SURVEY §8.3).

Prints ONE JSON line:
  {"metric": "streaming_rows_per_sec", "value": <min over pipelines>,
   "pipelines": {...}, "rows": N, "batches": N_CHUNKS, "sf": ...}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from sparkstreaming_gmall_demo_spark.session import get_spark
from sparkstreaming_gmall_demo_spark.streaming import pipelines

EVENTS_RAW = (
    "event_id long, ts long, user_id long, event_type string, "
    "value double, props string"
)
N_CHUNKS = 8


def stage_chunks(input_dir: str, fixture: str, n: int) -> int:
    """Split the events fixture into ``n`` time-ordered parquet files.

    Chronological chunks make each micro-batch advance the watermark
    past the previous one — the realistic regime where windows close
    and dedup state is evicted every batch. Files get strictly
    increasing mtimes so the file source picks them up in time order.
    """
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    table = pq.read_table(fixture)
    table = table.take(pc.sort_indices(table, sort_keys=[("ts", "ascending")]))
    rows = table.num_rows
    step = (rows + n - 1) // n
    for i in range(n):
        chunk = table.slice(i * step, step)
        p = os.path.join(input_dir, f"chunk_{i:02d}.parquet")
        pq.write_table(chunk, p)
        os.utime(p, (time.time() + i, time.time() + i))
    return rows


def event_stream(spark, input_dir: str):
    # file streaming sources take a directory; main() stages the
    # fixture file into one chunk file per micro-batch
    raw = (
        spark.readStream.schema(EVENTS_RAW)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )
    return raw.select(
        F.col("user_id").cast("string").alias("mid"),
        F.col("user_id").cast("string").alias("uid"),
        F.col("event_type").alias("evid"),
        F.col("event_type").alias("itemid"),
        F.expr("timestamp_micros(ts DIV 1000)").alias("event_ts"),
    )


def run(name: str, make_query, n_rows: int, work: str) -> float:
    t0 = time.perf_counter()
    q = make_query(
        os.path.join(work, name, "out"), os.path.join(work, name, "ckpt")
    )
    q.awaitTermination()
    return round(n_rows / (time.perf_counter() - t0), 1)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("gmall-streaming-bench")
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(prefix="gmall_stream_bench_")
    try:
        input_dir = os.path.join(work, "input")
        os.makedirs(input_dir)
        n_rows = stage_chunks(
            input_dir, f"{sf_dir.rstrip('/')}/events.parquet", N_CHUNKS
        )
        rates = {
            "dau": run(
                "dau",
                lambda out, ckpt: pipelines.dau_pipeline(
                    event_stream(spark, input_dir), out, ckpt,
                    trigger={"availableNow": True},
                ),
                n_rows, work,
            ),
            "alert": run(
                "alert",
                lambda out, ckpt: pipelines.alert_pipeline(
                    event_stream(spark, input_dir), out, ckpt,
                    trigger={"availableNow": True},
                ),
                n_rows, work,
            ),
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)

    print(
        json.dumps(
            {
                "metric": "streaming_rows_per_sec",
                "value": min(rates.values()),
                "unit": "rows/sec",
                "pipelines": rates,
                "rows": n_rows,
                "batches": N_CHUNKS,
                "sf": float(sf) if sf.replace(".", "", 1).isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
