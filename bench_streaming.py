"""Streaming throughput bench (supplementary to bench.py): end-to-end
rows/s through the DAU, alert, and sale_detail pipelines — fixtures
replayed as file-source streams with full checkpointing, RocksDB
state, and the idempotent sinks engaged. sale_detail is the
state-heaviest path: a watermarked stream-stream full outer join over
two correlated topics staged from orders/lineitem, plus a broadcast
dim join against a customer-derived user table.

The fixture is staged as N_CHUNKS time-ordered files and the source
capped at one file per trigger, so the replay runs as N real
micro-batches: watermark advance, state-store read/update/eviction,
and the sink's replay-guard probe are all paid per batch (a
single-batch replay is overhead-dominated and hides them —
SURVEY §8.3).

Prints ONE JSON line:
  {"metric": "streaming_rows_per_sec", "value": <min over pipelines>,
   "pipelines": {...}, "rows": N, "batches": N_CHUNKS, "sf": ...}

Self-adjudication (VERDICT r11 item 5): the headline pipelines run
$SPARK_GRAFT_STREAM_REPS (default 2) full replays each, INTERLEAVED
round-robin across pipelines — rep 0 of every pipeline, then rep 1 —
exactly the discipline bench.py applies across queries. A transient
box-load window therefore inflates at most one rep of each pipeline
instead of every rep of one, the reported rate is the best rep, and
``spread_best_over_worst`` records best/worst per pipeline so a noisy
session is distinguishable from a pipeline regression on the
artifact's face (r11's 20-40% uniform VM drag needed manual A/Bs).
Each rep replays into fresh out/ckpt/index dirs — state never carries
between reps, so reps are identical work by construction.

Overhead context (round 3): with the sink's batch-id high-water-mark
engaged (sinks.idempotent_append), gmv measures ~2.9k orders/s vs a
~3.0k rows/s passthrough floor (a bare foreachBatch parquet append
over the same 8 batches) — the replay-guard probe no longer
contributes measurably; what remains is file-source listing,
micro-batch planning, and the partitioned parquet commit itself.
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

# ts matches the fixture's parquet encoding (timestamp[us], no tz →
# TIMESTAMP_NTZ). Forcing `ts long` here would silently read the raw
# micros and shift every event day to 1970 after the old nanos DIV.
EVENTS_RAW = (
    "event_id long, ts timestamp_ntz, user_id long, event_type string, "
    "value double, props string"
)
N_CHUNKS = 8


def write_chunked(table, input_dir: str, n: int) -> int:
    """Write an already-time-ordered arrow table as ``n`` chunk files.

    Chronological chunks make each micro-batch advance the watermark
    past the previous one — the realistic regime where windows close
    and dedup/join state is evicted every batch. Files get strictly
    increasing mtimes so the file source picks them up in time order.
    """
    import pyarrow.parquet as pq

    os.makedirs(input_dir, exist_ok=True)
    rows = table.num_rows
    step = (rows + n - 1) // n
    for i in range(n):
        chunk = table.slice(i * step, step)
        p = os.path.join(input_dir, f"chunk_{i:02d}.parquet")
        pq.write_table(chunk, p)
        os.utime(p, (time.time() + i, time.time() + i))
    return rows


def stage_chunks(input_dir: str, fixture: str, n: int, sort_key: str = "ts") -> int:
    """Split a fixture into ``n`` parquet files ordered by ``sort_key``
    (event time for streams with watermarks; any stable key, e.g.
    doc_id, for stateless-gate topics)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    table = pq.read_table(fixture)
    table = table.take(
        pc.sort_indices(table, sort_keys=[(sort_key, "ascending")])
    )
    return write_chunked(table, input_dir, n)


# -- sale_detail staging: the stream-stream join needs two correlated
# topics. Orders come from the orders fixture; details from lineitem
# joined back to orders for the event time, so each detail lands in
# the same micro-batch window as its order (the reference's in-order
# case; the TTL/late path is covered functionally in tests).
SALE_CUTOFF = "1996-01-01"  # ~1/6 of the fixture: keeps the bench minutes-scale

ORDER_SCHEMA = (
    "id string, user_id string, total_amount double, create_time string, "
    "event_ts timestamp"
)
DETAIL_SCHEMA = (
    "id string, order_id string, sku_id string, sku_name string, "
    "order_price double, sku_num long, event_ts timestamp"
)
DOC_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def stage_sale_detail(work: str, sf_dir: str, n: int) -> tuple[str, str, str, int]:
    import duckdb
    import pyarrow.parquet as pq

    con = duckdb.connect()
    for t in ("orders", "lineitem", "customer"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir.rstrip('/')}/{t}.parquet')"
        )
    o = con.execute(f"""
        SELECT CAST(o_orderkey AS VARCHAR) AS id,
               CAST(o_custkey AS VARCHAR) AS user_id,
               o_totalprice AS total_amount,
               strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS create_time,
               CAST(o_orderdate AS TIMESTAMP) AS event_ts
        FROM orders WHERE o_orderdate < TIMESTAMP '{SALE_CUTOFF}'
        ORDER BY event_ts, id""").fetch_arrow_table()
    d = con.execute(f"""
        SELECT CAST(l_orderkey AS VARCHAR) || '-' ||
                   CAST(l_linenumber AS VARCHAR) AS id,
               CAST(l_orderkey AS VARCHAR) AS order_id,
               CAST(l_partkey AS VARCHAR) AS sku_id,
               'sku-' || CAST(l_partkey AS VARCHAR) AS sku_name,
               l_extendedprice AS order_price,
               CAST(l_quantity AS BIGINT) AS sku_num,
               CAST(o_orderdate AS TIMESTAMP) AS event_ts
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderdate < TIMESTAMP '{SALE_CUTOFF}'
        ORDER BY event_ts, order_id, id""").fetch_arrow_table()
    dim = con.execute("""
        SELECT CAST(c_custkey AS VARCHAR) AS id,
               CASE WHEN c_custkey % 2 = 0 THEN 'F' ELSE 'M' END AS gender,
               CAST(c_nationkey AS VARCHAR) AS user_level,
               '1985-03-20' AS birthday
        FROM customer""").fetch_arrow_table()
    o_dir = os.path.join(work, "sale_o")
    d_dir = os.path.join(work, "sale_d")
    dim_dir = os.path.join(work, "sale_dim")
    os.makedirs(dim_dir)
    pq.write_table(dim, os.path.join(dim_dir, "dim.parquet"))
    o_rows = write_chunked(o, o_dir, n)
    d_rows = write_chunked(d, d_dir, n)
    return o_dir, d_dir, dim_dir, o_rows, d_rows


def parquet_stream(spark, input_dir: str, schema: str):
    # file streaming sources take a directory; main() stages the
    # fixture into one chunk file per micro-batch
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )


def event_stream(spark, input_dir: str):
    raw = parquet_stream(spark, input_dir, EVENTS_RAW)
    return raw.select(
        F.col("user_id").cast("string").alias("mid"),
        F.col("user_id").cast("string").alias("uid"),
        F.col("event_type").alias("evid"),
        F.col("event_type").alias("itemid"),
        F.col("ts").cast("timestamp").alias("event_ts"),
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
        o_dir, d_dir, dim_dir, o_rows, d_rows = stage_sale_detail(
            work, sf_dir, N_CHUNKS
        )
        sale_rows = o_rows + d_rows
        doc_dir = os.path.join(work, "docs_input")
        os.makedirs(doc_dir)
        doc_rows = stage_chunks(
            doc_dir, f"{sf_dir.rstrip('/')}/documents.parquet", N_CHUNKS,
            sort_key="doc_id",
        )
        # (name, row count, maker(tag) -> make_query(out, ckpt)); tag
        # keys per-rep index dirs so no state carries between reps
        headline = [
            ("dau", n_rows, lambda tag: lambda out, ckpt:
                pipelines.dau_pipeline(
                    event_stream(spark, input_dir), out, ckpt,
                    trigger={"availableNow": True},
                )),
            ("alert", n_rows, lambda tag: lambda out, ckpt:
                pipelines.alert_pipeline(
                    event_stream(spark, input_dir), out, ckpt,
                    trigger={"availableNow": True},
                )),
            # continuous rolling-distinct maintenance: per-batch HLL
            # day-partials committed to a txn table (immutable
            # partials, no streaming state — same regime as the CM
            # sketch pipeline); measures the per-batch sketch-agg +
            # link-CAS commit cost over the full event topic
            ("hll_partials", n_rows, lambda tag: lambda out, ckpt:
                pipelines.hll_pipeline(
                    parquet_stream(spark, input_dir, EVENTS_RAW),
                    out, ckpt, trigger={"availableNow": True},
                )),
            # stateless ingest with the partitioned keyed replay guard
            # (the Phoenix-upsert path) over the same order topic
            ("gmv", o_rows, lambda tag: lambda out, ckpt:
                pipelines.gmv_pipeline(
                    parquet_stream(spark, o_dir, ORDER_SCHEMA),
                    out, ckpt, trigger={"availableNow": True},
                )),
            # incremental-ingest dedup gate: per-batch txn-index probe
            # + insert-only index commit (docs fixture is small, so
            # this measures the per-batch fixed cost of the index loop
            # — snapshot read, anti-join, link-CAS commit — not
            # per-row throughput; same overhead-bound regime as gmv)
            ("novelty_gate", doc_rows, lambda tag: lambda out, ckpt:
                pipelines.novelty_gate_pipeline(
                    parquet_stream(spark, doc_dir, DOC_SCHEMA),
                    os.path.join(work, f"novelty_gate_{tag}", "fp_index"),
                    out, ckpt, trigger={"availableNow": True},
                )),
            # near-dup ingest gate: per-batch MinHash signature pass +
            # band-index probe + two index commits (docs fixture is
            # small -> measures the per-batch fixed cost of the fuzzy
            # gate loop, same overhead-bound regime as novelty_gate)
            ("neardup_gate", doc_rows, lambda tag: lambda out, ckpt:
                pipelines.neardup_gate_pipeline(
                    parquet_stream(spark, doc_dir, DOC_SCHEMA),
                    os.path.join(work, f"neardup_gate_{tag}", "nd_index"),
                    out, ckpt, trigger={"availableNow": True},
                )),
            # continuous boilerplate-dictionary maintenance: per-batch
            # (gram, df) partials into a txn table (same immutable-
            # partials regime as hll/cm); docs fixture is small, so
            # this measures the per-batch ngram-agg + commit fixed
            # cost, not per-row throughput
            ("boilerplate_dict", doc_rows, lambda tag: lambda out, ckpt:
                pipelines.boilerplate_pipeline(
                    parquet_stream(spark, doc_dir, DOC_SCHEMA),
                    out, ckpt, trigger={"availableNow": True},
                )),
            # continuous quality gating: per-batch Gopher-rules +
            # hashed-classifier scoring (both narrow maps) + doc-keyed
            # idempotent append + (batch_id, rule)-keyed counts commit
            # (docs fixture is small -> per-batch fixed cost regime)
            ("quality_gate", doc_rows, lambda tag: lambda out, ckpt:
                pipelines.quality_gate_pipeline(
                    parquet_stream(spark, doc_dir, DOC_SCHEMA),
                    out,
                    os.path.join(work, f"quality_gate_{tag}", "counts"),
                    ckpt, trigger={"availableNow": True},
                )),
            # partial-overlap ingest gate: per-batch winnowing
            # fingerprint pass (document-local array arithmetic) +
            # (doc_id, fp) index probe + single index commit (docs
            # fixture is small -> per-batch fixed cost regime)
            ("overlap_gate", doc_rows, lambda tag: lambda out, ckpt:
                pipelines.overlap_gate_pipeline(
                    parquet_stream(spark, doc_dir, DOC_SCHEMA),
                    os.path.join(work, f"overlap_gate_{tag}", "fp_index"),
                    out, ckpt, trigger={"availableNow": True},
                )),
            # the state-heaviest pipeline: stream-stream full outer join
            # + broadcast dim enrichment + unpartitioned replay guard
            ("sale_detail", sale_rows, lambda tag: lambda out, ckpt:
                pipelines.sale_detail_pipeline(
                    spark,
                    parquet_stream(spark, o_dir, ORDER_SCHEMA),
                    parquet_stream(spark, d_dir, DETAIL_SCHEMA),
                    os.path.join(dim_dir, "dim.parquet"),
                    out, ckpt, trigger={"availableNow": True},
                )),
        ]
        # interleaved reps: rep 0 of every pipeline, then rep 1, ...
        # best rate reported; best/worst spread recorded per pipeline
        n_reps = max(1, int(os.environ.get("SPARK_GRAFT_STREAM_REPS", "2")))
        rates: dict[str, float] = {}
        worst: dict[str, float] = {}
        for rep in range(n_reps):
            for name, rows, maker in headline:
                tag = f"r{rep}"
                rate = run(f"{name}_{tag}", maker(tag), rows, work)
                rates[name] = max(rates.get(name, 0.0), rate)
                worst[name] = min(worst.get(name, float("inf")), rate)
        spreads = {
            n: round(rates[n] / max(worst[n], 1e-9), 2) for n in rates
        }
        # r9 commit-consolidation ablation: the three index gates in
        # BOTH commit modes, interleaved merge/probe-free x2 in one
        # process with best-of-2 per mode — between-round machine
        # drift (±20% observed) and in-process warm-up order bias
        # (whichever mode runs first measures cold) would otherwise
        # swamp the within-gate delta this round claims
        run_ablations = os.environ.get("SPARK_GRAFT_STREAM_ABLATIONS", "1") != "0"
        gate_makers = {} if not run_ablations else {
            "novelty_gate": lambda out, ckpt, tag:
                pipelines.novelty_gate_pipeline(
                    parquet_stream(spark, doc_dir, DOC_SCHEMA),
                    os.path.join(work, f"novelty_gate_{tag}", "fp_index"),
                    out, ckpt, trigger={"availableNow": True},
                ),
            "neardup_gate": lambda out, ckpt, tag:
                pipelines.neardup_gate_pipeline(
                    parquet_stream(spark, doc_dir, DOC_SCHEMA),
                    os.path.join(work, f"neardup_gate_{tag}", "nd_index"),
                    out, ckpt, trigger={"availableNow": True},
                ),
            "overlap_gate": lambda out, ckpt, tag:
                pipelines.overlap_gate_pipeline(
                    parquet_stream(spark, doc_dir, DOC_SCHEMA),
                    os.path.join(work, f"overlap_gate_{tag}", "fp_index"),
                    out, ckpt, trigger={"availableNow": True},
                ),
        }
        gate_commit_ablation = {}
        for name, mk in gate_makers.items():
            best = {"merge_keyed": 0.0, "probe_free": 0.0}
            for rep in range(2):
                for mode in ("merge_keyed", "probe_free"):
                    pipelines.GATE_PROBE_FREE_INSERTS = mode == "probe_free"
                    try:
                        rate = run(
                            f"{name}_{mode}_{rep}",
                            lambda out, ckpt: mk(
                                out, ckpt, f"{mode}_{rep}"
                            ),
                            doc_rows, work,
                        )
                    finally:
                        pipelines.GATE_PROBE_FREE_INSERTS = True
                    best[mode] = max(best[mode], rate)
            gate_commit_ablation[name] = {
                "probe_free": best["probe_free"],
                "merge_keyed": best["merge_keyed"],
                "ratio": round(best["probe_free"] / best["merge_keyed"], 3),
            }
        # r10 fixed-cost decomposition (VERDICT r9 item 5): gmv has sat
        # at 2.2-2.6k rows/s for six rounds against a ~3.0k bare-append
        # ceiling. Decompose the gap over the SAME staged topic: bare
        # append (the engine floor: source listing, micro-batch
        # planning, offset+commit log), + date-partitioned write
        # (dynamic-partition commit), + within-batch dropDuplicates
        # (the one shuffle), then the full pipeline (+ replay guard
        # hwm read/claim). Interleaved best-of-2 per variant, like the
        # commit ablation above, so warm-up order and box drift don't
        # masquerade as a delta.
        def _gmv_variant(kind, tag):
            def make(out, ckpt):
                src = parquet_stream(spark, o_dir, ORDER_SCHEMA)
                if kind == "full":
                    return pipelines.gmv_pipeline(
                        src, out, ckpt, trigger={"availableNow": True}
                    )
                derived = src.withColumn(
                    "create_date", F.to_date("create_time")
                ).withColumn("create_hour", F.hour("create_time"))
                if kind == "bare":
                    def sink(b, i):
                        b.write.mode("append").parquet(out)
                    stream = src
                elif kind == "partitioned":
                    def sink(b, i):
                        b.write.mode("append").partitionBy(
                            "create_date"
                        ).parquet(out)
                    stream = derived
                else:  # dedup_partitioned
                    def sink(b, i):
                        b.dropDuplicates(["id"]).write.mode(
                            "append"
                        ).partitionBy("create_date").parquet(out)
                    stream = derived
                return pipelines._start(
                    stream.writeStream.foreachBatch(sink), ckpt,
                    {"availableNow": True},
                )
            return make
        gmv_ablation = {}
        if run_ablations:
            for kind in ("bare", "partitioned", "dedup_partitioned", "full"):
                gmv_ablation[kind] = 0.0
        for rep in range(2):
            for kind in gmv_ablation:
                rate = run(
                    f"gmv_abl_{kind}_{rep}",
                    _gmv_variant(kind, f"{kind}_{rep}"),
                    o_rows, work,
                )
                gmv_ablation[kind] = max(gmv_ablation[kind], rate)
    finally:
        shutil.rmtree(work, ignore_errors=True)

    print(
        json.dumps(
            {
                "metric": "streaming_rows_per_sec",
                "gate_commit_ablation": gate_commit_ablation,
                "gmv_fixed_cost_ablation": gmv_ablation,
                # headline = min over the REFERENCE pipelines; the
                # novelty gate and boilerplate dict run on the (tiny)
                # documents fixture and measure per-batch fixed cost
                # (index loop / gram-agg commit), not rows/s
                "value": min(
                    v for k, v in rates.items()
                    if k not in ("novelty_gate", "boilerplate_dict",
                                 "neardup_gate", "quality_gate",
                                 "overlap_gate")
                ),
                "unit": "rows/sec",
                "pipelines": rates,
                "reps": n_reps,
                "spread_best_over_worst": spreads,
                "rows": {"events": n_rows, "orders": o_rows,
                         "sale_detail": sale_rows, "documents": doc_rows},
                "batches": N_CHUNKS,
                "sf": float(sf) if sf.replace(".", "", 1).isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
