"""Idempotent foreachBatch sinks.

The reference reaches idempotency three different ways: Phoenix UPSERT
on the primary key (reference app/DauApp.scala:56-63,
app/GmvApp.scala:40-50), ES doc-id upsert (reference
utils/MyEsUtil.scala:50-79, id calc app/AlertApp.scala:74), and Redis
last-write-wins SET (reference app/UserInfoApp.scala:29-41). All three
collapse to two batch primitives over parquet serving tables:

- ``idempotent_append``: dedup-on-key within the batch, anti-join
  against keys already in the sink, append. Replaying a batch (restart
  without checkpoint, at-least-once upstream) inserts nothing new —
  the same guarantee as a PK upsert for insert-only streams.
- ``merge_last_write_wins``: key-versioned overwrite for mutable
  dimension tables (CDC INSERT ∪ UPDATE).

Scale: the anti-join prunes to the key columns of the partitions the
batch touches (partition filter pushed into the scan when
``partition_cols`` are date-like); nothing collects to the driver. On
a real deployment these would be Delta/Iceberg MERGE INTO — same
semantics, transactional file swap.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _target_exists(path: str) -> bool:
    # works for local paths (this container); a cluster deployment
    # would go through the Hadoop FileSystem API / a catalog lookup
    return os.path.exists(path) and any(
        not n.startswith((".", "_")) for n in os.listdir(path)
    )


PROBE_ISIN_MAX_KEYS = 4096
PROBE_ISIN_MIN_SINK_BYTES = 64 << 20  # engage only when the probe scan is
# big enough that skipping it beats the extra collect-keys job


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith((".", "_")):
                try:
                    total += os.path.getsize(os.path.join(root, f))
                except OSError:
                    pass
    return total


def _hwm_path(guard_dir: str) -> str:
    return os.path.join(guard_dir, "batch_hwm")


def _read_hwm(guard_dir: str) -> int:
    try:
        with open(_hwm_path(guard_dir)) as f:
            return int(f.read().strip())
    except (OSError, ValueError):
        return -1


def _claim_batch(guard_dir: str, batch_id: int) -> None:
    """Record ``batch_id`` as attempted BEFORE any data is written —
    the ordering that makes the skip safe: a crash mid-append replays
    with batch_id <= hwm and takes the full probe path. (Marker-after-
    write would be wrong: crash between append and marker would replay
    as never-seen and double-append.) Atomic via temp + rename."""
    os.makedirs(guard_dir, exist_ok=True)
    tmp = _hwm_path(guard_dir) + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        f.write(str(batch_id))
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, _hwm_path(guard_dir))


def idempotent_append(
    batch_df: DataFrame,
    out_path: str,
    key_cols: list,
    partition_cols: list | None = None,
    batch_id: int | None = None,
    guard_dir: str | None = None,
) -> None:
    """Append ``batch_df`` keeping exactly one row per key ever written.

    Within-batch duplicates: first row per key by the batch's own order
    (callers pre-sort when "first" must mean min event time —
    reference handler/DauHandler.scala:17-22 sorts by ts and takes 1).
    Cross-batch/replay duplicates: left-anti join against keys already
    in the sink, restricted to the partitions this batch touches.

    Batch-id high-water-mark (pass ``batch_id``): the replay-guard
    probe only matters for batch ids that may have touched the sink
    before. Structured Streaming batch ids are monotonic per
    checkpoint, so a batch_id above the recorded high-water-mark has
    never been attempted — the probe (prune collect + sink scan +
    anti-join) is skipped entirely, removing most of the fixed
    per-batch cost that dominates small batches (BASELINE §C). Safety
    hinges on two placements: the mark is claimed BEFORE the write
    (see _claim_batch), so a crash mid-append replays with
    batch_id <= hwm and probes; and the mark lives INSIDE the sink
    (``out_path/_replay_guard`` unless ``guard_dir`` overrides), so it
    shares the SINK's lifecycle — wipe the checkpoint and restarted
    ids 0..hwm all probe (conservative), wipe the sink and the mark
    dies with the data it describes. Assumes a single writing stream
    per sink, and that a key never legitimately recurs at NEW offsets
    (duplicate records in the topic itself, e.g. producer retries,
    are only caught while their batch id is <= hwm — callers needing
    in-topic cross-batch key dedup should not pass ``batch_id``).

    Small-batch-vs-big-sink fast path: when the (pruned) sink side is
    large (> PROBE_ISIN_MIN_SINK_BYTES) and the batch's key set small
    (<= PROBE_ISIN_MAX_KEYS), the batch keys are pushed into the probe
    scan as an IN filter — parquet dictionary/row-group skipping then
    reads only sink rows that could possibly collide, instead of every
    key ever written. Both guards matter: collecting keys is an extra
    job per batch, and a small sink's full probe scan is cheaper than
    that job (measured: engaging it unconditionally cost ~25%
    throughput on the 8-batch replay bench, whose sink never exceeds a
    few MB). On a cluster the size check would be a catalog statistic;
    here it is a directory walk.
    """
    spark = batch_df.sparkSession
    batch = batch_df.dropDuplicates(key_cols)
    if batch_id is not None:
        if guard_dir is None:
            guard_dir = os.path.join(out_path, "_replay_guard")
        if batch_id > _read_hwm(guard_dir):
            _claim_batch(guard_dir, batch_id)
            writer = batch.write.mode("append")
            if partition_cols:
                writer = writer.partitionBy(*partition_cols)
            writer.parquet(out_path)
            return
    # the partitioned path runs TWO actions over the batch (the prune
    # collect, then the anti-join + write): persist so the source
    # re-read + dedup lineage is paid once per micro-batch, not twice —
    # part of the fixed per-batch cost that dominates small batches
    persisted = bool(partition_cols) and _target_exists(out_path)
    if persisted:
        batch = batch.persist()
    try:
        _idempotent_append_inner(spark, batch, out_path, key_cols, partition_cols)
    finally:
        if persisted:
            batch.unpersist()


def _idempotent_append_inner(
    spark,
    batch: DataFrame,
    out_path: str,
    key_cols: list,
    partition_cols: list | None,
) -> None:
    if _target_exists(out_path):
        # schema comes from the batch (what this pipeline writes IS the
        # sink schema): skips the per-batch footer-read inference job
        existing = spark.read.schema(batch.schema).parquet(out_path)
        probe_col = key_cols[0]
        key_rows, truncated = None, True
        if partition_cols:
            # the prune collect is mandatory; when the sink is big
            # enough that the keyed probe COULD engage, piggyback the
            # probe keys on the SAME job (a second distinct+collect
            # would double the per-batch driver overhead this path is
            # sensitive to). A small sink keeps the cheap
            # partitions-only distinct: no partition of it can clear
            # the byte gate, so collecting keys would be pure waste.
            if _dir_bytes(out_path) > PROBE_ISIN_MIN_SINK_BYTES:
                sel = list(partition_cols) + [probe_col]
                tuples = (
                    batch.select(*sel)
                    .distinct()
                    .limit(PROBE_ISIN_MAX_KEYS + 1)
                    .collect()  # collect-bound: limit(PROBE_ISIN_MAX_KEYS+1)
                )
                truncated = len(tuples) > PROBE_ISIN_MAX_KEYS
            else:
                tuples, truncated = [], True
            if truncated:  # small sink or jumbo batch: partitions only
                parts = [
                    tuple(r)
                    for r in batch.select(*partition_cols).distinct().collect()  # collect-bound: distinct partition keys of one micro-batch
                ]
            else:
                parts = sorted(
                    {tuple(r[c] for c in partition_cols) for r in tuples},
                    # None partition values are legal (null-partition
                    # rows); sort them first via a typed key — bare
                    # sorted() can't compare None with str
                    key=lambda p: tuple(
                        (v is not None, str(v)) for v in p
                    ),
                )
                key_rows = [r[probe_col] for r in tuples]
            probe_bytes = 0
            if parts:
                cond = None
                for p in parts:
                    c = None
                    for col, v in zip(partition_cols, p):
                        # eqNullSafe: a null partition value (e.g. a
                        # parseable record without create_time) lands in
                        # __HIVE_DEFAULT_PARTITION__ and reads back as
                        # null; `== lit(None)` is never true, which
                        # would hide those sink rows from the replay
                        # guard and re-append them on every replay
                        e = F.col(col).eqNullSafe(F.lit(v))
                        c = e if c is None else (c & e)
                    cond = c if cond is None else (cond | c)
                existing = existing.filter(cond)
                # size the gate on what the probe will actually scan:
                # only this batch's partitions (a missing/renamed dir
                # counts 0 -> gate stays closed -> plain anti-join)
                probe_bytes = sum(
                    _dir_bytes(
                        os.path.join(
                            out_path,
                            *[
                                f"{c}={'__HIVE_DEFAULT_PARTITION__' if v is None else v}"
                                for c, v in zip(partition_cols, p)
                            ],
                        )
                    )
                    for p in parts
                )
        else:
            # unpartitioned: no prune collect exists to piggyback on,
            # so only pay the key-collect job once the sink is big
            # enough for the keyed probe to matter
            probe_bytes = _dir_bytes(out_path)
            if probe_bytes > PROBE_ISIN_MIN_SINK_BYTES:
                key_rows = [
                    r[0]
                    for r in batch.select(probe_col)
                    .distinct()
                    .limit(PROBE_ISIN_MAX_KEYS + 1)
                    .collect()  # collect-bound: limit(PROBE_ISIN_MAX_KEYS+1)
                ]
                truncated = len(key_rows) > PROBE_ISIN_MAX_KEYS
        if (
            key_rows is not None
            and not truncated
            and probe_bytes > PROBE_ISIN_MIN_SINK_BYTES
        ):
            # the IN list can't carry null, but null-keyed sink rows
            # must stay visible to the null-safe anti-join below —
            # otherwise a replayed null-keyed row re-appends
            existing = existing.filter(
                F.col(probe_col).isin(sorted(set(key_rows) - {None}))
                | F.col(probe_col).isNull()
            )
        # null-SAFE anti-join: `on=key_cols` compares with `=` where
        # null != null, so a replayed row with a null key component
        # would never match its own prior write and duplicate forever
        seen = existing.select(*key_cols).dropDuplicates(key_cols)
        anti_cond = None
        for c in key_cols:
            e = batch[c].eqNullSafe(seen[c])
            anti_cond = e if anti_cond is None else (anti_cond & e)
        batch = batch.join(seen, on=anti_cond, how="left_anti")
    writer = batch.write.mode("append")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(out_path)


def fanout(batch_df: DataFrame, *sinks) -> None:
    """Feed one micro-batch to several sinks over a single persisted
    lineage — the reference's ``dstream.cache()`` + N output ops
    (reference app/DauApp.scala:41-52: three count-prints and two
    foreachRDD per batch share one cached parse; SURVEY §2.9 caching
    note). Without the persist, every sink re-runs the batch's whole
    transformation from the source; with it the first action
    materializes the batch and the rest read from block storage.

    Each ``sink`` is a callable taking the persisted DataFrame.
    Unpersists in a finally so a failing sink can't leak executor
    memory across batches.
    """
    batch_df.persist()
    try:
        for sink in sinks:
            sink(batch_df)
    finally:
        batch_df.unpersist()


def monitoring_counts(batch_df: DataFrame, monitor_path: str, batch_id: int,
                      group_col: str | None = None,
                      ts_col: str | None = None) -> None:
    """Per-batch row counts to a monitoring table — the durable form of
    the reference's ``count().print()`` probes (A1/K7, reference
    app/DauApp.scala:42,47,52). One tiny row (per group) per batch.

    Idempotent on ``batch_id``: foreachBatch is at-least-once (a crash
    between the sink and the checkpoint commit re-runs the batch with
    the SAME id), so a batch_id already present means this is a replay
    and the probe row must not double — otherwise sum(n_rows) drifts
    above the idempotent serving table it reconciles against.

    ``ts_col`` adds per-batch min/max event time — the durable
    watermark-lag signal (how far behind the event clock each batch
    ran) that the reference's console prints never captured."""
    spark = batch_df.sparkSession
    if _target_exists(monitor_path):
        already = (
            spark.read.parquet(monitor_path)
            .filter(F.col("batch_id") == F.lit(batch_id))
            .limit(1)
            .count()
        )
        if already:
            return
    grouped = (
        batch_df.groupBy(group_col) if group_col else batch_df.groupBy()
    )
    aggs = [F.count("*").alias("n_rows")]
    if ts_col is not None:
        aggs += [
            F.min(ts_col).alias("min_event_ts"),
            F.max(ts_col).alias("max_event_ts"),
        ]
    (
        grouped.agg(*aggs)
        .withColumn("batch_id", F.lit(batch_id))
        .write.mode("append")
        .parquet(monitor_path)
    )


def split_dead_letter(batch_df: DataFrame, dead_letter_path: str | None) -> DataFrame:
    """Route corrupt-parse rows (``_corrupt`` non-null, see
    sources.parse_topic) to a dead-letter table and return the clean
    rows. The reference's fastjson parse would throw and kill the
    micro-batch on one bad record; here bad records are quarantined
    with zero pipeline downtime and full payload retention."""
    if "_corrupt" not in batch_df.columns:
        return batch_df
    if dead_letter_path:
        bad = batch_df.filter(F.col("_corrupt").isNotNull()).select(
            F.col("_corrupt").alias("raw"),
            F.current_timestamp().alias("quarantined_at"),
        )
        if not bad.isEmpty():
            bad.write.mode("append").parquet(dead_letter_path)
    return batch_df.filter(F.col("_corrupt").isNull())


def kafka_sink(df: DataFrame, brokers: str, topic: str, checkpoint: str):
    """Kafka producer sink (K6, reference
    gamll-canal/.../utils/MyKafkaSender.java:27-32 — fire-and-forget
    string producer; here offset-checkpointed instead). Expects a
    ``value`` string column; an optional ``key`` column rides along
    (StringSerializer on both, MyKafkaSender.java:16-17 — the
    reference's send(topic, msg) is keyless, so key is pass-through,
    never required). Requires the Kafka connector jar; contract tests
    pin the option/projection surface and a broker-gated e2e covers
    the wire round-trip when one is available."""
    cols = [F.col("value").cast("string").alias("value")]
    if "key" in df.columns:
        cols.insert(0, F.col("key").cast("string").alias("key"))
    return (
        df.select(*cols)
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
    )


def console_sink(df: DataFrame, n: int = 20):
    """Debug sink (K7, the reference's ``.print()`` probes,
    app/DauApp.scala:42,47,52)."""
    return df.writeStream.format("console").option("numRows", str(n))


def compact_partition(
    spark,
    out_path: str,
    partition_col: str,
    value,
    target_files: int = 1,
) -> int:
    """Day-close small-file compaction for a date-partitioned streaming
    sink: rewrite ONE closed partition's many per-micro-batch files
    (8 shuffle partitions x N batches a day at this config) into
    ``target_files``. At 100 TB the sink's file count, not byte count,
    is what kills serving scans — this is the partitioned-layout
    complement of ``bucketing.compact_to_bucketed`` (which republishes
    a whole table bucketed).

    Call only for partitions the stream has CLOSED (watermark past the
    day): the rewrite must not race the sink's append. The swap is a
    directory rename — the local-FS stand-in for a table-format
    transaction, same caveat as ``merge_last_write_wins``. Returns the
    compacted file count (0 = partition absent).
    """
    part_dir = os.path.join(out_path, f"{partition_col}={value}")
    if not _target_exists(part_dir):
        return 0
    # reading the partition dir directly drops the (hive-encoded)
    # partition column — correct: the rewrite stays inside the dir
    df = spark.read.parquet(part_dir)
    tmp = f"{part_dir}__compact_{uuid.uuid4().hex[:8]}"
    df.coalesce(target_files).write.mode("overwrite").parquet(tmp)
    shutil.rmtree(part_dir)
    os.replace(tmp, part_dir)
    return sum(
        1 for n in os.listdir(part_dir)
        if n.endswith(".parquet") and not n.startswith((".", "_"))
    )


def read_dim(
    spark,
    path: str,
    op_col: str | None = None,
    delete_value: str = "DELETE",
) -> DataFrame:
    """Read a last-write-wins dimension table, hiding tombstones.

    DELETE handling (beyond the reference, which never routes deletes):
    the merge keeps the winning row per key INCLUDING delete markers —
    storing the tombstone is what makes replays safe (an at-least-once
    re-delivery of an older UPDATE unions in a lower version and loses
    to the stored tombstone; filtering deletes at write time would let
    it resurrect the key). Readers drop tombstones here instead.
    """
    df = spark.read.parquet(path)
    if op_col and op_col in df.columns:
        df = df.filter(
            F.coalesce(F.col(op_col) != F.lit(delete_value), F.lit(True))
        )
    return df


def merge_last_write_wins(
    batch_df: DataFrame,
    out_path: str,
    key_col: str,
    version_col: str,
) -> None:
    """Upsert: keep the highest-``version_col`` row per key.

    Replaces the reference's Redis ``SET userInfo:{id}`` dim cache
    (reference app/UserInfoApp.scala:29-41; W6). The dim table is
    small by design (it gets broadcast in joins), so a full rewrite
    per micro-batch is the Delta-less MERGE: write the merged result
    to a fresh directory, then atomically swap.
    """
    spark = batch_df.sparkSession
    merged = batch_df
    if _target_exists(out_path):
        # the sink's schema IS the batch schema (this writer produced
        # it): skips the per-batch footer-read schema inference job
        merged = spark.read.schema(batch_df.schema).parquet(out_path).unionByName(
            batch_df
        )
    # deterministic on version ties: fall back to a stable row hash so
    # replays of the same batch always keep the same winner
    w = F.row_number().over(
        Window.partitionBy(key_col).orderBy(
            F.col(version_col).desc(), F.xxhash64(F.struct(*merged.columns)).asc()
        )
    )
    deduped = merged.withColumn("_rn", w).filter(F.col("_rn") == 1).drop("_rn")
    tmp = f"{out_path}__staging_{uuid.uuid4().hex[:8]}"
    deduped.write.mode("overwrite").parquet(tmp)
    if os.path.exists(out_path):
        shutil.rmtree(out_path)
    os.replace(tmp, out_path)
