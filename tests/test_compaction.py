"""Partial-table compaction: bounded storage for the continuous
sketch/dictionary pipelines, exactly-once preserved through the
compaction watermark in the commit metadata."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from sparkstreaming_gmall_demo_spark.operators import sketch as sketch_ops
from sparkstreaming_gmall_demo_spark.operators import text as text_ops
from sparkstreaming_gmall_demo_spark.streaming import pipelines, txn


# ---------------------------------------------------------------------------
# manifest metadata
# ---------------------------------------------------------------------------
def test_table_meta_roundtrip_and_merge_carries_forward(spark, tmp_path):
    table = str(tmp_path / "t")
    df = spark.createDataFrame([(1, "a")], ["k", "v"])
    txn.overwrite(df, table, meta={"compacted_through": 7})
    assert txn.table_meta(table) == {"compacted_through": 7}
    # a later keyed merge must not drop maintenance metadata
    txn.merge_keyed(
        spark.createDataFrame([(2, "b")], ["k", "v"]), table, key_cols=["k"]
    )
    assert txn.table_meta(table) == {"compacted_through": 7}
    # pure-replay merge (no commit) leaves it too
    txn.merge_keyed(
        spark.createDataFrame([(2, "b")], ["k", "v"]), table, key_cols=["k"]
    )
    assert txn.table_meta(table) == {"compacted_through": 7}


def test_table_meta_absent_table_and_version(spark, tmp_path):
    assert txn.table_meta(str(tmp_path / "nope")) == {}
    table = str(tmp_path / "t2")
    txn.overwrite(spark.createDataFrame([(1,)], ["k"]), table)
    assert txn.table_meta(table) == {}


# ---------------------------------------------------------------------------
# pipeline compaction
# ---------------------------------------------------------------------------
def _chunked_topic(tmp_path, fixture, name, chunks=4):
    table = pq.read_table(fixture)
    topic = tmp_path / name
    topic.mkdir()
    step = (table.num_rows + chunks - 1) // chunks
    for i in range(chunks):
        pq.write_table(table.slice(i * step, step), str(topic / f"c{i}.parquet"))
    return topic, table


DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _run_boilerplate(spark, topic, gram_table, ckpt):
    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(topic))
    )
    q = pipelines.boilerplate_pipeline(
        stream, gram_table, ckpt, n=6, trigger={"availableNow": True}
    )
    q.awaitTermination()


def test_boilerplate_compaction_bounds_storage_and_stays_exact(spark, tmp_path):
    sf_dir = "/root/testdata/sf0.01"
    topic, _ = _chunked_topic(tmp_path, f"{sf_dir}/documents.parquet", "docs")
    gram_table = str(tmp_path / "gram_df")

    _run_boilerplate(spark, topic, gram_table, str(tmp_path / "ck1"))
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    want = sorted(
        (r.gram, r.df)
        for r in text_ops.boilerplate_ngrams(docs, n=6, min_df=3).collect()
    )

    before_rows = txn.snapshot(spark, gram_table).count()
    n_after = pipelines.compact_boilerplate_dictionary(spark, gram_table)
    assert n_after < before_rows  # per-batch duplicates of a gram folded
    snap = txn.snapshot(spark, gram_table)
    assert [r.batch_id for r in snap.select("batch_id").distinct().collect()] == [-1]
    got = sorted(
        (r.gram, r.df)
        for r in pipelines.boilerplate_read_dictionary(
            spark, gram_table, min_df=3
        ).collect()
    )
    assert got == want

    # full fresh-checkpoint replay over the same input: every batch id
    # falls at or below the watermark -> guard skips, version unchanged
    v = txn.current_version(gram_table)
    _run_boilerplate(spark, topic, gram_table, str(tmp_path / "ck2"))
    assert txn.current_version(gram_table) == v
    got2 = sorted(
        (r.gram, r.df)
        for r in pipelines.boilerplate_read_dictionary(
            spark, gram_table, min_df=3
        ).collect()
    )
    assert got2 == want


def test_boilerplate_ingest_continues_after_compaction(spark, tmp_path):
    """New batches AFTER compaction (same checkpoint -> ids above the
    watermark) must keep accumulating gram votes exactly."""
    sf_dir = "/root/testdata/sf0.01"
    table = pq.read_table(f"{sf_dir}/documents.parquet")
    topic = tmp_path / "docs"
    topic.mkdir()
    half = table.num_rows // 2
    pq.write_table(table.slice(0, half), str(topic / "c0.parquet"))
    gram_table = str(tmp_path / "gram_df")
    ckpt = str(tmp_path / "ck")

    _run_boilerplate(spark, topic, gram_table, ckpt)
    pipelines.compact_boilerplate_dictionary(spark, gram_table)

    # second half arrives later, SAME checkpoint
    pq.write_table(
        table.slice(half, table.num_rows - half), str(topic / "c1.parquet")
    )
    _run_boilerplate(spark, topic, gram_table, ckpt)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    want = sorted(
        (r.gram, r.df)
        for r in text_ops.boilerplate_ngrams(docs, n=6, min_df=3).collect()
    )
    got = sorted(
        (r.gram, r.df)
        for r in pipelines.boilerplate_read_dictionary(
            spark, gram_table, min_df=3
        ).collect()
    )
    assert got == want


def test_hll_compaction_estimates_unchanged(spark, tmp_path):
    sf_dir = "/root/testdata/sf0.01"
    topic, _ = _chunked_topic(tmp_path, f"{sf_dir}/events.parquet", "events")
    sketch_table = str(tmp_path / "hll")
    schema = (
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string"
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(topic))
    )
    q = pipelines.hll_pipeline(
        stream, sketch_table, str(tmp_path / "ck"), trigger={"availableNow": True}
    )
    q.awaitTermination()

    want = sorted(
        (r.d, r.est_daily, r.est_cum)
        for r in sketch_ops.hll_prefix_estimates(
            pipelines.hll_read_daily(spark, sketch_table)
        ).collect()
    )
    before = txn.snapshot(spark, sketch_table).count()
    n_after = pipelines.compact_hll_partials(spark, sketch_table)
    assert n_after <= before
    got = sorted(
        (r.d, r.est_daily, r.est_cum)
        for r in sketch_ops.hll_prefix_estimates(
            pipelines.hll_read_daily(spark, sketch_table)
        ).collect()
    )
    assert got == want  # HLL max-merge: compaction is bit-invisible


def test_cm_compaction_counts_unchanged(spark, tmp_path):
    sf_dir = "/root/testdata/sf0.01"
    topic, _ = _chunked_topic(tmp_path, f"{sf_dir}/documents.parquet", "docs")
    sketch_table = str(tmp_path / "cm")
    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(topic))
    )
    q = pipelines.sketch_pipeline(
        stream, sketch_table, str(tmp_path / "ck"), trigger={"availableNow": True}
    )
    q.awaitTermination()

    want = sorted(
        (r.d, r.b, r.c)
        for r in pipelines.cm_read_merged(spark, sketch_table).collect()
    )
    pipelines.compact_sketch_partials(spark, sketch_table)
    snap = txn.snapshot(spark, sketch_table)
    # storage is now exactly one row per live cell
    assert snap.count() == len(want)
    got = sorted(
        (r.d, r.b, r.c)
        for r in pipelines.cm_read_merged(spark, sketch_table).collect()
    )
    assert got == want


# ---------------------------------------------------------------------------
# small-file maintenance
# ---------------------------------------------------------------------------
def test_compact_files_reduces_count_preserves_rows_and_meta(spark, tmp_path):
    table = str(tmp_path / "t")
    txn.overwrite(
        spark.createDataFrame([(0, "v0")], ["k", "v"]),
        table, meta={"compacted_through": 3},
    )
    for i in range(1, 7):
        txn.merge_keyed(
            spark.createDataFrame([(i, f"v{i}")], ["k", "v"]), table, key_cols=["k"]
        )
    v = txn.current_version(table)
    before_files = len(txn._read_manifest(table, v))
    assert before_files >= 7  # one file-set per merge commit
    want = sorted((r.k, r.v) for r in txn.snapshot(spark, table).collect())

    b, a = txn.compact_files(spark, table, target_files=2)
    assert b == before_files and a <= 2
    got = sorted((r.k, r.v) for r in txn.snapshot(spark, table).collect())
    assert got == want
    assert txn.table_meta(table) == {"compacted_through": 3}
    # old snapshot still time-travelable until vacuumed
    old = sorted((r.k, r.v) for r in txn.snapshot(spark, table, version=v).collect())
    assert old == want


def test_compact_files_empty_table_noop(spark, tmp_path):
    assert txn.compact_files(spark, str(tmp_path / "none"), 2) == (0, 0)


def test_boilerplate_auto_compaction_every_two_batches(spark, tmp_path):
    """compact_every=2 from inside the sink: the final table holds
    only sentinel + post-compaction batches, reads stay exact."""
    sf_dir = "/root/testdata/sf0.01"
    topic, _ = _chunked_topic(tmp_path, f"{sf_dir}/documents.parquet", "docs")
    gram_table = str(tmp_path / "gram_df")
    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(topic))
    )
    q = pipelines.boilerplate_pipeline(
        stream, gram_table, str(tmp_path / "ck"), n=6,
        trigger={"availableNow": True}, compact_every=2,
    )
    q.awaitTermination()

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    want = sorted(
        (r.gram, r.df)
        for r in text_ops.boilerplate_ngrams(docs, n=6, min_df=3).collect()
    )
    got = sorted(
        (r.gram, r.df)
        for r in pipelines.boilerplate_read_dictionary(
            spark, gram_table, min_df=3
        ).collect()
    )
    assert got == want
    # 4 batches, compacted after 2 and 4: only the sentinel remains
    ids = sorted(
        r.batch_id
        for r in txn.snapshot(spark, gram_table).select("batch_id").distinct().collect()
    )
    assert ids == [-1]
    assert txn.table_meta(gram_table)["compacted_through"] == 3


def test_compaction_then_vacuum_full_maintenance_cycle(spark, tmp_path):
    """The complete maintenance lifecycle: ingest partials -> fold
    (compact_partials) -> bin-pack (compact_files) -> age old
    snapshots (vacuum). Reads stay exact throughout and storage ends
    at one version of few files."""
    sf_dir = "/root/testdata/sf0.01"
    topic, _ = _chunked_topic(tmp_path, f"{sf_dir}/documents.parquet", "docs")
    gram_table = str(tmp_path / "gram_df")
    _run_boilerplate(spark, topic, gram_table, str(tmp_path / "ck"))

    want = sorted(
        (r.gram, r.df)
        for r in pipelines.boilerplate_read_dictionary(
            spark, gram_table, min_df=3
        ).collect()
    )
    pipelines.compact_boilerplate_dictionary(spark, gram_table)
    txn.compact_files(spark, gram_table, target_files=2)
    removed = txn.vacuum(gram_table, retain_versions=1)
    assert removed > 0  # old per-batch file-sets swept
    assert len(txn.list_versions(gram_table)) == 1
    got = sorted(
        (r.gram, r.df)
        for r in pipelines.boilerplate_read_dictionary(
            spark, gram_table, min_df=3
        ).collect()
    )
    assert got == want
    # watermark survives the whole cycle
    assert txn.table_meta(gram_table)["compacted_through"] >= 0
