"""Round-5 operator tests: vocabulary/unigram-LM scoring, weighted
deterministic sampling, semantic dedup, and the incremental ingest
dedup family (batch probe + streaming novelty gate)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from sparkstreaming_gmall_demo_spark.operators import dedup as dedup_ops
from sparkstreaming_gmall_demo_spark.operators import sampling as samp
from sparkstreaming_gmall_demo_spark.operators import similarity as sim
from sparkstreaming_gmall_demo_spark.operators import vocab as vocab_ops


# ---------------------------------------------------------------------------
# vocabulary + unigram surprisal
# ---------------------------------------------------------------------------
def test_vocab_build_frequency_order_and_tiebreak(spark):
    df = spark.createDataFrame(
        [("b b a a c a",), ("z b",)], ["text"]
    )
    rows = vocab_ops.vocab_build(df, top_n=3).collect()
    # counts: a=3, b=3, c=1, z=1 -> tie a<b, then c (c<z)
    assert [(r.token_id, r.token, r.cnt) for r in rows] == [
        (0, "a", 3),
        (1, "b", 3),
        (2, "c", 1),
    ]


def test_unigram_surprisal_hand_case(spark):
    # corpus: doc1 "a a b", doc2 "c"; vocab top-2 = a(2), b(1) (cnt desc,
    # token asc drops c at the boundary tie b/c? counts b=1, c=1 -> b<c
    # so vocab = [a, b]). total=4, V=2, denom=7.
    df = spark.createDataFrame([(1, "a a b"), (2, "c")], ["doc_id", "text"])
    voc = vocab_ops.vocab_build(df, top_n=2)
    got = {
        r.doc_id: (r.n_tokens, r.surprisal)
        for r in vocab_ops.unigram_surprisal(
            df, voc, total_tokens=4, vocab_size=2
        ).collect()
    }
    p_a, p_b, p_oov = 3 / 7, 2 / 7, 1 / 7
    want1 = (2 * -math.log(p_a) + -math.log(p_b)) / 3
    want2 = -math.log(p_oov)
    assert got[1][0] == 3 and abs(got[1][1] - want1) < 1e-12
    assert got[2][0] == 1 and abs(got[2][1] - want2) < 1e-12


def test_vocab_join_is_broadcast(spark, sf_dir):
    from sparkstreaming_gmall_demo_spark.sources.fixtures import load_table

    docs = load_table(spark, sf_dir, "documents")
    voc = vocab_ops.vocab_build(docs, top_n=16)
    plan = vocab_ops.unigram_surprisal(
        docs, voc, total_tokens=1000, vocab_size=16
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


# ---------------------------------------------------------------------------
# weighted deterministic sampling
# ---------------------------------------------------------------------------
def test_weighted_sample_partitioning_invariant(spark):
    df = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") % 7 + 1).alias("w")
    )
    a = {r.k for r in samp.weighted_sample(df, "k", "w", 100).collect()}
    b = {
        r.k
        for r in samp.weighted_sample(df.repartition(13), "k", "w", 100).collect()
    }
    assert a == b and len(a) == 100


def test_weighted_sample_prefers_heavy_rows(spark):
    # 500 heavy (w=50) + 500 light (w=1): the heavy half must dominate
    # the selection (deterministic — no flakiness, this is a fixed set).
    df = spark.range(0, 1000).select(
        F.col("id").alias("k"),
        F.when(F.col("id") < 500, 50).otherwise(1).alias("w"),
    )
    sel = samp.weighted_sample(df, "k", "w", 100).collect()
    heavy = sum(1 for r in sel if r.k < 500)
    assert heavy > 85


def test_weighted_sample_plans_takeordered(spark):
    df = spark.range(0, 100).select(
        F.col("id").alias("k"), F.lit(2).alias("w")
    )
    plan = (
        samp.weighted_sample(df, "k", "w", 10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_weighted_priority_matches_duckdb(spark):
    """The A-Res priority arithmetic is engine-portable: DuckDB's
    0x-cast and Spark's conv() produce the same integer, and the
    ln/divide agree to well beyond output rounding."""
    import duckdb

    df = spark.range(0, 50).select(
        F.col("id").alias("k"), (F.col("id") % 5 + 1).alias("w")
    )
    got = {
        r.k: r.p
        for r in df.select(
            "k", samp.weighted_priority("k", "w", "s1").alias("p")
        ).collect()
    }
    want = dict(
        duckdb.connect()
        .execute(
            """
            SELECT k, ln((CAST(concat('0x', substr(md5(CAST(k AS VARCHAR) || 's1'), 1, 8)) AS BIGINT) + 0.5)
                         / 4294967296.0) / w
            FROM (SELECT range AS k, range % 5 + 1 AS w FROM range(50))
            """
        )
        .fetchall()
    )
    for k in want:
        assert abs(got[k] - want[k]) < 1e-12


# ---------------------------------------------------------------------------
# incremental dedup (batch probe)
# ---------------------------------------------------------------------------
def test_novel_against_index_filters_known_content(spark):
    index = dedup_ops.fingerprint_index(
        spark.createDataFrame([("Hello World",)], ["text"])
    )
    batch = spark.createDataFrame(
        [(1, "hello world"), (2, "brand new"), (3, "brand new")],
        ["doc_id", "text"],
    )
    got = dedup_ops.novel_against_index(batch, index)
    # case-normalized dup of the index is gone; both copies of the new
    # content survive the probe (within-batch collapse is the caller's
    # choice — the streaming gate does it, the batch query counts both)
    assert {r.doc_id for r in got.collect()} == {2, 3}
    assert "fingerprint" in got.columns


# ---------------------------------------------------------------------------
# semantic dedup
# ---------------------------------------------------------------------------
def _vec(*xs):
    return [float(x) for x in xs]


def test_semantic_dedup_drops_planted_duplicate(spark):
    rows = [
        (1, _vec(1, 0, 0), 0),
        (2, _vec(0.9, 0.1, 0), 0),
        (3, _vec(0, 1, 0), 1),
        (4, _vec(0, 0.9, 0.1), 1),
        (100, _vec(1, 0, 0), 0),  # exact duplicate of vec 1
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    codebook = sim.train_label_codebook(emb)
    assigned = sim.assign_codebook(emb, codebook)
    pairs = sim.semantic_dedup_pairs(assigned, threshold=0.999)
    kept = sim.semantic_dedup_keep(assigned, pairs)
    status = {r.vec_id: r.kept for r in kept.collect()}
    assert status == {1: True, 2: True, 3: True, 4: True, 100: False}


def test_assign_codebook_quantizes_to_nearest_not_own_label(spark):
    # vec 9 carries label 0 but sits on the label-1 centroid: assignment
    # is quantization (nearest cell), not a passthrough of the label.
    rows = [
        (1, _vec(10, 0), 0),
        (2, _vec(10, 0), 0),
        (3, _vec(0, 10), 1),
        (4, _vec(0, 10), 1),
        (9, _vec(0, 9), 0),
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    codebook = sim.train_label_codebook(emb)
    assigned = {r.vec_id: r.cluster for r in sim.assign_codebook(emb, codebook).collect()}
    assert assigned[9] == 1
    assert assigned[1] == 0 and assigned[3] == 1


def test_semantic_dedup_assignment_is_narrow_map(spark, sf_dir):
    """Codebook assignment must not introduce a join or shuffle: the
    centroids are broadcast literals inside a projection."""
    from sparkstreaming_gmall_demo_spark.sources.fixtures import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    codebook = sim.train_label_codebook(emb)
    plan = (
        sim.assign_codebook(emb, codebook)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan and "Exchange" not in plan


# ---------------------------------------------------------------------------
# streaming novelty gate
# ---------------------------------------------------------------------------
def test_novelty_gate_streaming_matches_batch_and_replays_noop(spark, sf_dir, tmp_path):
    """Docs replayed in 3 chunks through the gate emit exactly the
    batch-computed novel set (first doc_id per fingerprint), the txn
    index ends at one row per distinct fingerprint, and a full replay
    from a fresh checkpoint inserts nothing new anywhere."""
    import pyarrow.parquet as pq

    from sparkstreaming_gmall_demo_spark.streaming import pipelines, txn

    table = pq.read_table(f"{sf_dir}/documents.parquet")
    topic = tmp_path / "docs_topic"
    topic.mkdir()
    n = table.num_rows
    step = (n + 2) // 3
    for i in range(3):
        pq.write_table(table.slice(i * step, step), str(topic / f"c{i}.parquet"))

    index_table = str(tmp_path / "fp_index")
    out = str(tmp_path / "novel_docs")
    schema = "doc_id long, text string, lang string, source string, n_chars long"

    def run(ckpt: str) -> None:
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(topic))
        )
        q = pipelines.novelty_gate_pipeline(
            stream, index_table, out, ckpt, trigger={"availableNow": True}
        )
        q.awaitTermination()

    run(str(tmp_path / "ckpt1"))
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    want = {
        r.doc_id
        for r in docs.withColumn("fp", F.md5(F.lower(F.col("text"))))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"))
        .collect()
    }
    got = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert got == want

    n_fp = docs.select(F.md5(F.lower(F.col("text")))).distinct().count()
    assert txn.snapshot(spark, index_table).count() == n_fp
    v_before = txn.current_version(index_table)

    run(str(tmp_path / "ckpt2"))  # full replay, fresh checkpoint
    assert {r.doc_id for r in spark.read.parquet(out).collect()} == want
    assert txn.snapshot(spark, index_table).count() == n_fp
    assert txn.current_version(index_table) == v_before


# ---------------------------------------------------------------------------
# Count-Min sketch heavy hitters
# ---------------------------------------------------------------------------
def test_cm_sketch_never_undercounts_and_is_tight_for_unique_hot_key(spark):
    from sparkstreaming_gmall_demo_spark.operators import sketch as sk

    # 1000 occurrences of "hot" + 200 distinct cold tokens
    rows = [("hot",)] * 1000 + [(f"cold{i}",) for i in range(200)]
    toks = spark.createDataFrame(rows, ["token"])
    sketch = sk.cm_build(toks, depth=4, width=256)
    cands = spark.createDataFrame([("hot",), ("cold7",), ("absent",)], ["token"])
    est = {r.token: r.cm_est for r in sk.cm_estimate(
        sketch, cands, depth=4, width=256).collect()}
    assert est["hot"] >= 1000
    assert est["cold7"] >= 1
    # min-over-depth keeps overshoot below the e/width * N bound here
    assert est["hot"] <= 1000 + 13  # ceil(e/256 * 1200)
    assert est["absent"] <= 13


def test_cm_sketch_is_mergeable_by_addition(spark):
    """sketch(A ++ B) == cellwise sketch(A) + sketch(B) — the property
    that makes the sketch partial-aggregable map-side and correct
    across distributed merges."""
    from pyspark.sql import functions as F2

    from sparkstreaming_gmall_demo_spark.operators import sketch as sk

    a = spark.createDataFrame([("x",)] * 10 + [("y",)] * 3, ["token"])
    b = spark.createDataFrame([("x",)] * 5 + [("z",)] * 7, ["token"])
    merged = {
        (r.d, r.b): r.c for r in sk.cm_build(a.union(b), width=64).collect()
    }
    summed = {}
    for part in (a, b):
        for r in sk.cm_build(part, width=64).collect():
            summed[(r.d, r.b)] = summed.get((r.d, r.b), 0) + r.c
    assert merged == summed


def test_cm_sketch_shuffle_is_bounded_by_cells(spark, sf_dir):
    """The sketch aggregate must partial-aggregate map-side (cells, not
    occurrences, cross the wire): the plan has a partial HashAggregate
    below the exchange."""
    from sparkstreaming_gmall_demo_spark.operators import sketch as sk
    from sparkstreaming_gmall_demo_spark.operators import vocab as vops
    from sparkstreaming_gmall_demo_spark.sources.fixtures import load_table

    docs = load_table(spark, sf_dir, "documents")
    toks = vops.corpus_tokens(docs.select("text"))
    plan = (
        sk.cm_build(toks)._jdf.queryExecution().executedPlan().toString()
    )
    assert "partial_count" in plan or "partial" in plan.lower()


def test_sketch_pipeline_streaming_equals_batch_and_replays_noop(spark, sf_dir, tmp_path):
    """The merged cross-batch sketch equals the one-shot batch sketch
    over the same corpus (mergeable-by-addition, so chunking is
    invisible), and a full replay from a fresh checkpoint changes
    nothing (per-batch keys make reinserts no-ops)."""
    import pyarrow.parquet as pq

    from sparkstreaming_gmall_demo_spark.operators import sketch as sk
    from sparkstreaming_gmall_demo_spark.operators import vocab as vops
    from sparkstreaming_gmall_demo_spark.streaming import pipelines, txn

    table = pq.read_table(f"{sf_dir}/documents.parquet")
    topic = tmp_path / "docs_topic"
    topic.mkdir()
    step = (table.num_rows + 2) // 3
    for i in range(3):
        pq.write_table(table.slice(i * step, step), str(topic / f"c{i}.parquet"))

    sketch_table = str(tmp_path / "cm_sketch")
    schema = "doc_id long, text string, lang string, source string, n_chars long"

    def run(ckpt: str) -> None:
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(topic))
        )
        q = pipelines.sketch_pipeline(
            stream, sketch_table, ckpt, trigger={"availableNow": True}
        )
        q.awaitTermination()

    run(str(tmp_path / "ck1"))
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = vops.corpus_tokens(docs.select("text"))
    want = {
        (r.d, r.b): r.c for r in sk.cm_build(toks).collect()
    }
    got = {
        (r.d, r.b): r.c
        for r in pipelines.cm_read_merged(spark, sketch_table).collect()
    }
    assert got == want

    v = txn.current_version(sketch_table)
    run(str(tmp_path / "ck2"))  # full replay
    got2 = {
        (r.d, r.b): r.c
        for r in pipelines.cm_read_merged(spark, sketch_table).collect()
    }
    assert got2 == want
    assert txn.current_version(sketch_table) == v


# ---------------------------------------------------------------------------
# PageRank
# ---------------------------------------------------------------------------
def test_pagerank_hand_case_two_node_cycle(spark):
    """A <-> B symmetric cycle: uniform vector is the fixed point, so
    every iteration returns exactly 0.5/0.5."""
    from sparkstreaming_gmall_demo_spark.operators import graph as g

    edges = spark.createDataFrame(
        [("a", "b", 1.0), ("b", "a", 1.0)], ["src", "dst", "w"]
    )
    got = {r.node: r.rank for r in g.pagerank(edges, iters=3).collect()}
    assert abs(got["a"] - 0.5) < 1e-12 and abs(got["b"] - 0.5) < 1e-12


def test_pagerank_sink_gains_and_dangling_mass_evaporates(spark):
    """Star a->c, b->c: c accumulates; c is dangling so total mass
    shrinks below 1 (documented semantics, mirrored in the oracle)."""
    from sparkstreaming_gmall_demo_spark.operators import graph as g

    edges = spark.createDataFrame(
        [("a", "c", 1.0), ("b", "c", 1.0)], ["src", "dst", "w"]
    )
    got = {r.node: r.rank for r in g.pagerank(edges, iters=2, damping=0.85).collect()}
    # iter1: a=b=0.05, c=0.05 + 0.85*(1/3+1/3) = 0.6166...
    # iter2: c = 0.05 + 0.85*(0.05+0.05) = 0.135
    assert abs(got["c"] - 0.135) < 1e-9
    assert abs(got["a"] - 0.05) < 1e-12
    assert sum(got.values()) < 1.0


def test_pagerank_weights_split_contribution(spark):
    """a splits 3:1 between b and c — contributions follow the edge
    weights, not the edge count."""
    from sparkstreaming_gmall_demo_spark.operators import graph as g

    edges = spark.createDataFrame(
        [("a", "b", 3.0), ("a", "c", 1.0)], ["src", "dst", "w"]
    )
    got = {r.node: r.rank for r in g.pagerank(edges, iters=1, damping=0.85).collect()}
    assert abs(got["b"] - (0.05 + 0.85 * (1 / 3) * 0.75)) < 1e-12
    assert abs(got["c"] - (0.05 + 0.85 * (1 / 3) * 0.25)) < 1e-12


def test_token_pmi_hand_case(spark):
    """Three docs; pair (a,b) co-occurs in 2 of 3, df(a)=3, df(b)=2:
    pmi = ln(3 * 2 / (3 * 2)) = 0. Pair (a,c): co-occurs once -> below
    min_cooccur=2 -> dropped."""
    from sparkstreaming_gmall_demo_spark.operators import vocab as vops

    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a c")], ["doc_id", "text"]
    )
    voc = vops.vocab_build(docs, top_n=8)
    got = {
        (r.a, r.b): (r.cooccur, r.pmi4)
        for r in vops.token_pmi_pairs(docs, voc, n_docs=3, min_cooccur=2).collect()
    }
    assert got == {("a", "b"): (2, 0.0)}


def test_token_pmi_positive_for_exclusive_pair(spark):
    """x and y appear ONLY together (2 of 4 docs): pmi = ln(4*2/(2*2))
    = ln 2 > 0; the independent pair (x, z) is dropped by min_cooccur."""
    import math

    from sparkstreaming_gmall_demo_spark.operators import vocab as vops

    docs = spark.createDataFrame(
        [(1, "x y"), (2, "x y"), (3, "z w"), (4, "z w")], ["doc_id", "text"]
    )
    voc = vops.vocab_build(docs, top_n=8)
    got = {
        (r.a, r.b): r.pmi4
        for r in vops.token_pmi_pairs(docs, voc, n_docs=4, min_cooccur=2).collect()
    }
    assert got[("x", "y")] == round(math.log(2), 4)
    assert got[("w", "z")] == round(math.log(2), 4)
    assert ("x", "z") not in got


# ---------------------------------------------------------------------------
# training shard export
# ---------------------------------------------------------------------------
def test_shard_assign_is_deterministic_and_partitioning_invariant(spark):
    from sparkstreaming_gmall_demo_spark.operators import chunking as ch

    df = spark.createDataFrame(
        [(l, b) for l in ("en", "de") for b in range(50)], ["lang", "bin_id"]
    )
    a = {(r.lang, r.bin_id): r.shard for r in ch.shard_assign(df, ["lang", "bin_id"], 8).collect()}
    b = {
        (r.lang, r.bin_id): r.shard
        for r in ch.shard_assign(df.repartition(7), ["lang", "bin_id"], 8).collect()
    }
    assert a == b
    assert set(a.values()) <= set(range(8))
    assert len(set(a.values())) > 1  # spreads across shards


def test_write_training_shards_layout_and_stability(spark, tmp_path):
    """Shards land as shard=K directories, and a re-export of the same
    bins produces the identical shard membership (the content-keyed
    layout promise a training loader relies on)."""
    import os

    from sparkstreaming_gmall_demo_spark.operators import chunking as ch

    bins = spark.createDataFrame(
        [("en", b, 100 + b) for b in range(20)], ["lang", "bin_id", "bin_tokens"]
    )
    out = str(tmp_path / "shards")
    ch.write_training_shards(bins, out, n_shards=4)
    dirs = sorted(d for d in os.listdir(out) if d.startswith("shard="))
    assert dirs and all(d.split("=")[1].isdigit() for d in dirs)
    first = {
        (r.lang, r.bin_id): r.shard for r in spark.read.parquet(out).collect()
    }
    ch.write_training_shards(bins, out, n_shards=4)  # re-export
    second = {
        (r.lang, r.bin_id): r.shard for r in spark.read.parquet(out).collect()
    }
    assert first == second and len(first) == 20


# ---------------------------------------------------------------------------
# incremental ANN index maintenance
# ---------------------------------------------------------------------------
def test_ivf_append_finds_new_vectors_with_frozen_centroids(spark, sf_dir, tmp_path):
    """Build the index on a base corpus, append a delta (including an
    exact duplicate of the query vector under a fresh id) with FROZEN
    centroids: the probe must surface the newly appended near-neighbor
    via the partition-pruned index scan, without touching centroids."""
    from sparkstreaming_gmall_demo_spark.sources.fixtures import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") % 5 != 0)
    delta = emb.filter(F.col("vec_id") % 5 == 0)
    plant = emb.filter(F.col("vec_id") == 1).withColumn(
        "vec_id", F.lit(77_000_000).cast(dict(emb.dtypes)["vec_id"])
    )
    cents = sim.ivf_train(base, k=8, iters=2)
    path = str(tmp_path / "ivf_index")
    sim.ivf_write_index(base, cents, path)
    sim.ivf_append_index(delta.unionByName(plant), cents, path)

    index = sim.ivf_read_index(spark, path)
    assert index.count() == emb.count() + 1
    q = sim.query_vector(emb, 1)
    got = sim.ivf_topk(
        emb, q, k=5, centroids=cents, assignment=index
    ).collect()
    ids = [r.vec_id for r in got]
    assert 77_000_000 in ids and 1 in ids
    top2 = {r.vec_id for r in got[:2]}
    assert top2 == {1, 77_000_000}  # both cosine 1.0, id tiebreak


def test_ann_ingest_streaming_replay_is_exactly_once(spark, sf_dir, tmp_path):
    """Vectors streamed in 3 chunks land once each in the partitioned
    index; a full replay from a fresh checkpoint adds nothing."""
    import pyarrow.parquet as pq

    from sparkstreaming_gmall_demo_spark.sources.fixtures import load_table
    from sparkstreaming_gmall_demo_spark.streaming import pipelines

    emb = load_table(spark, sf_dir, "embeddings")
    cents = sim.ivf_train(emb, k=8, iters=2)

    table = pq.read_table(f"{sf_dir}/embeddings.parquet")
    topic = tmp_path / "vec_topic"
    topic.mkdir()
    step = (table.num_rows + 2) // 3
    for i in range(3):
        pq.write_table(table.slice(i * step, step), str(topic / f"c{i}.parquet"))

    index_path = str(tmp_path / "ivf_stream_index")
    schema = "vec_id long, embedding array<float>, label int"

    def run(ckpt: str) -> None:
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(topic))
        )
        q = pipelines.ann_ingest_pipeline(
            stream, cents, index_path, ckpt, trigger={"availableNow": True}
        )
        q.awaitTermination()

    run(str(tmp_path / "ck1"))
    n = emb.count()
    idx = spark.read.parquet(index_path)
    assert idx.count() == n
    assert idx.select("vec_id").distinct().count() == n

    run(str(tmp_path / "ck2"))  # full replay
    assert spark.read.parquet(index_path).count() == n

    # streamed assignments == batch assignments under the same frozen
    # centroids (pure function -> chunking is invisible)
    want = {r.vec_id: r.cluster for r in sim.ivf_assign(emb, cents).collect()}
    got = {r.vec_id: r.cluster for r in spark.read.parquet(index_path).collect()}
    assert got == want
