"""Round-7 operator tests: BM25 relevance, hybrid RRF fusion, and
corpus-boilerplate n-gram coverage."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from sparkstreaming_gmall_demo_spark.operators import retrieval as retr_ops
from sparkstreaming_gmall_demo_spark.operators import text as text_ops


# ---------------------------------------------------------------------------
# BM25
# ---------------------------------------------------------------------------
def _corpus(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )


def _bm25_ref(texts, terms, k1=1.2, b=0.75):
    """Sequential BM25 over whitespace tokens — the model the Spark
    plan must reproduce."""
    toks = [t.split(" ") for t in texts]
    n = float(len(toks))
    avgdl = sum(len(t) for t in toks) / n
    dfs = [sum(1 for t in toks if q in t) for q in terms]
    out = {}
    for i, t in enumerate(toks):
        score = 0.0
        matched = False
        for q, df in zip(terms, dfs):
            tf = float(t.count(q))
            if tf > 0:
                matched = True
            idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
            score += idf * (
                tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(t) / avgdl))
            )
        if matched:
            out[i] = round(score, 4)
    return out


def test_bm25_matches_sequential_model(spark):
    texts = [
        "spark join window table",
        "spark spark spark filter",
        "scan merge sort batch",
        "join window join window join",
        "spark",
    ]
    got = {
        r["doc_id"]: r["score"]
        for r in text_ops.bm25_topk(_corpus(spark, texts), "spark join", k=10).collect()
    }
    assert got == _bm25_ref(texts, ["spark", "join"])


def test_bm25_or_semantics_includes_partial_matches(spark):
    texts = ["spark only", "join only", "neither here"]
    ids = {
        r["doc_id"]
        for r in text_ops.bm25_topk(_corpus(spark, texts), "spark join", k=10).collect()
    }
    assert ids == {0, 1}


def test_bm25_length_normalization_prefers_shorter_doc(spark):
    # same tf for the query term, different doc lengths
    texts = ["spark a b c d e f g h i j k l", "spark a b"]
    rows = text_ops.bm25_topk(_corpus(spark, texts), "spark", k=10).collect()
    assert [r["doc_id"] for r in rows] == [1, 0]
    assert rows[0]["score"] > rows[1]["score"]


def test_bm25_repeated_term_saturates(spark):
    # tf 8 must score higher than tf 1 but less than 8x (k1 saturation)
    texts = ["spark " + "x " * 7 + "y", "spark spark spark spark spark spark spark spark y"]
    rows = {r["doc_id"]: r["score"] for r in
            text_ops.bm25_topk(_corpus(spark, texts), "spark", k=10).collect()}
    assert rows[1] > rows[0]
    assert rows[1] < 8 * rows[0]


# ---------------------------------------------------------------------------
# RRF fusion
# ---------------------------------------------------------------------------
def test_rrf_fuse_hand_case(spark):
    sparse = spark.createDataFrame([(10, 1), (11, 2)], ["doc_id", "rank"])
    dense = spark.createDataFrame([(11, 1), (12, 2)], ["doc_id", "rank"])
    got = {
        r["doc_id"]: (r["rrf"], r["rank_sparse"], r["rank_dense"])
        for r in retr_ops.rrf_fuse(sparse, dense, k=10).collect()
    }
    assert got[11] == (round(1 / 62 + 1 / 61, 6), 2, 1)
    assert got[10] == (round(1 / 61, 6), 1, None)
    assert got[12] == (round(1 / 62, 6), None, 2)
    # both-arm doc outranks either single-arm doc
    assert got[11][0] > got[10][0] > got[12][0]


def test_rrf_hybrid_end_to_end_shapes(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    rows = retr_ops.hybrid_rrf(docs, emb, "spark join window", 0, k=10).collect()
    assert len(rows) == 10
    # the dense arm's self-query hit (vec 0, cosine 1.0, rank 1) must be present
    by_id = {r["doc_id"]: r for r in rows}
    assert 0 in by_id and by_id[0]["rank_dense"] == 1
    # rrf descending
    vals = [r["rrf"] for r in rows]
    assert vals == sorted(vals, reverse=True)


def test_ranked_is_dense_one_based(spark):
    scored = spark.createDataFrame(
        [(1, 5.0), (2, 7.0), (3, 5.0)], ["doc_id", "score"]
    )
    got = {r["doc_id"]: r["rank"] for r in retr_ops.ranked(scored).collect()}
    # ties break by id asc
    assert got == {2: 1, 1: 2, 3: 3}


# ---------------------------------------------------------------------------
# boilerplate coverage
# ---------------------------------------------------------------------------
def test_boilerplate_hand_case(spark):
    shared = "one two three four five six"  # 6-gram in 3 docs
    texts = [
        shared + " uniq0 uniq1",
        "pre0 " + shared,
        shared,
        "totally different text with no repeats at all",
    ]
    cov = {
        r["doc_id"]: (r["n_tokens"], r["covered_tokens"], r["keep_ratio"])
        for r in text_ops.boilerplate_coverage(
            _corpus(spark, texts), n=6, min_df=3
        ).collect()
    }
    assert cov[0] == (8, 6, 0.25)
    assert cov[1] == (7, 6, round(1 / 7, 4))
    assert cov[2] == (6, 6, 0.0)
    assert cov[3] == (8, 0, 1.0)


def test_boilerplate_overlapping_occurrences_count_once(spark):
    # 'a b c d e f g' contains two overlapping boilerplate 6-grams if
    # both repeat; covered positions must union, not double-count
    texts = ["a b c d e f g", "a b c d e f x", "a b c d e f y",
             "z b c d e f g", "w b c d e f g"]
    cov = {
        r["doc_id"]: r["covered_tokens"]
        for r in text_ops.boilerplate_coverage(
            _corpus(spark, texts), n=6, min_df=3
        ).collect()
    }
    # doc0 holds 'a b c d e f' (df 3) and 'b c d e f g' (df 3): 7 covered
    assert cov[0] == 7


def test_boilerplate_short_doc_is_untouched(spark):
    texts = ["tiny doc", "tiny doc", "tiny doc", "another small one"]
    cov = text_ops.boilerplate_coverage(_corpus(spark, texts), n=6, min_df=3)
    rows = cov.collect()
    assert all(r["covered_tokens"] == 0 and r["keep_ratio"] == 1.0 for r in rows)


def test_boilerplate_dictionary_threshold(spark):
    texts = ["p q r s t u", "p q r s t u", "x y z w v k"]
    bp2 = text_ops.boilerplate_ngrams(_corpus(spark, texts), n=6, min_df=2)
    bp3 = text_ops.boilerplate_ngrams(_corpus(spark, texts), n=6, min_df=3)
    assert [r["gram"] for r in bp2.collect()] == ["p q r s t u"]
    assert bp3.count() == 0


# ---------------------------------------------------------------------------
# plan discipline
# ---------------------------------------------------------------------------
def _plan(df):
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_bm25_plan_is_narrow_map_plus_topk(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _plan(text_ops.bm25_topk(docs, "spark join window", k=10))
    assert "TakeOrderedAndProject" in plan  # no global sort
    assert "Generate" not in plan  # tf/dl are array ops, never an explode
    assert "BroadcastExchange" in plan  # 1-row stats frame


def test_boilerplate_no_text_crosses_shuffle(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _plan(text_ops.boilerplate_coverage(docs, n=6, min_df=3))
    for section in plan.split("Exchange")[1:]:
        assert "text#" not in section[:400], "document text crossed a shuffle"


# ---------------------------------------------------------------------------
# streaming boilerplate-dictionary maintenance
# ---------------------------------------------------------------------------
def test_boilerplate_pipeline_streaming_equals_batch_and_replays_noop(spark, tmp_path):
    """Chunked streaming ingestion must yield the exact batch
    dictionary (per-batch dfs sum exactly — each doc arrives once),
    and a fresh-checkpoint replay must be a no-op on the txn table."""
    import pyarrow.parquet as pq

    from sparkstreaming_gmall_demo_spark.streaming import pipelines, txn

    sf_dir = "/root/testdata/sf0.01"
    table = pq.read_table(f"{sf_dir}/documents.parquet")
    topic = tmp_path / "docs_topic"
    topic.mkdir()
    step = (table.num_rows + 3) // 4
    for i in range(4):
        pq.write_table(table.slice(i * step, step), str(topic / f"c{i}.parquet"))

    gram_table = str(tmp_path / "gram_df")
    schema = "doc_id long, text string, lang string, source string, n_chars long"

    def run(ckpt: str) -> None:
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(topic))
        )
        q = pipelines.boilerplate_pipeline(
            stream, gram_table, ckpt, n=6, trigger={"availableNow": True}
        )
        q.awaitTermination()

    run(str(tmp_path / "ck1"))
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
    assert got == want and len(want) > 0

    v = txn.current_version(gram_table)
    run(str(tmp_path / "ck2"))  # full replay from a fresh checkpoint
    got2 = sorted(
        (r.gram, r.df)
        for r in pipelines.boilerplate_read_dictionary(
            spark, gram_table, min_df=3
        ).collect()
    )
    assert got2 == want
    assert txn.current_version(gram_table) == v


# ---------------------------------------------------------------------------
# serving envelope
# ---------------------------------------------------------------------------
def test_search_documents_envelope(spark):
    from sparkstreaming_gmall_demo_spark import serving

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    env = serving.search_documents(docs, emb, "spark join window", 0, page=1, size=5)
    assert set(env) == {"total", "page", "size", "hits"}
    assert env["page"] == 1 and env["size"] == 5 and len(env["hits"]) == 5
    # page 1 hits == top-5 of the fused op, same order
    fused = retr_ops.hybrid_rrf(docs, emb, "spark join window", 0, k=5, depth=50)
    assert [h["doc_id"] for h in env["hits"]] == [r.doc_id for r in fused.collect()]
    # total counts BM25 OR-matches
    assert env["total"] == text_ops.bm25_topk(docs, "spark join window", k=2**31 - 1).count()
    # page 2 continues without overlap; beyond depth -> empty
    env2 = serving.search_documents(docs, emb, "spark join window", 0, page=2, size=5)
    assert not set(h["doc_id"] for h in env2["hits"]) & set(
        h["doc_id"] for h in env["hits"]
    )
    deep = serving.search_documents(docs, emb, "spark join window", 0, page=99, size=10)
    assert deep["hits"] == []
    # a keyword that analyzes to zero terms fails up front with a clear
    # ValueError — before the count job, not deep inside bm25_topk
    import pytest

    with pytest.raises(ValueError, match="zero terms"):
        serving.search_documents(docs, emb, "!!! ...", 0, page=1, size=5)


# ---------------------------------------------------------------------------
# reranker stub
# ---------------------------------------------------------------------------
def test_rerank_stub_matches_python_model_and_strict_raises(spark):
    import hashlib

    cand = spark.createDataFrame([(i,) for i in range(7)], ["doc_id"])
    got = {r.doc_id: r.rerank_score
           for r in retr_ops.rerank_stub(cand, "q1").collect()}
    want = {
        i: int(hashlib.md5(f"{i}|q1".encode()).hexdigest()[:8], 16) / 2**32
        for i in range(7)
    }
    assert got == want
    # query-sensitivity: a different query reorders scores
    got2 = {r.doc_id: r.rerank_score
            for r in retr_ops.rerank_stub(cand, "q2").collect()}
    assert got2 != got
    import pytest as _pytest

    with _pytest.raises(Exception):
        retr_ops.rerank_stub(cand, "q1", strict=True).collect()


def test_bm25_analyzer_matches_case_and_punctuation_variants(spark):
    """BM25 runs the same analyzer-lite tokenization as the ES match
    path it models: 'Spark' and 'join,' must match the query."""
    texts = ["Spark outperforms; join, window functions", "nothing relevant here"]
    ids = {
        r["doc_id"]
        for r in text_ops.bm25_topk(_corpus(spark, texts), "spark join", k=10).collect()
    }
    assert ids == {0}


# ---------------------------------------------------------------------------
# persisted BM25 index (operators/bm25index.py + bm25_index_pipeline)
# ---------------------------------------------------------------------------
def test_bm25_index_equals_corpus_scan(spark, sf_dir, tmp_path):
    """The persisted-index scoring path must be bit-identical to the
    corpus-scan bm25_topk — scores, order, ties — across keywords with
    rare terms, common terms, a nonexistent term, and a DUPLICATED
    term (each occurrence contributes its own addend, as the scan
    does)."""
    from sparkstreaming_gmall_demo_spark.operators import bm25index as bi

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    path = str(tmp_path / "bm25idx")
    bi.bm25_write_index(docs, path)
    postings, stats = bi.bm25_read_index(spark, path)
    for kw in ("spark join window", "the", "zz_nonexistent spark", "spark spark"):
        want = [
            (r.doc_id, r.score)
            for r in text_ops.bm25_topk(docs, kw, k=10).collect()
        ]
        got = [
            (r.doc_id, r.score)
            for r in bi.bm25_index_topk(postings, stats, kw, k=10).collect()
        ]
        assert got == want, kw


def test_bm25_index_probe_partition_prunes(spark, sf_dir, tmp_path):
    """The probe must scan ONLY the queried terms' tb= partitions —
    PartitionFilters on the stored layout, the whole point of the
    bucketed postings."""
    from sparkstreaming_gmall_demo_spark.operators import bm25index as bi

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    path = str(tmp_path / "bm25idx")
    bi.bm25_write_index(docs, path)
    postings, stats = bi.bm25_read_index(spark, path)
    probe = bi.bm25_index_topk(postings, stats, "spark join window", k=10)
    plan = probe._jdf.queryExecution().executedPlan().toString()
    pf = plan.split("PartitionFilters")[1][:160]
    assert "tb" in pf and ("IN (" in pf.upper() or "in (" in pf), pf


def test_bm25_index_pipeline_streams_and_replays(spark, sf_dir, tmp_path):
    """3-chunk streaming ingest: the index answers queries identically
    to the corpus-scan over ALL ingested docs; a fresh-checkpoint full
    replay adds nothing (posting rows keyed, stats partials keyed by
    batch id)."""
    import pyarrow.parquet as pq

    from sparkstreaming_gmall_demo_spark.operators import bm25index as bi
    from sparkstreaming_gmall_demo_spark.streaming import pipelines, txn

    table = pq.read_table(f"{sf_dir}/documents.parquet")
    topic = tmp_path / "docs_topic"
    topic.mkdir()
    step = (table.num_rows + 2) // 3
    for i in range(3):
        pq.write_table(table.slice(i * step, step), str(topic / f"c{i}.parquet"))
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    index_path = str(tmp_path / "stream_idx")
    stats_table = str(tmp_path / "stream_stats")

    def run(ckpt):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(topic))
        )
        q = pipelines.bm25_index_pipeline(
            stream, index_path, stats_table, ckpt,
            trigger={"availableNow": True},
        )
        q.awaitTermination()

    run(str(tmp_path / "ck1"))
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    postings = spark.read.parquet(index_path + "/postings")
    stats = pipelines.bm25_read_stats(spark, stats_table)
    for kw in ("spark join window", "the"):
        want = [
            (r.doc_id, r.score)
            for r in text_ops.bm25_topk(docs, kw, k=10).collect()
        ]
        got = [
            (r.doc_id, r.score)
            for r in bi.bm25_index_topk(postings, stats, kw, k=10).collect()
        ]
        assert got == want, kw

    n_postings = postings.count()
    v_stats = txn.current_version(stats_table)
    run(str(tmp_path / "ck2"))  # full replay, fresh checkpoint
    assert spark.read.parquet(index_path + "/postings").count() == n_postings
    assert txn.current_version(stats_table) == v_stats
