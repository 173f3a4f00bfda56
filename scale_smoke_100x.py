"""100x scale smoke for the bounded-design operators (VERDICT r8 item
6): the 10x smoke (scale_smoke.py) showed these six at <= 2x wall on
10x data, but a slow quadratic can hide inside that headroom — 32
cores absorb a 10x row-count almost for free. At 100x (500k docs /
200k vectors from the sf0.1 fixtures, key-shifted copies) the same
plans must still track the scan: the bar is wall(100x) <= ~100x
wall(1x), and a healthy plan on 32 underutilized-at-1x cores lands
FAR under it.

The six are exactly the operators whose 100 TB design claims O(1)
post-scan state — broadcast corpus stats (bm25), depth-bounded fusion
(hybrid_rrf), zero-shuffle scoring (hashed_classifier), digest-only
rollups (source_dedup), broadcast hashed weights (dsir_score), and
the map-only BLAS index scan against a pinned probe pack
(cosine_scan).

Round 10 adds ONE blowup-regime row (VERDICT r9 item 6): the MinHash
near-dup kernel at 100x VERBATIM twins, where true pair volume is
quadratic in copies — its bar is not the linear wall ratio (output
blowup makes that meaningless) but that the plan survives: pipelined
pair generation, bounded in-row blowup via the max_bucket salting cap
(Observation-recorded), and narrow shuffles only. The other blowup
kernels (containment, winnowing_pairs) remain excluded: their
candidate volume — not just output — is quadratic in copies, and the
documented composition (exact-dedup first) is the production answer.

Prints ONE JSON line:
  {"metric": "scale_smoke_100x_ratio", "sec_1x": {...},
   "sec_100x": {...}, "ratio": {...}, "max_ratio": N,
   "pair_kernel": {...}}
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from scale_smoke import amplify, timed
from sparkstreaming_gmall_demo_spark.operators import dedup as dedup_ops
from sparkstreaming_gmall_demo_spark.operators import importance as imp_ops
from sparkstreaming_gmall_demo_spark.operators import retrieval as retr_ops
from sparkstreaming_gmall_demo_spark.operators import similarity as sim_ops
from sparkstreaming_gmall_demo_spark.operators import text as text_ops
from sparkstreaming_gmall_demo_spark.session import get_spark
from sparkstreaming_gmall_demo_spark.sources.fixtures import load_table, spread_fixture

COPIES = 100


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("gmall-scale-smoke-100x")
    spark.sparkContext.setLogLevel("ERROR")

    docs1 = spread_fixture(load_table(spark, sf_dir, "documents"))
    emb1 = spread_fixture(load_table(spark, sf_dir, "embeddings"), "vec_id")
    docs100 = amplify(docs1, ["doc_id"], COPIES)
    emb100 = amplify(emb1, ["vec_id"], COPIES)

    # frozen artifacts (the gate's offline-codebook discipline): only
    # the INDEX side amplifies; probe pack pinned from the 1x corpus
    cents_sm = sim_ops.ivf_train(emb1, k=16, iters=2)
    _probe_rows = (
        sim_ops.ivf_probe_clusters(emb1.limit(500), cents_sm, 2)
        .withColumn("nrm", F.expr(sim_ops.NORM.format(a="embedding")))
        .select("vec_id", "probe_clusters", "embedding", "nrm")
        .collect()
    )
    probe_pack = sim_ops.pack_probe_matrices(
        (p[0], c, p[2], p[3]) for p in _probe_rows for c in p[1]
    )

    runs = {}
    for tag, dc, em in (("1x", docs1, emb1), ("100x", docs100, emb100)):
        r: dict[str, float] = {}
        timed("cosine_scan", lambda: (
            sim_ops.cosine_match_scan_packed(
                sim_ops.ivf_probe_clusters(em, cents_sm, 1)
                .withColumn(
                    "cluster", F.element_at("probe_clusters", 1).cast("int")
                )
                .withColumn("nrm", F.expr(sim_ops.NORM.format(a="embedding")))
                .select("cluster", "embedding", "nrm"),
                probe_pack, 0.95,
            ).agg(F.count("*").alias("n"))
        ), r)
        timed("bm25", lambda: (
            text_ops.bm25_topk(dc, "spark join window", k=10)
            .agg(F.count("*").alias("n"), F.sum("score").alias("s"))
        ), r)
        timed("hybrid_rrf", lambda: (
            retr_ops.hybrid_rrf(dc, em, "spark join window",
                                query_vec_id=1, k=10, depth=50)
            .agg(F.count("*").alias("n"), F.sum("rrf").alias("s"))
        ), r)
        timed("hashed_classifier", lambda: (
            text_ops.hashed_classifier_gate(dc)
            .agg(F.sum("n_docs").alias("n"), F.sum("sum_score").alias("s"))
        ), r)
        timed("source_dedup", lambda: (
            dedup_ops.source_dedup_report(dc)
            .agg(F.sum("n_docs").alias("n"), F.sum("cross_src_fps").alias("x"))
        ), r)
        tgt = dc.filter(F.col("source") == "src0")
        pool = dc.filter(F.col("source") != "src0")
        timed("dsir_score", lambda: (
            imp_ops.dsir_scores(pool, imp_ops.dsir_weights(tgt, pool))
            .agg(F.count("*").alias("n"), F.sum("score_micro").alias("s"))
        ), r)
        runs[tag] = r

    ratios = {k: round(runs["100x"][k] / runs["1x"][k], 1) for k in runs["1x"]}

    # Pair-heavy kernel at 100x VERBATIM twins (VERDICT r9 item 6):
    # amplify() copies keep text IDENTICAL, so every document gains 99
    # verbatim twins — the adversarial regime where true pair volume
    # is inherently quadratic in copies (a 100-copy group alone is
    # C(100,2) = 4950 real pairs). What must stay bounded is the PLAN:
    # banding fans each bucket's pairs out through a pipelined
    # generate->project (ids + jaccard survive, the hs structs never
    # materialize as a dataset), the max_bucket salting cap bounds
    # in-row blowup (recorded via the Observation below), and the only
    # full-width shuffles move (i, j, jaccard) triples. The recorded
    # row is wall + OUTPUT pair blowup + cap engagement — wall tracks
    # pair volume here, not rows, by design; the production recipe for
    # a verbatim-heavy corpus remains exact-dedup FIRST (the documented
    # composition), which collapses this regime back to ~1x volume.
    import time as _time

    from pyspark.sql import Observation

    pair_runs = {}
    for tag, dc in (("1x", docs1), ("100x", docs100)):
        obs = Observation(f"salting_{tag}")
        from sparkstreaming_gmall_demo_spark.operators import neardup as nd_ops

        t0 = _time.perf_counter()
        n_pairs = (
            nd_ops.minhash_near_duplicates(dc, overflow_obs=obs)
            .agg(F.count("*").alias("n"))
            .collect()[0][0]
        )
        wall = _time.perf_counter() - t0
        got = obs.get
        pair_runs[tag] = {
            "wall_sec": round(wall, 2),
            "pairs": int(n_pairs),
            "oversize_buckets": int(got.get("oversize_buckets") or 0),
            "oversize_members": int(got.get("oversize_members") or 0),
        }
    pair_kernel = {
        "kernel": "minhash_near_duplicates (verbatim twins)",
        "1x": pair_runs["1x"],
        "100x": pair_runs["100x"],
        "wall_ratio": round(
            pair_runs["100x"]["wall_sec"] / max(pair_runs["1x"]["wall_sec"], 1e-9), 1
        ),
        "pair_blowup": round(
            pair_runs["100x"]["pairs"] / max(pair_runs["1x"]["pairs"], 1), 1
        ),
        "max_bucket": nd_ops.DEFAULT_MAX_BUCKET,
    }

    print(json.dumps({
        "metric": "scale_smoke_100x_ratio",
        "copies": COPIES,
        "sec_1x": runs["1x"],
        "sec_100x": runs["100x"],
        "ratio": ratios,
        "max_ratio": max(ratios.values()),
        "linear_bar": COPIES,
        "pair_kernel": pair_kernel,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
