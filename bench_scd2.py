"""SCD2 maintenance micro-bench (supplementary to bench.py): measures
the round-8 fact-scale claim — a bucketed history rewrite costs
proportional to AFFECTED buckets, not to history size.

Seeds a dimension history (SEED_KEYS keys x 3 observations) through
both writers, then times one maintenance round under three regimes:

  - snapshot_one_key : scd2_apply_batch (full-snapshot swap), 1 key
  - bucketed_one_key : scd2_apply_batch_bucketed, 1 key -> 1 bucket
  - bucketed_spread  : scd2_apply_batch_bucketed, 16 keys -> <=16 of
    256 buckets (touched << n_buckets)

each timed as min-of-5 rounds over distinct keys (the one-key regimes; this VM's single-run swing is 2-3x) (see _best_of), and
verifies proportionality structurally: a one-key round commits a new
version in EXACTLY one bucket table; rows rewritten are that bucket's
slice (~SEED_KEYS/N_BUCKETS keys x 3 obs), vs the snapshot writer's
full history every round.

Prints ONE JSON line:
  {"metric": "scd2_rewrite_sec", ..., "regimes": {...},
   "rows_rewritten": {...}, "buckets_rewritten": {...}}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sparkstreaming_gmall_demo_spark.session import get_spark
from sparkstreaming_gmall_demo_spark.streaming import pipelines, txn

# Sized so rewrite I/O dominates Spark's per-job fixed cost (the r8
# regime at 20k keys / 32 buckets was fixed-cost-bound and showed row
# proportionality only): 800k keys x 3 obs = 2.4M-row history, 256
# buckets -> a one-key round rewrites ~1/256 of the history where the
# snapshot writer rewrites all of it.
SEED_KEYS = 800_000
N_BUCKETS = 256


def _obs_rows(spark, keys, ts, tag):
    """Observation batch with a ~512-char incompressible payload (eight
    chained sha2 hexes of the row key): at a 3-byte payload the bench
    is Spark-fixed-cost-bound and the full-history rewrite the
    snapshot writer pays per apply is invisible (the r8 regime). Built
    distributed — a driver-side createDataFrame of 600k wide rows
    would bench py4j serialization, not the writers."""
    from pyspark.sql import functions as F

    keys = list(keys)
    if len(keys) <= 1024:
        keys_df = spark.range(len(keys)).toDF("i").select(
            F.element_at(
                F.array(*[F.lit(k) for k in keys]), F.col("i").cast("int") + 1
            ).alias("uid")
        )
    elif keys == list(range(keys[0], keys[0] + len(keys))):
        # contiguous big key sets ride spark.range + offset; anything
        # else would silently bench the WRONG uids (round-9 review)
        keys_df = spark.range(len(keys)).toDF("uid").select(
            (F.col("uid") + F.lit(keys[0])).alias("uid")
        )
    else:
        raise ValueError("large non-contiguous key sets are not supported")
    return keys_df.select(
        F.col("uid").cast("long").alias("uid"),
        F.explode(F.array(*[F.lit(t) for t in ts])).alias("ts"),
    ).select(
        "uid",
        F.col("ts").cast("long").alias("ts"),
        F.concat(
            F.lit(tag),
            F.sha2(F.concat_ws("@", "uid", "ts"), 256),
            F.sha2(F.concat_ws("#", "uid", "ts"), 256),
            F.sha2(F.concat_ws("%", "uid", "ts"), 256),
            F.sha2(F.concat_ws("&", "uid", "ts"), 256),
            F.sha2(F.concat_ws("^", "uid", "ts"), 256),
            F.sha2(F.concat_ws("!", "uid", "ts"), 256),
            F.sha2(F.concat_ws("~", "uid", "ts"), 256),
            F.sha2(F.concat_ws("+", "uid", "ts"), 256),
        ).alias("val"),
    )


def _best_of(rounds):
    """min wall over ``rounds`` one-arg thunks (each doing REAL work on
    distinct keys/batch ids): single-shot timings on a shared machine
    swing 2x+ on scheduler/GC noise (measured 1.5 s vs 3.7 s for the
    identical one-key apply back-to-back); the min over rounds reports the
    steady-state cost the regime actually has."""
    best = None
    for fn in rounds:
        t0 = time.monotonic()
        fn()
        dt = time.monotonic() - t0
        best = dt if best is None else min(best, dt)
    return best


def main() -> None:
    spark = get_spark("gmall-scd2-bench")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="gmall_scd2_bench_")
    try:
        seed = _obs_rows(spark, range(SEED_KEYS), [10, 20, 30], "v")

        # --- snapshot writer -------------------------------------------------
        s_obs, s_hist = os.path.join(work, "s_obs"), os.path.join(work, "s_hist")
        pipelines.scd2_apply_batch(
            seed, s_obs, s_hist, "uid", "ts", ["val"], batch_id=0
        )
        snapshot_one_key = _best_of([
            (lambda k=k, i=i: pipelines.scd2_apply_batch(
                _obs_rows(spark, [k], [40], "w"), s_obs, s_hist,
                "uid", "ts", ["val"], batch_id=i,
            ))
            for i, k in enumerate([7, 8, 9, 11, 12], start=1)
        ])
        snapshot_rows = txn.snapshot(spark, s_hist).count()

        # --- bucketed writer -------------------------------------------------
        b_obs, b_root = os.path.join(work, "b_obs"), os.path.join(work, "b_hist")
        pipelines.scd2_apply_batch_bucketed(
            seed, b_obs, b_root, "uid", "ts", ["val"],
            batch_id=0, n_buckets=N_BUCKETS,
        )
        before = {
            t: txn.current_version(t)
            for t in pipelines.scd2_bucket_tables(b_root)
        }
        bucketed_one_key = _best_of([
            (lambda k=k, i=i: pipelines.scd2_apply_batch_bucketed(
                _obs_rows(spark, [k], [40], "w"), b_obs, b_root, "uid",
                "ts", ["val"], batch_id=i, n_buckets=N_BUCKETS,
            ))
            for i, k in enumerate([7, 8, 9, 11, 12], start=1)
        ])
        after = {
            t: txn.current_version(t)
            for t in pipelines.scd2_bucket_tables(b_root)
        }
        moved = [t for t in after if after[t] != before.get(t, -1)]
        # five one-key rounds -> at most five buckets moved, each by
        # exactly one version; report per-round proportionality
        one_key_buckets = max(
            after[t] - before.get(t, -1) for t in moved
        )
        one_bucket_rows = max(
            txn.snapshot(spark, t).count() for t in moved
        )

        # a spread round touching a handful of buckets (<< n_buckets):
        # 16 keys land in <= 16 of 256 buckets
        bucketed_all = None
        for i, lo in enumerate([0, 16, 32], start=4):
            before = {
                t: txn.current_version(t)
                for t in pipelines.scd2_bucket_tables(b_root)
            }
            t0 = time.monotonic()
            pipelines.scd2_apply_batch_bucketed(
                _obs_rows(spark, list(range(lo, lo + 16)), [50 + lo], "x"),
                b_obs, b_root, "uid", "ts", ["val"],
                batch_id=i, n_buckets=N_BUCKETS,
            )
            dt = time.monotonic() - t0
            bucketed_all = dt if bucketed_all is None else min(bucketed_all, dt)
            after = {
                t: txn.current_version(t)
                for t in pipelines.scd2_bucket_tables(b_root)
            }
            # per-round structural check: 16 fresh keys -> <= 16 buckets
            all_buckets = sum(
                1 for t in after if after[t] != before.get(t, -1)
            )

        print(
            json.dumps(
                {
                    "metric": "scd2_rewrite_sec",
                    "seed_keys": SEED_KEYS,
                    "n_buckets": N_BUCKETS,
                    "regimes": {
                        "snapshot_one_key": round(snapshot_one_key, 3),
                        "bucketed_one_key": round(bucketed_one_key, 3),
                        "bucketed_spread_16_keys": round(bucketed_all, 3),
                    },
                    "rows_rewritten": {
                        "snapshot_one_key": snapshot_rows,
                        "bucketed_one_key": one_bucket_rows,
                    },
                    "wall_ratio_one_key": round(
                        bucketed_one_key / snapshot_one_key, 3
                    ),
                    "buckets_rewritten": {
                        "bucketed_one_key": one_key_buckets,
                        "bucketed_spread_16_keys": all_buckets,
                    },
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
