"""SCD2 maintenance micro-bench (supplementary to bench.py): measures
the round-8 fact-scale claim — a bucketed history rewrite costs
proportional to AFFECTED buckets, not to history size.

Seeds a dimension history (SEED_KEYS keys x 3 observations) through
both writers, then times one maintenance round under three regimes:

  - snapshot_one_key : scd2_apply_batch (full-snapshot swap), 1 key
  - bucketed_one_key : scd2_apply_batch_bucketed, 1 key -> 1 bucket
  - bucketed_all     : scd2_apply_batch_bucketed, keys in every bucket

and verifies proportionality structurally: the one-key round commits
a new version in EXACTLY one bucket table; rows rewritten are that
bucket's slice (~SEED_KEYS/N_BUCKETS keys), vs the snapshot writer's
SEED_KEYS every round.

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

SEED_KEYS = 20_000
N_BUCKETS = 32


def _obs_rows(spark, keys, ts, tag):
    return spark.createDataFrame(
        [(k, t, f"{tag}{k}@{t}") for k in keys for t in ts],
        "uid long, ts long, val string",
    )


def main() -> None:
    spark = get_spark("gmall-scd2-bench")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="gmall_scd2_bench_")
    try:
        keys = list(range(SEED_KEYS))
        seed = _obs_rows(spark, keys, [10, 20, 30], "v")

        # --- snapshot writer -------------------------------------------------
        s_obs, s_hist = os.path.join(work, "s_obs"), os.path.join(work, "s_hist")
        pipelines.scd2_apply_batch(
            seed, s_obs, s_hist, "uid", "ts", ["val"], batch_id=0
        )
        upd = _obs_rows(spark, [7], [40], "w")
        t0 = time.monotonic()
        pipelines.scd2_apply_batch(
            upd, s_obs, s_hist, "uid", "ts", ["val"], batch_id=1
        )
        snapshot_one_key = time.monotonic() - t0
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
        t0 = time.monotonic()
        pipelines.scd2_apply_batch_bucketed(
            _obs_rows(spark, [7], [40], "w"), b_obs, b_root, "uid", "ts",
            ["val"], batch_id=1, n_buckets=N_BUCKETS,
        )
        bucketed_one_key = time.monotonic() - t0
        after = {
            t: txn.current_version(t)
            for t in pipelines.scd2_bucket_tables(b_root)
        }
        one_key_buckets = sum(1 for t in after if after[t] != before.get(t, -1))
        rewritten_table = next(
            t for t in after if after[t] != before.get(t, -1)
        )
        one_bucket_rows = txn.snapshot(spark, rewritten_table).count()

        # a key in every bucket (first N_BUCKETS keys cover all buckets
        # w.h.p.; count what actually got touched)
        spread = _obs_rows(spark, list(range(200)), [50], "x")
        before = dict(after)
        t0 = time.monotonic()
        pipelines.scd2_apply_batch_bucketed(
            spread, b_obs, b_root, "uid", "ts", ["val"],
            batch_id=2, n_buckets=N_BUCKETS,
        )
        bucketed_all = time.monotonic() - t0
        after = {
            t: txn.current_version(t)
            for t in pipelines.scd2_bucket_tables(b_root)
        }
        all_buckets = sum(1 for t in after if after[t] != before.get(t, -1))

        print(
            json.dumps(
                {
                    "metric": "scd2_rewrite_sec",
                    "seed_keys": SEED_KEYS,
                    "n_buckets": N_BUCKETS,
                    "regimes": {
                        "snapshot_one_key": round(snapshot_one_key, 3),
                        "bucketed_one_key": round(bucketed_one_key, 3),
                        "bucketed_spread_200_keys": round(bucketed_all, 3),
                    },
                    "rows_rewritten": {
                        "snapshot_one_key": snapshot_rows,
                        "bucketed_one_key": one_bucket_rows,
                    },
                    "buckets_rewritten": {
                        "bucketed_one_key": one_key_buckets,
                        "bucketed_spread_200_keys": all_buckets,
                    },
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
