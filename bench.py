"""Per-round benchmark: run the declared headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and print ONE JSON line.

Methodology matches BASELINE.md section B: warm timing — each query
runs once untimed (JVM/codegen warm-up, file listing), then the timed
run. ``value`` is the summed warm wall time across queries.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sparkstreaming_gmall_demo_spark.plans import REGISTRY
from sparkstreaming_gmall_demo_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("gmall-bench")
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float | None] = {}
    errors: dict[str, str] = {}
    for name, spec in REGISTRY.items():
        # Warm-up executes the same plan shape end-to-end (collect, not
        # count: count() prunes to a different physical plan and leaves
        # the real query's codegen cold). Three timed fresh builds, best
        # taken -- "warm wall" per BASELINE.md methodology; best-of-3
        # because single-run wall times on this VM vary +/-40%.
        # bench_build (when set) times the operator alone; the declared
        # invariant build stays the driver's correctness entry.
        # Per-query fault isolation: one raising build must not cost the
        # round its entire bench artifact (BENCH_r03 lesson) — record
        # the error, keep timing the rest, always emit the JSON line.
        build = spec.bench_build or spec.build
        try:
            build(spark, sf_dir).collect()
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                build(spark, sf_dir).collect()
                best = min(best, time.perf_counter() - t0)
            timings[name] = round(best, 4)
        except Exception as exc:  # noqa: BLE001 — isolate ANY query fault
            timings[name] = None
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]

    out = {
        "metric": "total_declared_query_warm_wall",
        "value": round(sum(t for t in timings.values() if t is not None), 4),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "", 1).isdigit() else sf,
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
