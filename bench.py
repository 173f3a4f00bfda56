"""Per-round benchmark: run the declared headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and print ONE JSON line.

Methodology matches BASELINE.md section B: warm timing — each query
runs once untimed (JVM/codegen warm-up, file listing), then the timed
run. ``value`` is the summed warm wall time across ALL registry
queries.

Emission contract (BENCH_r04 lesson): the driver records only the
LAST ~2000 characters of stdout and parses the final JSON line — a
101-entry full-precision line overflows that window and arrives
head-truncated (``parsed: null``). So the printed line is compact
(no spaces, 3-dp) and carries per-query timings for the DRIVER WINDOW
(the first _DRIVER_CAP registry entries — the same 50 the correctness
driver checks); it is printed LAST and self-checked against the
capture budget. The full-precision, all-queries record (timings +
errors) is written to the ``BENCH_full_latest.json`` sidecar every
run. That file is gitignored (VERDICT r11 item 7: driver bench runs
used to clobber the committed ``BENCH_full.json`` and leave the tree
dirty); the committed ``BENCH_full.json`` is a curated copy refreshed
at round close.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sparkstreaming_gmall_demo_spark.plans import _DRIVER_CAP, REGISTRY
from sparkstreaming_gmall_demo_spark.session import get_spark

# The driver's stdout capture window (observed 2000 chars in
# BENCH_r04); leave headroom for a trailing newline / stray log line.
_LINE_BUDGET = 1900


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("gmall-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm-up pass: executes the same plan shape end-to-end (collect,
    # not count: count() prunes to a different physical plan and leaves
    # the real query's codegen cold). bench_build (when set) times the
    # operator alone; the declared invariant build stays the driver's
    # correctness entry. Per-query fault isolation: one raising build
    # must not cost the round its entire bench artifact (BENCH_r03
    # lesson) — record the error, keep timing the rest, always emit the
    # JSON line.
    timings: dict[str, float | None] = {}
    spreads: dict[str, float] = {}
    errors: dict[str, str] = {}
    builds = {}
    for name, spec in REGISTRY.items():
        build = spec.bench_build or spec.build
        try:
            build(spark, sf_dir).collect()
            builds[name] = build
            timings[name] = float("inf")
        except Exception as exc:  # noqa: BLE001 — isolate ANY query fault
            timings[name] = None
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]

    # Timed passes are INTERLEAVED (round-robin over all queries, N full
    # sweeps, min per query) rather than back-to-back per query: a
    # transient box-load spike then inflates at most one rep of each
    # query instead of all reps of whichever query it lands on, so a
    # single loaded-VM window can't fabricate a 3x reading on untouched
    # code (BENCH_r10 lesson; same discipline bench_gate.py uses).
    # worst/best spread per query is recorded to the sidecar so a noisy
    # run is distinguishable from a plan regression after the fact.
    n_reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    worsts: dict[str, float] = {}
    for _ in range(n_reps):
        for name, build in builds.items():
            try:
                t0 = time.perf_counter()
                build(spark, sf_dir).collect()
                dt = time.perf_counter() - t0
            except Exception as exc:  # noqa: BLE001
                timings[name] = None
                errors[name] = f"{type(exc).__name__}: {exc}"[:500]
                continue
            if timings[name] is not None:
                timings[name] = min(timings[name], dt)
                worsts[name] = max(worsts.get(name, 0.0), dt)
    for name, t in list(timings.items()):
        if t is not None:
            timings[name] = round(t, 4)
            if worsts.get(name):
                spreads[name] = round(worsts[name] / max(t, 1e-9), 2)

    sf_val = float(sf) if sf.replace(".", "", 1).isdigit() else sf
    total = round(sum(t for t in timings.values() if t is not None), 4)

    # Full-precision sidecar: every query, every error, machine-readable
    # regardless of the driver's capture window.
    full = {
        "metric": "total_declared_query_warm_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
        "n_queries": len(timings),
        "reps": n_reps,
        "spread_worst_over_best": spreads,
    }
    if errors:
        full["errors"] = errors
    sidecar = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_full_latest.json"
    )
    with open(sidecar, "w") as f:
        json.dump(full, f, indent=1)

    # Compact driver line: window timings at 3 dp, no spaces, LAST line.
    window = list(REGISTRY)[:_DRIVER_CAP]
    out = {
        "metric": "total_declared_query_warm_wall",
        "value": total,
        "unit": "sec",
        "queries": {
            n: (round(timings[n], 3) if timings[n] is not None else None)
            for n in window
        },
        "sf": sf_val,
        "n_queries": len(timings),
        "n_errors": len(errors),
        "full": "BENCH_full_latest.json",
    }
    line = json.dumps(out, separators=(",", ":"))
    # Self-check: never emit a line the driver's tail capture would
    # behead. Shed window entries from the TAIL (the head holds the
    # core sentinels; the full record lives in the sidecar) until the
    # line fits.
    while len(line) > _LINE_BUDGET and out["queries"]:
        out["queries"].popitem()
        out["n_dropped"] = len(timings) - len(out["queries"])
        line = json.dumps(out, separators=(",", ":"))
    spark.stop()
    print(line)


if __name__ == "__main__":
    main()
