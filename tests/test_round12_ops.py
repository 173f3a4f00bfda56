"""Round-12 tests.

Pins for the r11 VERDICT items:

(2) the r12 driver-window literal recomputed from the committed
    r01..r11 ledger through the formal rotation policy — this
    rotation retires the r8 staleness floor (all 18 r8 entries
    seated; ledger floor outside the window moves to r9);
(3) ext_pq_bigksub_encode — the PQ Arrow/BLAS encode backend as a
    declared entry: the registered codebooks must actually cross the
    _PROBE_FOLD_MAX_ELEMENTS boundary (so the driver's green row
    gates the numpy path, not the SQL fold), and its physical plan
    must be the Arrow mapInPandas encode;
(6) crash-injection for the two-phase vacuum tombstone protocol:
    a sweep killed between tombstone-rename and healer, and between
    recheck and rmtree, must converge under a restarted sweep +
    commit with no lost staged dir.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# Driver-window rotation: the r12 literal IS the policy's output
# (VERDICT r11 item 2 — this rotation retires the r8 staleness floor)


def test_driver_window_matches_rotation_policy():
    """The frozen 50-entry driver window literal in plans/__init__.py
    must BE the output of the formal rotation policy
    (window_policy.driver_window) over the committed r01..r11 ledger —
    sentinels every round, never-seated first (the large-codebook BLAS
    PQ encode and the IVF-PQ composite, both registered this round),
    then stalest-first. A hand-edited window that drifts from the
    policy fails here."""
    import glob
    import re

    import sparkstreaming_gmall_demo_spark.plans as plans
    from sparkstreaming_gmall_demo_spark.plans import window_policy as wp

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # pinned to the r01..r11 inputs the r12 window was generated from —
    # later rounds' files (written by the driver after this freeze)
    # must not retroactively change what this round shipped
    paths = {}
    for f in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        if rnd <= 11:
            paths[rnd] = f
    assert len(paths) == 11, "committed ledger files r01..r11 expected"
    ledger = wp.ledger_from_files(paths)
    expected = wp.driver_window(sorted(plans.REGISTRY), ledger)
    assert list(plans.REGISTRY)[:50] == expected
    # the r8 staleness floor is retired: every entry whose newest green
    # was r8 (and the never-seated PQ encode entry) is seated this round
    seated = set(expected)
    for name in plans.REGISTRY:
        rnd = ledger.get(name, -1)
        if rnd in (-1, 8):
            assert name in seated, f"{name} (newest green r{rnd}) not seated"
    # and nothing outside the window is staler than r9
    for name in plans.REGISTRY:
        if name not in seated:
            assert ledger.get(name, -1) >= 9, f"{name} outside window but pre-r9"


# ---------------------------------------------------------------------------
# VERDICT r11 item 3: the declared PQ BLAS encode entry must actually
# cross the backend boundary and run the Arrow path


def test_pq_bigksub_entry_crosses_fold_boundary():
    from sparkstreaming_gmall_demo_spark.operators import similarity as sim
    from sparkstreaming_gmall_demo_spark.plans import extensions as ext

    books = ext._bigksub_codebooks()
    m = len(books)
    ksub = len(books[0])
    dsub = len(books[0][0])
    assert (m, ksub, dsub) == (ext.BIGKSUB_M, ext.BIGKSUB_KSUB, ext.BIGKSUB_DSUB)
    total = m * ksub * dsub
    assert total > sim._PROBE_FOLD_MAX_ELEMENTS, (
        f"{total} codebook elements does not cross the "
        f"{sim._PROBE_FOLD_MAX_ELEMENTS} boundary — the driver row would "
        "gate the SQL fold, not the BLAS backend"
    )
    # the codebooks are exact slices of the shared integer-formula
    # generator, the property the oracle SQL re-derives
    cents = sim.uniform_centroids(ksub, m * dsub)
    for s in range(m):
        for c in range(ksub):
            assert books[s][c] == cents[c][s * dsub : (s + 1) * dsub]


def test_pq_bigksub_entry_plan_is_arrow_encode(spark):
    """The declared entry's physical plan must contain the Arrow
    mapInPandas encode (the BLAS backend) and no SQL fold: a silent
    boundary-constant bump or a codebook shrink would revert the entry
    to gating the interpreted path."""
    from sparkstreaming_gmall_demo_spark.plans import REGISTRY

    df = REGISTRY["ext_pq_bigksub_encode"].build(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan, "BLAS encode path not in plan"
    assert "aggregate(zip_with" not in plan, "interpreted SQL fold leaked into plan"


def test_pq_bigksub_encode_values_match_sql_fold(spark):
    """Backend parity at the ENTRY's own codebooks: the BLAS codes for
    a fixture slice must equal the SQL fold's codes computed on the
    same vectors with the boundary constant lifted out of the way
    (monkeypatch-free: call the fold twin directly on a small slice)."""
    from sparkstreaming_gmall_demo_spark.operators import similarity as sim
    from sparkstreaming_gmall_demo_spark.plans import extensions as ext
    from sparkstreaming_gmall_demo_spark.sources.fixtures import load_table

    books = ext._bigksub_codebooks()
    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings").limit(40)
    blas = {
        r.vec_id: list(r.codes)
        for r in sim._pq_encode_numpy(emb, books, "vec_id", "embedding").collect()
    }
    # force the SQL fold by calling the fold body through a boundary
    # large enough to not reroute: temporarily raise the constant
    old = sim._PROBE_FOLD_MAX_ELEMENTS
    sim._PROBE_FOLD_MAX_ELEMENTS = 10**9
    try:
        fold = {
            r.vec_id: list(r.codes)
            for r in sim.pq_encode(emb, books, "vec_id", "embedding").collect()
        }
    finally:
        sim._PROBE_FOLD_MAX_ELEMENTS = old
    assert blas == fold


# ---------------------------------------------------------------------------
# VERDICT r11 item 6: crash-inject the two-phase vacuum. The protocol's
# promise is that the destructive rmtree is separated from the
# stage-to-commit race window by a FULL min_age_s even when the sweep
# process dies mid-protocol; these tests kill it at both seams.

import time

from sparkstreaming_gmall_demo_spark.streaming import txn


class _SweepKilled(BaseException):
    """Simulated kill -9 of the sweep process at an injected seam —
    BaseException so no library except-clause can swallow it."""


def _mk_table_with_aged_orphan(spark, tmp_path):
    t = str(tmp_path / "t")
    txn.merge_keyed(spark.createDataFrame([(1, "x")], "k long, v string"), t, ["k"])
    txn._orphan_live_cache.pop(t, None)
    staged = txn._stage(spark.createDataFrame([(2, "y")], "k long, v string"), t)
    orphan = os.path.join(t, "_staged", staged[0].split(os.sep)[1])
    old = time.time() - 7200
    os.utime(orphan, (old, old))
    for n in os.listdir(orphan):
        os.utime(os.path.join(orphan, n), (old, old))
    return t, staged, orphan


def test_sweep_killed_after_phase1_rename_keeps_second_age_gate(
    spark, tmp_path, monkeypatch
):
    """Kill the sweep IMMEDIATELY after the phase-1 rename syscall (the
    narrowest window between tombstone creation and sweep return). The
    tombstone must be born freshly stamped — stamp-then-rename — so a
    RESTARTED sweep does not reclaim it until a further full age gate;
    pre-fix (rename-then-stamp) the crash left an already-aged
    tombstone and the restart deleted a slow stager's data one commit
    too early."""
    t, staged, orphan = _mk_table_with_aged_orphan(spark, tmp_path)
    real_rename = os.rename

    def rename_then_die(src, dst):
        real_rename(src, dst)
        raise _SweepKilled

    monkeypatch.setattr(txn.os, "rename", rename_then_die)
    try:
        txn.vacuum_orphans(t, min_age_s=3600)
        raise AssertionError("injected kill did not fire")
    except _SweepKilled:
        pass
    finally:
        monkeypatch.setattr(txn.os, "rename", real_rename)
    tomb = orphan + ".tomb"
    assert not os.path.exists(orphan) and os.path.isdir(tomb)
    # the crash-surviving tombstone is FRESH: the stamp preceded the
    # rename, so the second age gate starts now, not 2h ago
    assert time.time() - os.path.getmtime(tomb) < 600
    # restarted sweep: must NOT reclaim inside the second gate
    assert txn.vacuum_orphans(t, min_age_s=3600) == 0
    assert os.path.isdir(tomb)
    # the slow stager's commit lands: committer-side healer restores
    v = txn.current_version(t)
    base = txn._read_manifest(t, v)
    assert txn._try_commit(t, v + 1, base + staged, dict(txn.table_meta(t)))
    assert os.path.isdir(orphan) and not os.path.exists(tomb)
    assert txn.snapshot(spark, t).count() == 2
    # converged: a further restarted sweep has nothing to act on
    txn._orphan_live_cache.pop(t, None)
    assert txn.vacuum_orphans(t, min_age_s=3600) == 0
    assert txn.snapshot(spark, t).count() == 2


def test_sweep_killed_before_rmtree_then_commit_converges(
    spark, tmp_path, monkeypatch
):
    """Kill the sweep between the phase-2 recheck and the rmtree: the
    aged tombstone survives. A commit that then references the dir
    restores it (committer healer), and a restarted sweep finds the
    base uuid live and leaves it — no lost staged dir."""
    t, staged, orphan = _mk_table_with_aged_orphan(spark, tmp_path)
    tomb = orphan + ".tomb"
    assert txn.vacuum_orphans(t, min_age_s=3600) == 1  # phase 1
    old = time.time() - 7200
    os.utime(tomb, (old, old))  # age past the second gate
    import shutil

    real_rmtree = shutil.rmtree

    def die_at_rmtree(path, **kw):
        raise _SweepKilled

    monkeypatch.setattr(shutil, "rmtree", die_at_rmtree)
    try:
        txn.vacuum_orphans(t, min_age_s=3600)
        raise AssertionError("injected kill did not fire")
    except _SweepKilled:
        pass
    finally:
        monkeypatch.setattr(shutil, "rmtree", real_rmtree)
    assert os.path.isdir(tomb)  # nothing deleted at the kill point
    # the slow stager's commit lands after the crash
    v = txn.current_version(t)
    base = txn._read_manifest(t, v)
    assert txn._try_commit(t, v + 1, base + staged, dict(txn.table_meta(t)))
    assert os.path.isdir(orphan) and not os.path.exists(tomb)
    # restarted sweep: base uuid is live, nothing reclaimed, data intact
    txn._orphan_live_cache.pop(t, None)
    assert txn.vacuum_orphans(t, min_age_s=3600) == 0
    assert txn.snapshot(spark, t).count() == 2


def test_sweep_killed_before_rmtree_then_restart_reclaims_true_orphan(
    spark, tmp_path, monkeypatch
):
    """Same kill point, but the dir really is an orphan (no commit ever
    references it): the restarted sweep converges to reclamation —
    crash recovery must not leak the dir forever either."""
    t, staged, orphan = _mk_table_with_aged_orphan(spark, tmp_path)
    tomb = orphan + ".tomb"
    assert txn.vacuum_orphans(t, min_age_s=3600) == 1
    old = time.time() - 7200
    os.utime(tomb, (old, old))
    import shutil

    real_rmtree = shutil.rmtree
    monkeypatch.setattr(
        shutil, "rmtree", lambda path, **kw: (_ for _ in ()).throw(_SweepKilled())
    )
    try:
        txn.vacuum_orphans(t, min_age_s=3600)
        raise AssertionError("injected kill did not fire")
    except _SweepKilled:
        pass
    finally:
        monkeypatch.setattr(shutil, "rmtree", real_rmtree)
    assert os.path.isdir(tomb)
    assert txn.vacuum_orphans(t, min_age_s=3600) == 1  # restart reclaims
    assert not os.path.exists(tomb) and not os.path.exists(orphan)
    assert txn.snapshot(spark, t).count() == 1  # committed data untouched


# ---------------------------------------------------------------------------
# VERDICT r11 item 5: bench_streaming reps are interleaved across
# pipelines with per-pipeline spread sidecars


def test_streaming_bench_source_interleaves_reps_and_records_spread():
    """Shape pin (the streaming bench runs at sf0.1 and is
    driver-invoked, so this asserts the source contract, not a
    timing): the headline loop is rep-major over pipelines
    (round-robin — rep 0 of every pipeline before rep 1 of any), each
    rep replays into tag-keyed fresh dirs, and the emitted record
    carries the per-pipeline best/worst spread."""
    src = open(
        os.path.join(os.path.dirname(__file__), "..", "bench_streaming.py")
    ).read()
    assert "for rep in range(n_reps):" in src
    assert "for name, rows, maker in headline:" in src
    assert src.index("for rep in range(n_reps):") < src.index(
        "for name, rows, maker in headline:"
    )
    assert '"spread_best_over_worst"' in src
    # per-rep state isolation: index/ckpt dirs are tag-keyed
    assert 'os.path.join(work, f"novelty_gate_{tag}", "fp_index")' in src


# ---------------------------------------------------------------------------
# Beyond-verdict round-12 addition: the IVF-PQ composite ANN entry


def test_ivfpq_topk_self_query_and_shape(spark):
    """The query vector's own cell is by construction the nearest
    coarse centroid (always probed), its PQ codes exist, and its exact
    re-ranked distance to itself is 0.0 — so the composite must return
    the query as rank 1 with l2sq 0.0, and exactly TOPK_K rows. A
    probe-cell or shortlist regression (e.g. a tie-rule drift between
    the driver-side probe and ivf_probe_clusters) breaks self-recall
    first."""
    from sparkstreaming_gmall_demo_spark.plans import REGISTRY
    from sparkstreaming_gmall_demo_spark.plans import extensions as ext

    rows = (
        REGISTRY["ext_ivfpq_topk"]
        .build(spark, "/root/testdata/sf0.001")
        .collect()
    )
    assert len(rows) == ext.TOPK_K
    assert rows[0].vec_id == ext.TOPK_QUERY_VEC_ID
    assert rows[0].l2sq == 0.0
    # distances are ordered and distinct-id
    dists = [r.l2sq for r in rows]
    assert dists == sorted(dists)
    assert len({r.vec_id for r in rows}) == len(rows)


def test_ivfpq_driver_probe_matches_probe_clusters_tie_rule(spark):
    """ivfpq_topk computes the query's probe cells DRIVER-side (tiny
    codebook, pure python) — that list must equal ivf_probe_clusters'
    distributed answer for the same query under the same sorted-(d, c)
    rule, or the oracle's qcell CTE and the Spark build diverge."""
    from sparkstreaming_gmall_demo_spark.operators import similarity as sim
    from sparkstreaming_gmall_demo_spark.plans import extensions as ext
    from sparkstreaming_gmall_demo_spark.sources.fixtures import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    cents = sim.uniform_centroids(ext.IVFPQ_COARSE_K, 64)
    q = emb.filter(F.col("vec_id") == ext.TOPK_QUERY_VEC_ID)
    distributed = (
        sim.ivf_probe_clusters(q, cents, ext.IVFPQ_NPROBE)
        .select("probe_clusters")
        .collect()[0][0]
    )
    qv = [float(x) for x in q.select("embedding").collect()[0][0]]
    dists = [
        (sum((qv[j] - c[j]) ** 2 for j in range(len(c))), ci)
        for ci, c in enumerate(cents)
    ]
    driver_side = [ci for _, ci in sorted(dists)[: ext.IVFPQ_NPROBE]]
    assert list(distributed) == driver_side


def test_ivfpq_stored_scan_is_partition_pruned(spark, tmp_path):
    """The stored-code-table query path must push the probe cells as
    PARTITION filters on the cluster= layout — the nprobe/k_coarse
    file-skip IS the IVF read story at 100 TB; a plan that scans all
    cells silently degrades to a full-corpus ADC."""
    from sparkstreaming_gmall_demo_spark.operators import similarity as sim
    from sparkstreaming_gmall_demo_spark.plans import extensions as ext
    from sparkstreaming_gmall_demo_spark.sources.fixtures import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    cents = sim.uniform_centroids(ext.IVFPQ_COARSE_K, 64)
    books = ext._bigksub_codebooks()
    path = str(tmp_path / "codes")
    sim.ivfpq_write_index(emb, cents, books, path)
    q = sim.query_vector(emb, ext.TOPK_QUERY_VEC_ID)
    df = sim.ivfpq_topk_stored(
        emb, spark.read.parquet(path), cents, books, q,
        k=ext.TOPK_K, nprobe=ext.IVFPQ_NPROBE, rerank=ext.IVFPQ_RERANK,
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re

    pfs = re.findall(r"PartitionFilters: \[(.*?)\]", plan)
    assert any(
        "cluster" in pf and "IN" in pf.upper() for pf in pfs
    ), f"probe cells not pushed as partition filters on any scan: {pfs}"
