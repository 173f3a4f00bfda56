"""Round-11 tests.

Regression pins for the r10 ADVICE findings on txn maintenance:

(1) append_new's fence-seeding probe runs AT MOST ONCE per legacy
    (merge_keyed-history) table — an all-suppressed/empty batch now
    lands a meta-only commit stamping ``appended_through``, so a run
    of empty batches no longer pays a full-snapshot exceptAll scan +
    shuffle per batch.
(2) vacuum_orphans maintains its live-uuid set incrementally across
    sweeps (parses only manifests added since the last sweep — the
    per-cadence JSON cost no longer grows O(versions x files) over a
    pipeline's lifetime) and re-checks newly-landed commits
    immediately before each rmtree, so a slow multi-dir stager whose
    commit lands mid-sweep cannot lose a staged dir it references.
    Ages are measured against sweep start, not deletion time.

Plus the bench.py interleaving contract (VERDICT r10 item 2): timed
reps are round-robin across queries with per-query spread recorded,
so a transient box-load spike inflates at most one rep of each query
instead of every rep of one query.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from sparkstreaming_gmall_demo_spark.streaming import txn


# ---------------------------------------------------------------------------
# ADVICE r10: fence seeding runs the full-snapshot probe at most once


def test_append_new_empty_batch_seeds_fence_once(spark, tmp_path, monkeypatch):
    """A legacy merge_keyed table with a run of all-suppressed batches:
    pre-fix every empty append_new re-ran the full-snapshot exceptAll
    probe (table scan + shuffle per batch); post-fix the FIRST empty
    batch lands a meta-only commit stamping appended_through and the
    probe never runs again."""
    t = str(tmp_path / "t")
    seeded = spark.createDataFrame([(1, "x")], "k long, v string")
    assert txn.merge_keyed(seeded, t, ["k"]) == 1
    assert "appended_through" not in txn.table_meta(t)

    probes = {"n": 0}
    real_snapshot = txn.snapshot

    def counting_snapshot(*a, **kw):
        probes["n"] += 1
        return real_snapshot(*a, **kw)

    monkeypatch.setattr(txn, "snapshot", counting_snapshot)
    empty = spark.createDataFrame([], "k long, v string")
    assert txn.append_new(empty, t, batch_id=3) == 0
    assert probes["n"] == 1  # the one seeding probe
    # the empty batch stamped the fence via a meta-only commit …
    assert txn.table_meta(t).get("appended_through") == 3
    # … whose snapshot is unchanged (same file list, new meta)
    monkeypatch.setattr(txn, "snapshot", real_snapshot)
    assert txn.snapshot(spark, t).count() == 1
    monkeypatch.setattr(txn, "snapshot", counting_snapshot)

    # subsequent empty batches: fenced/short-circuited, NO probe job
    probes["n"] = 0
    assert txn.append_new(empty, t, batch_id=4) == 0
    assert txn.append_new(empty, t, batch_id=3) == 0  # replay twin
    assert probes["n"] == 0

    # and the first non-empty batch takes the probe-free fast path
    b9 = spark.createDataFrame([(9, "y")], "k long, v string")
    assert txn.append_new(b9, t, batch_id=9) == 1
    assert probes["n"] == 0
    assert txn.table_meta(t).get("appended_through") == 9
    monkeypatch.setattr(txn, "snapshot", real_snapshot)
    assert txn.snapshot(spark, t).count() == 2


def test_append_new_empty_seed_replay_converges(spark, tmp_path):
    """Replaying the seeding empty batch after the meta-only commit
    returns 0 at the fence — byte-identical table either way."""
    t = str(tmp_path / "t")
    txn.merge_keyed(spark.createDataFrame([(1, "x")], "k long, v string"), t, ["k"])
    empty = spark.createDataFrame([], "k long, v string")
    assert txn.append_new(empty, t, batch_id=5) == 0
    v_after_seed = txn.current_version(t)
    assert txn.append_new(empty, t, batch_id=5) == 0  # replay
    assert txn.current_version(t) == v_after_seed  # no extra commit
    assert txn.snapshot(spark, t).count() == 1


# ---------------------------------------------------------------------------
# ADVICE r10: vacuum_orphans incremental live-set + pre-rmtree recheck


def test_vacuum_orphans_parses_only_new_manifests(spark, tmp_path, monkeypatch):
    """The per-sweep manifest-parse count must track versions ADDED
    since the last sweep, not total table history."""
    t = str(tmp_path / "t")
    for i in range(5):
        txn.merge_keyed(
            spark.createDataFrame([(i, "v")], "k long, v string"), t, ["k"]
        )
    reads = {"n": 0}
    real_read = txn._read_manifest

    def counting_read(*a, **kw):
        reads["n"] += 1
        return real_read(*a, **kw)

    monkeypatch.setattr(txn, "_read_manifest", counting_read)
    txn._orphan_live_cache.pop(t, None)  # cold start
    txn.vacuum_orphans(t, min_age_s=3600)
    assert reads["n"] == 5  # first sweep parses the full history …
    reads["n"] = 0
    txn.vacuum_orphans(t, min_age_s=3600)
    assert reads["n"] == 0  # … steady-state sweep parses nothing new
    txn.merge_keyed(
        spark.createDataFrame([(99, "v")], "k long, v string"), t, ["k"]
    )
    reads["n"] = 0
    txn.vacuum_orphans(t, min_age_s=3600)
    assert reads["n"] == 1  # exactly the one manifest added since


def test_vacuum_orphans_cache_resets_on_recreated_table(spark, tmp_path):
    """A table dropped and recreated (version history moves backward)
    must not inherit the old incarnation's live set."""
    import shutil

    t = str(tmp_path / "t")
    for i in range(3):
        txn.merge_keyed(
            spark.createDataFrame([(i, "v")], "k long, v string"), t, ["k"]
        )
    txn._orphan_live_cache.pop(t, None)
    txn.vacuum_orphans(t, min_age_s=3600)
    assert txn._orphan_live_cache[t][0] == 2  # cached through v2
    shutil.rmtree(t)
    txn.merge_keyed(spark.createDataFrame([(7, "v")], "k long, v string"), t, ["k"])
    # fresh incarnation: stage an orphan, age it, sweep must still
    # correctly protect the NEW live files and remove the orphan
    orphan_files = txn._stage(
        spark.createDataFrame([(8, "v")], "k long, v string"), t
    )
    orphan_dir = os.path.join(t, "_staged", orphan_files[0].split(os.sep)[1])
    old = time.time() - 7200
    os.utime(orphan_dir, (old, old))
    for n in os.listdir(orphan_dir):
        os.utime(os.path.join(orphan_dir, n), (old, old))
    assert txn.vacuum_orphans(t, min_age_s=3600) == 1
    assert not os.path.exists(orphan_dir)
    assert txn.snapshot(spark, t).count() == 1
    assert txn._orphan_live_cache[t][0] == 0  # reset to the new history


def test_vacuum_orphans_recheck_spares_dir_committed_mid_sweep(
    spark, tmp_path, monkeypatch
):
    """A slow stager (stage → … → commit crossing the age gate): the
    commit lands AFTER the sweep snapshotted the version list but
    before the rmtree. Pre-fix the dir was deleted out from under the
    just-landed commit; post-fix the pre-rmtree recheck re-reads the
    new manifest and spares it."""
    t = str(tmp_path / "t")
    txn.merge_keyed(spark.createDataFrame([(1, "x")], "k long, v string"), t, ["k"])
    txn._orphan_live_cache.pop(t, None)
    # the "slow stager": staged long ago, not yet committed
    staged = txn._stage(spark.createDataFrame([(2, "y")], "k long, v string"), t)
    slow_dir = os.path.join(t, "_staged", staged[0].split(os.sep)[1])
    old = time.time() - 7200
    os.utime(slow_dir, (old, old))
    for n in os.listdir(slow_dir):
        os.utime(os.path.join(slow_dir, n), (old, old))

    # land the commit the moment the sweep inspects the dir's mtime —
    # i.e. after the sweep's version-list snapshot, before its rmtree
    committed = {"done": False}
    real_getmtime = os.path.getmtime

    def commit_on_first_touch(path):
        if not committed["done"] and os.path.normpath(path) == os.path.normpath(
            slow_dir
        ):
            committed["done"] = True
            v = txn.current_version(t)
            base = txn._read_manifest(t, v)
            assert txn._try_commit(t, v + 1, base + staged, dict(txn.table_meta(t)))
        return real_getmtime(path)

    monkeypatch.setattr(txn.os.path, "getmtime", commit_on_first_touch)
    removed = txn.vacuum_orphans(t, min_age_s=3600)
    monkeypatch.undo()
    assert committed["done"]
    assert removed == 0
    assert os.path.isdir(slow_dir)
    # and the landed commit's rows are readable
    assert txn.snapshot(spark, t).count() == 2


def test_vacuum_orphans_still_removes_aged_garbage_with_cache(spark, tmp_path):
    """End-to-end with the cache warm: crash garbage older than the
    gate goes, referenced dirs stay — across two sweeps."""
    t = str(tmp_path / "t")
    txn.merge_keyed(spark.createDataFrame([(1, "x")], "k long, v string"), t, ["k"])
    txn._orphan_live_cache.pop(t, None)
    assert txn.vacuum_orphans(t, min_age_s=3600) == 0  # warm the cache
    orphan_files = txn._stage(
        spark.createDataFrame([(2, "y")], "k long, v string"), t
    )
    orphan_dir = os.path.join(t, "_staged", orphan_files[0].split(os.sep)[1])
    old = time.time() - 7200
    os.utime(orphan_dir, (old, old))
    for n in os.listdir(orphan_dir):
        os.utime(os.path.join(orphan_dir, n), (old, old))
    assert txn.vacuum_orphans(t, min_age_s=3600) == 1
    assert not os.path.exists(orphan_dir)
    assert txn.snapshot(spark, t).count() == 1


# ---------------------------------------------------------------------------
# VERDICT r10 item 2: bench.py timed reps are interleaved


def test_bench_source_interleaves_reps_and_records_spread():
    """Shape pin (the bench runs at sf0.1 and is driver-invoked, so
    this asserts the source contract, not a timing): the timed loop is
    rep-major over builds (round-robin), and the sidecar carries the
    per-query worst/best spread."""
    src = open(os.path.join(os.path.dirname(__file__), "..", "bench.py")).read()
    assert "for _ in range(n_reps):" in src
    assert "for name, build in builds.items():" in src
    assert src.index("for _ in range(n_reps):") < src.index(
        "for name, build in builds.items():"
    )
    assert '"spread_worst_over_best"' in src


# ---------------------------------------------------------------------------
# Driver-window rotation: the r11 literal WAS the policy's output.
# (The per-round equality pin moved to tests/test_round12_ops.py when
# the window rotated forward — each round's test file pins the window
# that round actually shipped.)


# ---------------------------------------------------------------------------
# The MinHash scale twins (VERDICT r10 item 3): planted verbatim-twin
# cohort invariants beyond the oracle slice


def test_planted_twin_cohort_is_vocab_disjoint(spark):
    """The determinism argument requires the planted vocabulary to be
    disjoint from the documents corpus at every fixture SF — one
    shared token is harmless for Jaccard but this pins the stronger
    property the docstrings claim."""
    from sparkstreaming_gmall_demo_spark.plans.extensions import (
        _planted_twin_docs,
    )
    from sparkstreaming_gmall_demo_spark.sources.fixtures import load_table

    planted_toks = (
        _planted_twin_docs(spark)
        .select(F.explode(F.split("text", " ")).alias("tok"))
        .distinct()
    )
    for sf_dir in ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]:
        organic_toks = (
            load_table(spark, sf_dir, "documents")
            .select(F.explode(F.split("text", " ")).alias("tok"))
            .distinct()
        )
        assert planted_toks.join(organic_toks, "tok", "inner").count() == 0


def test_minhash_twin_labels_cluster_exactly_the_planted_cohort(spark):
    """Every planted cluster must come out of the MinHash pair kernel
    + components as exactly itself: group key = cluster min id, no
    planted doc unlabeled, no planted<->organic merge."""
    from sparkstreaming_gmall_demo_spark.plans.extensions import (
        PLANT_BASE,
        _minhash_twin_labels,
    )

    _, labels = _minhash_twin_labels(spark, "/root/testdata/sf0.001")
    planted = labels.filter(F.col("node") >= PLANT_BASE).collect()
    # all 23 planted docs are clustered (sizes 2+3+4 repeated = 23)
    assert len(planted) == 23
    for r in planted:
        assert r.component == (r.node // 10) * 10  # cluster min id
    # and no organic doc was pulled into a planted component
    organic_in_planted = labels.filter(
        (F.col("node") < PLANT_BASE) & (F.col("component") >= PLANT_BASE)
    ).count()
    assert organic_in_planted == 0


# ---------------------------------------------------------------------------
# VERDICT r10 item 8: driver-collect budget audit. Every .collect() /
# .toPandas() site in the package must carry a `# collect-bound:` tag
# stating the row/ELEMENTS bound that makes it a bounded driver-side
# collect (1-row aggs, limit(k) pages, codebook/meta tables, budgeted
# probe batches). An untagged site — i.e. a future collect someone adds
# without thinking about its size at 100 TB — fails the suite.


def test_every_package_collect_site_is_budget_tagged():
    import ast
    import glob

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    untagged = []
    n_sites = 0
    for path in glob.glob(
        os.path.join(repo, "sparkstreaming_gmall_demo_spark/**/*.py"),
        recursive=True,
    ):
        src = open(path).read()
        lines = src.splitlines()
        tree = ast.parse(src)
        for node in ast.walk(tree):
            if (
                isinstance(node, ast.Call)
                and isinstance(node.func, ast.Attribute)
                and node.func.attr in ("collect", "toPandas")
            ):
                n_sites += 1
                span = lines[node.lineno - 1 : node.end_lineno]
                if not any("collect-bound:" in line for line in span):
                    rel = os.path.relpath(path, repo)
                    untagged.append(f"{rel}:{node.end_lineno}")
    assert n_sites >= 49, f"audit found only {n_sites} sites — AST walk broken?"
    assert not untagged, (
        "collect()/toPandas() without a `# collect-bound:` tag — state the "
        f"row/ELEMENTS bound or restructure: {untagged}"
    )


# ---------------------------------------------------------------------------
# Round-11: the large-codebook BLAS probe backend. The r11 big-index
# decomposition showed the SQL higher-order-function fold costs
# B*k*dim interpreted lambda steps (~50 s/round at 12.5k x 2000 x 64 —
# the ENTIRE semantic-gate wall at sqrt(n) codebooks); beyond
# _PROBE_FOLD_MAX_ELEMENTS the probe runs as one Arrow/BLAS matmul.


def test_probe_clusters_numpy_matches_sql_fold_exactly(spark):
    """Backend parity on real fixture vectors: identical probe lists
    (including tie order) row for row at a k where both paths
    compute."""
    from sparkstreaming_gmall_demo_spark.operators import similarity as sim
    from sparkstreaming_gmall_demo_spark.sources.fixtures import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    cents = sim.ivf_train(emb, k=24, iters=1)
    sql = {
        r.vec_id: r.probe_clusters
        for r in sim.ivf_probe_clusters(emb, cents, 3)
        .select("vec_id", "probe_clusters")
        .collect()
    }
    got = {
        r.vec_id: r.probe_clusters
        for r in sim._probe_clusters_numpy(emb, cents, 3, "embedding")
        .select("vec_id", "probe_clusters")
        .collect()
    }
    assert got == sql


def test_probe_clusters_backend_selection_boundary():
    """The backend flips exactly at _PROBE_FOLD_MAX_ELEMENTS — the
    same boundary where the codebook already moves into broadcast
    data, so layout regime and compute regime stay aligned."""
    from sparkstreaming_gmall_demo_spark.operators import similarity as sim

    assert sim._PROBE_FOLD_MAX_ELEMENTS == sim._CENTROID_LITERAL_MAX_ELEMENTS


def test_probe_clusters_numpy_raises_on_malformed_vectors(spark):
    """The large-codebook path's honest boundary: null or
    wrong-dimension vectors raise with an actionable message instead
    of silently NULLing distances like the SQL fold."""
    import pytest as _pytest

    from sparkstreaming_gmall_demo_spark.operators import similarity as sim

    cents = [[float(i == j) for j in range(4)] for i in range(3)]
    bad = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [1.0, 2.0, 3.0, 4.0])],
        "vec_id long, embedding array<double>",
    )
    with _pytest.raises(Exception, match="dim"):
        sim._probe_clusters_numpy(bad, cents, 2, "embedding").collect()


def test_probe_clusters_numpy_tie_breaks_to_lowest_centroid(spark):
    """Duplicate centroids: equal distances must order by centroid id
    (the SQL struct-sort rule, reproduced by stable argsort)."""
    from sparkstreaming_gmall_demo_spark.operators import similarity as sim

    cents = [[1.0, 0.0], [0.0, 1.0], [1.0, 0.0]]  # 0 and 2 identical
    df = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    (row,) = sim._probe_clusters_numpy(df, cents, 3, "embedding").collect()
    assert row.probe_clusters == [0, 2, 1]


def test_pq_encode_numpy_matches_sql_fold_exactly(spark):
    """PQ assignment backend parity on fixture vectors: identical code
    arrays row for row (stable argmin ties included)."""
    from sparkstreaming_gmall_demo_spark.operators import similarity as sim
    from sparkstreaming_gmall_demo_spark.sources.fixtures import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    books = sim.pq_train(emb, m=8, ksub=16, iters=1)
    sql = {r.vec_id: list(r.codes) for r in sim.pq_encode(emb, books).collect()}
    old = sim._PROBE_FOLD_MAX_ELEMENTS
    try:
        sim._PROBE_FOLD_MAX_ELEMENTS = 1
        got = {r.vec_id: list(r.codes) for r in sim.pq_encode(emb, books).collect()}
    finally:
        sim._PROBE_FOLD_MAX_ELEMENTS = old
    assert got == sql


def test_pq_encode_numpy_raises_on_short_vectors(spark):
    import pytest as _pytest

    from sparkstreaming_gmall_demo_spark.operators import similarity as sim

    books = [[[0.0, 0.0], [1.0, 1.0]] for _ in range(2)]  # m=2, dsub=2
    bad = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0])], "vec_id long, embedding array<double>"
    )
    with _pytest.raises(Exception, match="elements"):
        sim._pq_encode_numpy(bad, books, "vec_id", "embedding").collect()


# ---------------------------------------------------------------------------
# Round-11 self-review findings on vacuum_orphans (two confirmed bugs)


def test_vacuum_orphans_survives_recreate_with_equal_version_count(
    spark, tmp_path
):
    """THE reproduced data-loss bug: table dropped and recreated with a
    history reaching the SAME version count — the old backward-only
    reset test missed it, the cache skipped the new manifests, and the
    sweep deleted every LIVE staging dir of the current snapshot. The
    manifest-identity check must reset the cache instead."""
    import shutil

    t = str(tmp_path / "t")
    for i in range(3):
        txn.merge_keyed(
            spark.createDataFrame([(i, "v")], "k long, v string"), t, ["k"]
        )
    txn._orphan_live_cache.pop(t, None)
    txn.vacuum_orphans(t, min_age_s=3600)  # cache warmed through v2
    shutil.rmtree(t)
    for i in range(3):  # SAME version count as the first incarnation
        txn.merge_keyed(
            spark.createDataFrame([(10 + i, "w")], "k long, v string"), t, ["k"]
        )
    # age every staging dir of the new incarnation past the gate
    stage_root = os.path.join(t, "_staged")
    old = time.time() - 7200
    for d in os.listdir(stage_root):
        p = os.path.join(stage_root, d)
        os.utime(p, (old, old))
        for n in os.listdir(p):
            os.utime(os.path.join(p, n), (old, old))
    txn.vacuum_orphans(t, min_age_s=3600)
    # live dirs intact, table fully readable
    assert txn.snapshot(spark, t).count() == 3
    for v in txn.list_versions(t):
        txn.snapshot(spark, t, version=v).count()


def test_vacuum_orphans_two_phase_tombstone_reclaim(spark, tmp_path):
    """An aged orphan is first RENAMED to <uuid>.tomb; only a
    tombstone that stays unreferenced for a further full age gate is
    deleted — the destructive step is separated from the
    stage-to-commit race window by min_age_s."""
    t = str(tmp_path / "t")
    txn.merge_keyed(spark.createDataFrame([(1, "x")], "k long, v string"), t, ["k"])
    txn._orphan_live_cache.pop(t, None)
    orphan_files = txn._stage(
        spark.createDataFrame([(2, "y")], "k long, v string"), t
    )
    orphan = os.path.join(t, "_staged", orphan_files[0].split(os.sep)[1])
    old = time.time() - 7200
    os.utime(orphan, (old, old))
    for n in os.listdir(orphan):
        os.utime(os.path.join(orphan, n), (old, old))
    assert txn.vacuum_orphans(t, min_age_s=3600) == 1  # phase 1: rename
    assert not os.path.exists(orphan)
    assert os.path.isdir(orphan + ".tomb")
    # the fresh tombstone is NOT aged: second sweep is a no-op
    assert txn.vacuum_orphans(t, min_age_s=3600) == 0
    assert os.path.isdir(orphan + ".tomb")
    # age the tombstone -> phase 2 reclaims it
    os.utime(orphan + ".tomb", (old, old))
    for n in os.listdir(orphan + ".tomb"):
        os.utime(os.path.join(orphan + ".tomb", n), (old, old))
    assert txn.vacuum_orphans(t, min_age_s=3600) == 1
    assert not os.path.exists(orphan + ".tomb")


def test_commit_restores_tombstoned_staging_dir(spark, tmp_path):
    """The committer-side healer: a slow stager whose dir the sweep
    tombstoned commits anyway — _try_commit finds the dir missing,
    renames the tombstone back, and the snapshot reads cleanly."""
    t = str(tmp_path / "t")
    txn.merge_keyed(spark.createDataFrame([(1, "x")], "k long, v string"), t, ["k"])
    staged = txn._stage(spark.createDataFrame([(2, "y")], "k long, v string"), t)
    d = os.path.join(t, "_staged", staged[0].split(os.sep)[1])
    os.rename(d, d + ".tomb")  # the sweep's phase-1 rename
    v = txn.current_version(t)
    base = txn._read_manifest(t, v)
    assert txn._try_commit(t, v + 1, base + staged, dict(txn.table_meta(t)))
    assert os.path.isdir(d) and not os.path.exists(d + ".tomb")
    assert txn.snapshot(spark, t).count() == 2


def test_sweep_heals_live_tombstone(spark, tmp_path):
    """Sweep-side healer: a tombstone whose base uuid IS referenced by
    a manifest (committer crashed between commit and restore) is
    renamed back by the next sweep, not deleted."""
    t = str(tmp_path / "t")
    txn.merge_keyed(spark.createDataFrame([(1, "x")], "k long, v string"), t, ["k"])
    txn._orphan_live_cache.pop(t, None)
    (live_file,) = [
        f for f in txn._read_manifest(t, txn.current_version(t))
    ][:1]
    d = os.path.join(t, live_file.split(os.sep)[0], live_file.split(os.sep)[1])
    os.rename(d, d + ".tomb")
    old = time.time() - 7200
    os.utime(d + ".tomb", (old, old))
    assert txn.vacuum_orphans(t, min_age_s=3600) == 1  # healed
    assert os.path.isdir(d) and not os.path.exists(d + ".tomb")
    assert txn.snapshot(spark, t).count() == 1
