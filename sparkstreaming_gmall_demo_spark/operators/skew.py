"""Skew mitigation: salted two-phase aggregation.

AQE's skew-join splitting handles skewed JOINS at runtime, but a
groupBy whose key distribution is pathological (one hot key holding
10% of a 100 TB table) still funnels the hot key's rows into one
reduce task. Salting splits the hot key across ``salt`` subtasks:

    phase 1: groupBy(keys + salt(row)) -> partial aggregates
    phase 2: groupBy(keys)             -> combine partials

Phase 1's shuffle spreads each key over ``salt`` partitions; phase 2
shuffles only ``salt`` rows per key. Works for any algebraic aggregate
(sum/count/min/max — expressible as combine-of-partials). For
count(DISTINCT) use the two-level exact form (distinct on (key, value)
first) or approx_count_distinct whose sketches merge.

The salt is xxhash64 of the whole row's deterministic pieces — not
rand() — so replays and retries aggregate identically (a failed task
rerun must land rows in the same salt bucket).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_ALGEBRAIC = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    salt: int = 16,
    salt_on: str | Column | None = None,
) -> DataFrame:
    """Two-phase salted groupBy.

    ``aggs``: output_name -> (fn, input_col) with fn in
    {sum, count, min, max}. ``salt_on``: deterministic column to hash
    for the salt (defaults to the aggregated input columns, so retries
    re-bucket identically).
    """
    for name, (fn, _) in aggs.items():
        if fn not in _ALGEBRAIC:
            raise ValueError(f"{name}: {fn} is not algebraic-combinable")
    if salt_on is None:
        salt_on = F.concat_ws("\x00", *[F.col(c) for _, (_, c) in sorted(aggs.items())])
    elif isinstance(salt_on, str):
        salt_on = F.col(salt_on)
    salted = df.withColumn("__salt", F.pmod(F.xxhash64(salt_on), F.lit(salt)))
    partial = salted.groupBy(*keys, "__salt").agg(
        *[
            _ALGEBRAIC[fn][0](col).alias(f"__p_{name}")
            for name, (fn, col) in aggs.items()
        ]
    )
    return partial.groupBy(*keys).agg(
        *[
            _ALGEBRAIC[fn][1](f"__p_{name}").alias(name)
            for name, (fn, _) in aggs.items()
        ]
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    salt: int = 16,
    salt_on: Sequence[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the fact side, replicate the dim side.

    A shuffle join on a hot fact key (one key holding 10% of a 100 TB
    fact table) funnels that key into a single reduce task no matter
    how many executors exist. Salting rewrites the join:

        fact:  __salt = xxhash64(deterministic fact cols) % salt
        dim:   explode(sequence(0, salt-1)) as __salt   (x salt rows)
        join on (key, __salt)

    Each hot key's rows now spread over ``salt`` shuffle partitions;
    the dim side pays a ``salt``-fold replication, which is the right
    trade whenever dim << fact (the fact side never replicates). AQE's
    skew-join split handles the sort-merge case adaptively at runtime;
    this explicit form works for any join strategy, composes under
    further aggregation, and keeps the salt DETERMINISTIC (xxhash64 of
    fact columns, not rand()/monotonically_increasing_id) so task
    retries and streaming replays land every row in the same bucket.

    ``salt_on`` defaults to all fact columns — any unique-ish subset
    (an event id) is cheaper and equally correct.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how}")
    cols = list(salt_on) if salt_on is not None else list(fact.columns)
    salted_fact = fact.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(salt))
    )
    replicated_dim = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    cond = (salted_fact[fact_key] == replicated_dim[dim_key]) & (
        salted_fact["__salt"] == replicated_dim["__salt"]
    )
    out = salted_fact.join(replicated_dim, cond, how)
    return out.drop(salted_fact["__salt"]).drop(replicated_dim["__salt"])
