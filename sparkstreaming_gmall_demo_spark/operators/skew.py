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
