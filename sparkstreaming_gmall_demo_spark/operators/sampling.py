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


def sample_predicate(key, fraction: float, salt: str = "") -> Column:
    """Boolean membership column. ``key`` is cast to string, so the
    same textual key selects identically everywhere; the equivalent
    oracle SQL is ``substr(md5(CAST(k AS VARCHAR) || salt), 1, 8) <
    '<threshold>'``."""
    key = F.col(key) if isinstance(key, str) else key
    digest = F.md5(F.concat(key.cast("string"), F.lit(salt)))
    return F.substring(digest, 1, 8) < sample_threshold(fraction)


def deterministic_sample(
    df: DataFrame, key: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Keep the deterministic ``fraction`` of rows by ``key``. Rows
    sharing a key are kept or dropped together (group-coherent — an
    exploded document's chunks stay in the same split)."""
    return df.filter(sample_predicate(key, fraction, salt))
