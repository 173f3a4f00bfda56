"""Every declared query with an oracle must match DuckDB on the same
fixtures — at both the smoke SF and the driver's correctness SF."""

from __future__ import annotations

import os

import pytest

from sparkstreaming_gmall_demo_spark.plans import REGISTRY

from .oracle_harness import compare

SF_DIRS = [
    "/root/testdata/sf0.001",
    pytest.param(
        "/root/testdata/sf0.01",
        marks=pytest.mark.skipif(
            os.environ.get("SPARK_GRAFT_FAST") == "1", reason="fast mode"
        ),
    ),
]

ORACLE_SPECS = [s for s in REGISTRY.values() if s.oracle is not None]
ROWS_ONLY_SPECS = [s for s in REGISTRY.values() if s.oracle is None]


@pytest.mark.parametrize("sf", SF_DIRS)
@pytest.mark.parametrize("spec", ORACLE_SPECS, ids=[s.name for s in ORACLE_SPECS])
def test_oracle_match(spark, spec, sf):
    df = spec.build(spark, sf)
    ok, detail = compare(df, spec.oracle, sf)
    assert ok, f"{spec.name} @ {sf}: {detail}"


def test_every_entry_is_oracle_paired():
    """Round-6 milestone: the last two rows-only entries (BPE train/
    encode) got unrolled chained-CTE oracles, so ALL declared entries
    are now value-hash-checkable by the driver — no weaker rows-only
    checks remain. New entries must ship with an oracle (or this test
    grows a justified allowlist)."""
    assert not ROWS_ONLY_SPECS, [s.name for s in ROWS_ONLY_SPECS]


def test_no_oracle_emits_decimal_or_hugeint_columns():
    """Two render-typing bug classes, both shipped once and both now
    banned by construction:

    - DECIMAL (r05 ext_length_buckets): a `1.0` literal types as
      DECIMAL(2,1) in DuckDB and drags a ratio into version-sensitive
      DECIMAL arithmetic/rendering. Write `1e0`, not `1.0`.
    - HUGEINT (r06 ext_length_buckets / ext_salted_hot_key_agg /
      ext_salted_skew_join): DuckDB types `sum(BIGINT)` as HUGEINT,
      which the driver's pandas canonicalization renders as float64
      (`99845111.0` vs Spark's `99845111`) — hash-red on values that
      are numerically identical. Wrap every bare sum in
      `CAST(sum(...) AS BIGINT)`.

    House rule: every oracle output column must be
    INTEGER/BIGINT/DOUBLE/VARCHAR/... by construction — never DECIMAL
    or HUGEINT. DESCRIBE plans without executing, so this covers all
    142 oracles cheaply."""
    import duckdb

    from sparkstreaming_gmall_demo_spark.schemas import FIXTURE_TABLES

    con = duckdb.connect()
    sf = "/root/testdata/sf0.001"
    for t in FIXTURE_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    offenders = []
    for spec in ORACLE_SPECS:
        for col, typ, *_ in con.execute(f"DESCRIBE {spec.oracle}").fetchall():
            up = typ.upper()
            if "DECIMAL" in up or "HUGEINT" in up:
                offenders.append((spec.name, col, typ))
    con.close()
    assert not offenders, offenders
