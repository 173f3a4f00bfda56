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


@pytest.mark.parametrize("spec", ROWS_ONLY_SPECS, ids=[s.name for s in ROWS_ONLY_SPECS])
def test_rows_only_runs(spark, spec):
    df = spec.build(spark, "/root/testdata/sf0.001")
    assert df.count() >= 0
