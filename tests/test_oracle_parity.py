"""Differential tests: every registry query vs its DuckDB oracle twin
(exact value parity — the driver's correctness gate, replicated locally
at sf0.001)."""

from __future__ import annotations

import pytest

from conftest import SF_DIR
from oracle_harness import run_query
from uni_mannheim_masters_thesis_spark.plans.registry import REGISTRY

ORACLE_QUERIES = sorted(n for n, s in REGISTRY.items() if s.sql is not None)
ROWS_ONLY_QUERIES = sorted(n for n, s in REGISTRY.items() if s.sql is None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, duck, name):
    spec = REGISTRY[name]
    sdf, odf, problems = run_query(spark, duck, name, spec, SF_DIR)
    assert not problems, f"{name}: {problems}"


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_runs(spark, duck, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, SF_DIR)
    rows = df.count()
    assert rows >= 0
    assert len(df.columns) > 0
