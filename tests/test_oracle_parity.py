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


# --- determinism gate -----------------------------------------------------
# The r2/r3 user_value_trend flake was a query that hashed green on one
# run and red on another because a float aggregate accumulated in
# partition-order. This gate re-runs every oracle-backed query under two
# very different shuffle-partition counts (different partial-aggregation
# merge trees, different accumulation orders) and requires bit-identical
# canonicalized output — any green-then-red query fails the suite here
# before the driver ever sees it.

DETERMINISM_PARTITIONS = ("3", "64")


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_partition_determinism(spark, name):
    from oracle_harness import compare

    spec = REGISTRY[name]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    results = []
    try:
        for p in DETERMINISM_PARTITIONS:
            spark.conf.set("spark.sql.shuffle.partitions", p)
            results.append(spec.fn(spark, SF_DIR).toPandas())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    problems = compare(results[0], results[1])
    assert not problems, f"{name} not partition-deterministic: {problems}"
