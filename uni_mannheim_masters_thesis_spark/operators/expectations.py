"""Declarative data-quality constraint validation (SURVEY §2.11
extended surface; no reference analogue — the reference trusts its
inputs, this is the admission gate a 100 TB ingest needs).

The public shape follows Deequ/Great-Expectations: a check SUITE is
declared as data (name, aggregate metric, threshold) and validated in
ONE aggregation pass over the table — every metric is a commutative
partial aggregate (counts, conditional sums, exact count-distinct), so
the whole suite costs a single map-side-combined exchange of one row,
regardless of table size or suite length. Referential-integrity checks
are the one exception (they need the dimension): a left join —
broadcast-able when the dimension is small — folded to the same
one-row fraction.

Every metric is a fraction in [0, 1] computed as
``CAST(<exact integer count> AS DOUBLE) / COUNT(*)`` — one IEEE
division of exact integers, bit-identical between Spark's distributed
partial sums and any sequential engine, so the suite's output is
oracle-hashable with no rounding rescue.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    """One constraint: ``passed = metric >= threshold`` where
    ``metric`` is an aggregate Column evaluating to a double."""

    name: str
    metric: Column
    threshold: float = 1.0


def _fraction(numerator: Column) -> Column:
    # try_divide: an EMPTY relation yields a null metric (and a failed
    # check) instead of an ANSI divide-by-zero — silence is never a pass
    return F.try_divide(numerator.cast("double"), F.count(F.lit(1)))


def completeness(name: str, col: str, threshold: float = 1.0) -> Check:
    """Fraction of rows with ``col`` non-null."""
    return Check(name, _fraction(F.count(col)), threshold)


def uniqueness(name: str, col: str, threshold: float = 1.0) -> Check:
    """Fraction of rows carrying a distinct ``col`` value (1.0 ⇔ the
    column is a key). Exact count-distinct — Catalyst plans the expand
    + two-phase aggregate; at extreme cardinality swap in
    approx_count_distinct and a tolerant threshold."""
    return Check(name, _fraction(F.countDistinct(col)), threshold)


def compliance(
    name: str, predicate: Column, threshold: float = 1.0
) -> Check:
    """Fraction of rows satisfying ``predicate`` (null-safe: null
    counts as non-compliant, matching SQL CASE WHEN semantics)."""
    return Check(
        name,
        _fraction(F.sum(F.when(predicate, 1).otherwise(0))),
        threshold,
    )


def run_checks(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Validate a suite in one aggregation pass: returns one row per
    check — (constraint_name, metric, threshold, passed)."""
    agged = df.agg(
        *[c.metric.alias(f"__m{i}") for i, c in enumerate(checks)]
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(c.name).alias("constraint_name"),
                F.col(f"__m{i}").alias("metric"),
                F.lit(c.threshold).alias("threshold"),
            )
            for i, c in enumerate(checks)
        ]
    )
    return (
        agged.select(F.explode(rows).alias("r"))
        .select("r.constraint_name", "r.metric", "r.threshold")
        .withColumn(
            "passed",
            F.coalesce(
                F.col("metric") >= F.col("threshold"), F.lit(False)
            ),
        )
    )


def referential_integrity(
    fact: DataFrame,
    dim: DataFrame,
    fk: str,
    pk: str,
    name: str,
    threshold: float = 1.0,
    broadcast_dim: bool = True,
) -> DataFrame:
    """Fraction of fact rows whose ``fk`` resolves in ``dim[pk]`` —
    one row, same schema as ``run_checks`` output, union-able into a
    suite. The dimension side is broadcast by default (the usual
    case); at dimension sizes past broadcast reach this degrades to
    one key exchange co-partitioned with the fact's fk."""
    d = dim.select(F.col(pk).alias("__pk")).distinct()
    if broadcast_dim:
        d = F.broadcast(d)
    joined = fact.join(d, fact[fk] == F.col("__pk"), "left")
    return joined.agg(
        F.lit(name).alias("constraint_name"),
        F.try_divide(
            F.sum(F.when(F.col("__pk").isNotNull(), 1).otherwise(0))
            .cast("double"),
            F.count(F.lit(1)),
        ).alias("metric"),
        F.lit(threshold).alias("threshold"),
    ).withColumn(
        "passed",
        F.coalesce(F.col("metric") >= F.col("threshold"), F.lit(False)),
    )
