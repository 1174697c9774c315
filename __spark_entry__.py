"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship polysemy pipeline on sf0.001.
``queries()`` / ``oracle_sql()`` expose the operator inventory from
SURVEY.md §2, each checked against a DuckDB oracle at sf0.01.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from uni_mannheim_masters_thesis_spark.plans.flagship import flagship_polysemy  # noqa: E402
from uni_mannheim_masters_thesis_spark.plans.registry import REGISTRY  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return flagship_polysemy(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each SQL-expressible query."""
    return {
        name: spec.sql for name, spec in REGISTRY.items() if spec.sql is not None
    }
