"""Physical-plan regression tests: the scale properties SCALING.md
claims must stay true in the compiled plans — predicate pushdown to
parquet, column pruning, broadcast joins for dimension sides, partial
(map-side) aggregation, and top-k without a global sort."""

from __future__ import annotations

import pytest

from conftest import SF_DIR
from uni_mannheim_masters_thesis_spark.plans.registry import REGISTRY


def _formatted_plan(spark, name: str) -> str:
    df = REGISTRY[name].fn(spark, SF_DIR)
    je = df._jdf.queryExecution()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return je.explainString(mode)


def test_filter_pushed_to_parquet_scan(spark):
    plan = _formatted_plan(spark, "sorted_topic_vectors")
    assert "PushedFilters: [IsNotNull(vec_id), LessThan(vec_id,100)]" in plan


def test_column_pruning_on_wide_table(spark):
    plan = _formatted_plan(spark, "top_brands_by_revenue")
    # lineitem has 16 columns; the scan must read exactly the 3 used
    assert "ReadSchema: struct<l_partkey:bigint,l_extendedprice:double,l_discount:double>" in plan


def test_dimension_join_is_broadcast(spark):
    plan = _formatted_plan(spark, "top_brands_by_revenue")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_aggregation_has_map_side_partial(spark):
    plan = _formatted_plan(spark, "pricing_summary")
    assert "partial_sum" in plan


def test_topk_avoids_global_sort(spark):
    plan = _formatted_plan(spark, "top_brands_by_revenue")
    assert "TakeOrderedAndProject" in plan


def test_exact_decimal_partials_for_money(spark):
    # money sums must aggregate as decimal (order-independent), not double
    plan = _formatted_plan(spark, "pricing_summary")
    assert "decimal(18,2)" in plan


@pytest.mark.parametrize(
    "name",
    ["events_asof_join", "events_sessionization", "running_order_total"],
)
def test_single_shuffle_window_plans(spark, name):
    # the window-based operators claim exactly one exchange for their
    # window (AQE may add read-side coalescing, never extra shuffles)
    plan = _formatted_plan(spark, name)
    assert plan.count("Exchange hashpartitioning") <= 2
