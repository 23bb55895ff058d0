"""Physical-plan regression guards.

The scale story (PLAN_AUDIT.md) rests on specific plan shapes: the star
is all broadcast joins with no fact-sized shuffle before aggregation,
scans are column-pruned, and no data-sized table funnels through a
single-partition exchange. These tests pin those shapes so a future
refactor that silently degrades the plan (a lost broadcast hint, a
projection that widens the scan) fails loudly here instead of at 100 TB.
"""

import pytest

from sales_analytics_etl_sql_powerbi_spark import pipeline
from sales_analytics_etl_sql_powerbi_spark.operators import analytics


@pytest.fixture(scope="module")
def plan_sf() -> str:
    """Own sf dir: other tests build (and sometimes cache) the star at
    the shared fixture's sf — Spark's CacheManager would then swap an
    InMemoryRelation into these plans and the shape assertions would
    inspect the cached-plan text instead of the live one."""
    return "/root/testdata/sf0.01"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_star_view_is_all_broadcast_joins(spark, plan_sf):
    plan = _plan(pipeline.star(spark, plan_sf)["view"])
    assert plan.count("SortMergeJoin") == 0, plan
    assert plan.count("BroadcastHashJoin") >= 6  # staging 3 + view 3
    # No shuffle of the fact-sized side before the view materializes:
    # every non-broadcast exchange must sit in a dim-sized subtree —
    # keyed on a dim attribute (platform_name distinct+window,
    # dim_product's __pid numbering). A hashpartitioning keyed on a
    # fact column (order key, product_key, customer_id...) fails here.
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line or "Exchange rangepartitioning" in line:
            assert ("platform_name" in line) or ("__pid" in line), line
    # SinglePartition only for bounded reductions: the platform id
    # window (5 rows) and the dim_date min/max bounds (1 row)
    assert plan.count("Exchange SinglePartition") <= 3, plan


def test_lineitem_scan_is_column_pruned(spark, plan_sf):
    plan = _plan(pipeline.star(spark, plan_sf)["view"])
    # the staging projection needs 4 lineitem columns; the wide ones
    # must not reach the parquet reader
    for wide_col in ("l_comment", "l_extendedprice", "l_tax", "l_shipinstruct"):
        assert wide_col not in plan, f"{wide_col} leaked into a scan"


def test_bi_aggregates_are_partial_final(spark, plan_sf):
    plan = _plan(analytics.exec_overview_states(pipeline.star(spark, plan_sf)["view"]))
    # map-side combine: partial aggregate below the exchange
    assert "partial_sum" in plan or "partial_finalmerge" in plan, plan


def test_dim_product_scale_path_has_no_single_partition_exchange(spark, plan_sf):
    # threshold=0 forces the range-partitioned numbering — the path a
    # data-sized product master takes at 100 TB
    plan = _plan(pipeline.build_dim_product(spark, plan_sf, dense_id_threshold=0))
    assert "Exchange SinglePartition" not in plan, plan


def test_dim_product_numbering_paths_agree(spark, plan_sf):
    # the size-adaptive strategy must be invisible in the output: the
    # bounded-dim window path and the scale path yield identical rows
    small = pipeline.build_dim_product(spark, plan_sf).collect()
    scale = pipeline.build_dim_product(spark, plan_sf, dense_id_threshold=0).collect()
    assert sorted(map(tuple, small)) == sorted(map(tuple, scale))


def test_fact_filters_reach_the_scan(spark, plan_sf):
    plan = _plan(pipeline.star(spark, plan_sf)["fact"])
    # FK-not-null conjuncts must appear as data filters on the scans,
    # not only as post-join filters
    assert "PushedFilters: [" in plan
    assert "isnotnull" in plan.lower()
