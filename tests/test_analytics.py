"""Analytics layer invariants on the sf0.001 star + pipeline checks."""

import pytest
from pyspark.sql import functions as F

from sales_analytics_etl_sql_powerbi_spark import pipeline
from sales_analytics_etl_sql_powerbi_spark.operators import analytics, quality


@pytest.fixture(scope="module")
def star(spark, sf_dir):
    s = pipeline.star(spark, sf_dir)
    s["view"] = s["view"].cache()
    return s


def test_pct_of_total_sums_to_100(star):
    rows = analytics.exec_overview_states(star["view"]).collect()
    assert abs(sum(r.pct_of_total for r in rows) - 100.0) < 1e-6
    # sorted desc by units
    units = [r.units_sold for r in rows]
    assert units == sorted(units, reverse=True)


def test_platform_share_complete(star):
    rows = analytics.platform_share(star["view"]).collect()
    assert {r.platform_name for r in rows} == set(analytics.PLATFORM_VALUES)
    assert abs(sum(r.pct_of_total for r in rows) - 100.0) < 1e-6


def test_pivot_preserves_grand_total(star):
    pivot = analytics.state_platform_pivot(star["view"])
    unit_cols = [c for c in pivot.columns if c.startswith("units_p")]
    pivot_total = pivot.select(
        sum(F.sum(c) for c in map(F.col, unit_cols)).alias("t")
    ).first().t
    view_total = (
        star["view"].where(F.col("state_code").isNotNull()).agg(F.sum("units")).first()[0]
    )
    assert pivot_total == view_total


def test_rank_within_state_dense_from_1(star):
    rows = analytics.platform_rank_in_state(star["view"]).collect()
    by_state = {}
    for r in rows:
        by_state.setdefault(r.state_code, []).append(r.platform_rank)
    for ranks in by_state.values():
        assert min(ranks) == 1


def test_top_products_per_state_caps_n(star):
    rows = analytics.top_products_per_state(star["view"], n=3).collect()
    per_state = {}
    for r in rows:
        per_state.setdefault(r.state_code, []).append(r.rn)
    for rns in per_state.values():
        assert rns == sorted(rns) and len(rns) <= 3


def test_fact_fk_integrity(star):
    # every fact row resolved its dims (inner-join semantics J1)
    f = star["fact"]
    assert f.where(F.col("platform_id").isNull() | F.col("product_id").isNull()).count() == 0
    assert f.where(F.col("date_id").isNull()).count() == 0


def test_dim_date_covers_fact_range(star):
    fr = star["fact"].agg(F.min("date_id").alias("lo"), F.max("date_id").alias("hi")).first()
    dr = star["dim_date"].agg(F.min("date_id").alias("lo"), F.max("date_id").alias("hi")).first()
    assert dr.lo <= fr.lo and dr.hi >= fr.hi
    # contiguous daily calendar
    n = star["dim_date"].count()
    assert n == (dr.hi - dr.lo).days + 1


def test_quality_rowcounts(star):
    counts = quality.rowcounts({"fact": star["fact"], "dim_platform": star["dim_platform"]})
    assert counts["fact"] > 0 and counts["dim_platform"] == 5


def test_platform_share_approx_error_bound(star):
    exact = {
        r.platform_name: r.order_count
        for r in analytics.platform_share(star["view"]).collect()
    }
    approx = {
        r.platform_name: r.order_count_approx
        for r in analytics.platform_share_approx(star["view"]).collect()
    }
    assert set(exact) == set(approx)
    for k, n in exact.items():
        assert abs(approx[k] - n) / n < 0.05  # HLL++ rsd=0.02, 5% headroom


def test_observed_rowcounts_free_pass(spark):
    """A10 — observation metrics ride the caller's own action: row and
    non-null counts arrive without a second scan."""
    from sales_analytics_etl_sql_powerbi_spark.operators import quality

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c")], "id int, v string"
    )
    obs_df, obs = quality.observed(df, nonnull_cols=["v"])
    assert obs_df.count() == 3  # the action the pipeline runs anyway
    assert quality.observed_metrics(obs) == {"row_count": 3, "nonnull_v": 2}
