"""Mergeable histograms: exact merge algebra, quantile error bound."""

import pytest
from pyspark.sql import functions as F

from sales_analytics_etl_sql_powerbi_spark.operators import histograms


def _values(spark, n=3000):
    # value = id % 1000 (uniform 0..999), two groups, some NULLs and
    # out-of-range rows
    return spark.range(n).selectExpr(
        "cast(id % 2 as string) g",
        "CASE WHEN id % 97 = 0 THEN NULL "
        "     WHEN id % 89 = 0 THEN -5.0 "
        "     WHEN id % 83 = 0 THEN 2000.0 "
        "     ELSE cast(id % 1000 as double) END AS v",
    )


def test_histogram_counts_and_accounting(spark):
    df = _values(spark)
    h = histograms.histogram_table(df, ["g"], "v", lo=0.0, hi=1000.0, n_bins=100)
    rows = {r.g: r for r in h.collect()}
    exact = {
        r.g: r
        for r in df.groupBy("g")
        .agg(
            F.sum(((F.col("v") >= 0) & (F.col("v") < 1000)).cast("long")).alias("inr"),
            F.sum((F.col("v") < 0).cast("long")).alias("under"),
            F.sum((F.col("v") >= 1000).cast("long")).alias("over"),
            F.sum(F.col("v").isNull().cast("long")).alias("nul"),
        )
        .collect()
    }
    for g, r in rows.items():
        assert sum(r.bins) == exact[g].inr
        assert r.n_under == exact[g].under
        assert r.n_over == exact[g].over
        assert r.n_null == exact[g].nul


def test_merge_is_exact_and_order_insensitive(spark):
    """The property HLL cannot give: merged bins are BIT-IDENTICAL to
    the direct build, in every merge order."""
    df = _values(spark)
    parts = [
        histograms.histogram_table(
            df.where(F.col("id") % 3 == i), ["g"], "v", 0.0, 1000.0, 50
        )
        for i in range(3)
    ]
    direct = {
        r.g: (list(r.bins), r.n_under, r.n_over, r.n_null)
        for r in histograms.histogram_table(df, ["g"], "v", 0.0, 1000.0, 50).collect()
    }
    for order in (parts, parts[::-1]):
        merged = {
            r.g: (list(r.bins), r.n_under, r.n_over, r.n_null)
            for r in histograms.merge_histogram_tables(order, ["g"]).collect()
        }
        assert merged == direct


def test_merge_rejects_incompatible_bounds(spark):
    df = _values(spark)
    a = histograms.histogram_table(df, ["g"], "v", 0.0, 1000.0, 50)
    b = histograms.histogram_table(df, ["g"], "v", 0.0, 500.0, 50)
    with pytest.raises(Exception, match="disagree"):
        histograms.merge_histogram_tables([a, b], ["g"]).collect()


def test_quantile_within_one_bin_width(spark):
    df = _values(spark)
    n_bins = 100
    width = 1000.0 / n_bins
    h = histograms.histogram_table(df, ["g"], "v", 0.0, 1000.0, n_bins)
    qs = [0.25, 0.5, 0.9, 0.95]
    got = {
        (r.g, r.q): r.quantile
        for r in histograms.quantile_estimate(h, ["g"], qs).collect()
    }
    inrange = df.where((F.col("v") >= 0) & (F.col("v") < 1000))
    for q in qs:
        exact = {
            r.g: r.p
            for r in inrange.groupBy("g")
            .agg(F.expr(f"percentile(v, {q})").alias("p"))
            .collect()
        }
        for g, p in exact.items():
            assert abs(got[(g, q)] - p) <= width + 1e-9, (g, q, got[(g, q)], p)


def test_quantile_empty_group_yields_null_row(spark):
    df = spark.createDataFrame(
        [("a", 5.0), ("b", -1.0)], "g string, v double"
    )  # group b: all mass out of range
    h = histograms.histogram_table(df, ["g"], "v", 0.0, 10.0, 10)
    got = {
        (r.g, r.q): r.quantile
        for r in histograms.quantile_estimate(h, ["g"], [0.5]).collect()
    }
    assert got[("b", 0.5)] is None
    assert got[("a", 0.5)] is not None


def test_histogram_build_plan_is_narrow_aggregates_only(spark):
    """Two narrow hash aggregates (per-(group,bin) count, then the
    groups×bins pack) — no join, no window, no explode, and no
    per-row-per-bin work in codegen. The wide-build regression is
    guarded directly: a reverted n_bins-sum-columns build would put
    __b0..__b63 aggregate columns in the plan and collapse it to one
    aggregate pair."""
    df = _values(spark)
    h = histograms.histogram_table(df, ["g"], "v", 0.0, 1000.0, 64)
    plan = h._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "Window" not in plan and "Generate" not in plan
    assert "__b0" not in plan, "wide per-bin aggregate columns are back"
    # partial+final for EACH of the two stages
    assert plan.count("HashAggregate") >= 4, plan


def test_histogram_validates_params(spark):
    df = _values(spark)
    with pytest.raises(ValueError):
        histograms.histogram_table(df, ["g"], "v", 5.0, 5.0, 10)
    with pytest.raises(ValueError):
        histograms.histogram_table(df, ["g"], "v", 0.0, 1.0, 0)
    with pytest.raises(ValueError):
        histograms.quantile_estimate(
            histograms.histogram_table(df, ["g"], "v", 0.0, 1.0, 4), ["g"], [1.5]
        )


def test_merge_rejects_mismatched_bin_counts(spark):
    df = _values(spark)
    a = histograms.histogram_table(df, ["g"], "v", 0.0, 1000.0, 50)
    b = histograms.histogram_table(df, ["g"], "v", 0.0, 1000.0, 64)
    with pytest.raises(Exception, match="disagree"):
        histograms.merge_histogram_tables([a, b], ["g"]).collect()


def test_fp_edge_value_just_below_hi_lands_in_last_bin(spark):
    """nextafter(hi, 0) with a non-representable width computes bin
    index n_bins — the clamp must keep it in the LAST bin, not drop it
    from the accounting entirely."""
    import math

    v = math.nextafter(1.0, 0.0)
    df = spark.createDataFrame([("a", v), ("a", 0.0)], "g string, v double")
    h = histograms.histogram_table(df, ["g"], "v", 0.0, 1.0, 3).collect()[0]
    assert sum(h.bins) == 2 and h.bins[2] == 1 and h.n_over == 0


def test_merge_incompatibility_check_is_eager_even_when_lo_unread(spark):
    """The pruning trap (ADVICE r6): a consumer that never reads the
    lo column (select('bins') then sum) must STILL hit the
    compatibility raise — the check is an eager job at merge time,
    not a lazy raise_error column Catalyst can prune away."""
    df = _values(spark)
    a = histograms.histogram_table(df, ["g"], "v", 0.0, 1000.0, 50)
    b = histograms.histogram_table(df, ["g"], "v", 0.0, 500.0, 50)
    with pytest.raises(ValueError, match="disagree"):
        histograms.merge_histogram_tables([a, b], ["g"]).select("bins")


def test_global_histogram_quantiles_sql_twin_bit_exact(spark):
    """The DuckDB twin of the no-group histogram path must agree
    BIT-exactly with split-build + merge + quantile_estimate when the
    bin width is exactly representable — the fp-parity contract the
    driver gate relies on (q_doc_length_quantiles)."""
    import duckdb

    df = spark.range(2000).selectExpr(
        "id AS doc_id",
        "CASE WHEN id % 41 = 0 THEN 2.0 "  # under
        "     WHEN id % 43 = 0 THEN 700.0 "  # over
        "     ELSE cast(64 + (id % 500) as double) END AS v",
    )
    parts = [
        histograms.histogram_table(
            df.where(F.col("doc_id") % 2 == i), [], "v", 64.0, 576.0, 128
        )
        for i in (0, 1)
    ]
    hist = histograms.merge_histogram_tables(parts, [])
    qs = [0.25, 0.5, 0.9]
    got = {
        round(r.q, 6): r.quantile
        for r in histograms.quantile_estimate(hist, [], qs).collect()
    }
    meta = hist.select(
        F.aggregate("bins", F.lit(0).cast("long"), lambda a, x: a + x),
        "n_under",
        "n_over",
    ).collect()[0]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, v DOUBLE)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?)", [(r.doc_id, r.v) for r in df.collect()]
    )
    rows = con.execute(
        histograms.global_histogram_quantiles_sql("v", "t", 64.0, 576.0, 128, qs)
    ).fetchall()
    for part, q, quant, n_docs, n_under, n_over in rows:
        if part == "histmeta":
            assert (n_docs, n_under, n_over) == tuple(meta)
        else:
            assert got[round(q, 6)] == quant  # BIT equality, no tolerance
