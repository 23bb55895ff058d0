"""HLL sketch rollups: accuracy, merge algebra, parquet round-trip."""

from pyspark.sql import functions as F

from sales_analytics_etl_sql_powerbi_spark.operators import sketches


def _events(spark, n=4000):
    return spark.range(n).selectExpr(
        "cast(id % 17 as string) day",
        "cast(id % 800 as long) user_id",
        "cast(id % 3 as string) kind",
    )


def test_estimate_close_to_exact_per_group(spark):
    ev = _events(spark)
    sk = sketches.distinct_sketch_table(ev, ["day"], "user_id")
    est = {
        r.day: r.n_distinct_approx
        for r in sketches.rollup_estimate(sk, ["day"]).collect()
    }
    exact = {
        r.day: r.n
        for r in ev.groupBy("day")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert est.keys() == exact.keys()
    for d in exact:
        assert abs(est[d] - exact[d]) / exact[d] < 0.05, (d, est[d], exact[d])


def test_rollup_from_sketches_within_error_of_direct(spark):
    """A union of fine-grain sketches estimates the coarse grain within
    HLL error of both the direct sketch and the exact truth (byte
    equality across partitionings is NOT part of the contract — mode
    transitions differ)."""
    ev = _events(spark)
    fine = sketches.distinct_sketch_table(ev, ["day", "kind"], "user_id")
    via_rollup = {
        r.kind: r.n_distinct_approx
        for r in sketches.rollup_estimate(fine, ["kind"]).collect()
    }
    exact = {
        r.kind: r.n
        for r in ev.groupBy("kind")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    for k in exact:
        assert abs(via_rollup[k] - exact[k]) / exact[k] < 0.05


def test_global_rollup_and_exact_row_counts(spark):
    ev = _events(spark)
    sk = sketches.distinct_sketch_table(ev, ["day"], "user_id")
    row = sketches.rollup_estimate(sk, []).collect()[0]
    assert row.row_count == 4000  # exact, summed
    assert abs(row.n_distinct_approx - 800) / 800 < 0.05


def test_union_any_order_and_replay_stay_within_error(spark):
    """What makes incremental loads safe — in the INTERVAL sense:
    merging the parts in any order, or replaying a part, estimates
    within HLL error of the exact answer. (Bit-identity across orders
    is deliberately NOT claimed: the union gadget is order-sensitive
    while sketch modes mix — the module docstring records the measured
    805-vs-784 example. Anything hash-gating an HLL estimate is a bug.)
    """
    ev = _events(spark, 6000)
    parts = [
        sketches.distinct_sketch_table(
            ev.where(F.col("user_id") % 3 == i), ["kind"], "user_id"
        )
        for i in range(3)
    ]
    exact = {
        r.kind: r.n
        for r in ev.groupBy("kind")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }

    def est(tables):
        merged = sketches.merge_sketch_tables(tables, ["kind"])
        return {
            r.kind: r.n_distinct_approx
            for r in sketches.rollup_estimate(merged, ["kind"]).collect()
        }

    for tables in (parts, parts[::-1], parts + [parts[0]]):
        got = est(tables)
        assert got.keys() == exact.keys()
        for k in exact:
            assert abs(got[k] - exact[k]) / exact[k] < 0.05, (k, got[k], exact[k])


def test_incremental_merge_via_parquet_round_trip(spark, tmp_path):
    """The 100-TB flow: per-load sketch tables written to parquet,
    merged, estimated — within HLL error of exact, with exact row
    counts preserved."""
    ev = _events(spark, 6000)
    paths = []
    for i in range(3):
        p = str(tmp_path / f"load{i}")
        sketches.distinct_sketch_table(
            ev.where(F.col("user_id") % 3 == i), ["kind"], "user_id"
        ).write.parquet(p)
        paths.append(p)
    merged = sketches.merge_sketch_tables(
        [spark.read.parquet(p) for p in paths], ["kind"]
    )
    got = {
        r.kind: (r.n_distinct_approx, r.row_count)
        for r in sketches.rollup_estimate(merged, ["kind"]).collect()
    }
    exact = {
        r.kind: (r.n, r.c)
        for r in ev.groupBy("kind")
        .agg(F.count_distinct("user_id").alias("n"), F.count(F.lit(1)).alias("c"))
        .collect()
    }
    for k in exact:
        n_exact, c_exact = exact[k]
        n_got, c_got = got[k]
        assert c_got == c_exact  # row counts exact through the merge
        assert abs(n_got - n_exact) / n_exact < 0.05


def test_sketch_plan_is_single_aggregate(spark):
    """One hash shuffle (partial→final aggregate), no join, no window."""
    ev = _events(spark)
    sk = sketches.distinct_sketch_table(ev, ["day"], "user_id")
    plan = sk._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "Window" not in plan, plan
