"""Misra-Gries approximate frequent items: bounds, presence, memory."""

from pyspark.sql import functions as F

from sales_analytics_etl_sql_powerbi_spark.operators import frequency


def _zipf_docs(spark, n_docs=400):
    # doc i repeats token "t{j}" where heavy tokens recur often:
    # t0 in every doc, t1 in every 2nd, t2 every 3rd, ... plus a uniform
    # tail of rare tokens tail{i}
    rows = []
    for i in range(n_docs):
        toks = [f"t{j}" for j in range(1, 12) if i % j == 0]
        toks += [f"tail{i}"]
        rows.append((i, " ".join(toks)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_misra_gries_update_unit():
    c: dict = {}
    dec = 0
    for tok, n in [("a", 5), ("b", 3), ("c", 2), ("d", 1)]:
        dec += frequency.misra_gries_update(c, tok, n, capacity=3)
    # overflow on 'd': min counter (d=1) subtracted everywhere, zeros drop
    assert dec == 1
    assert c == {"a": 4, "b": 2, "c": 1}
    # re-adding an evicted token just re-enters it
    dec += frequency.misra_gries_update(c, "a", 1, capacity=3)
    assert c["a"] == 5


def test_intervals_contain_truth_and_heavy_hitters_present(spark):
    docs = _zipf_docs(spark)
    exact = {
        r.token: r.n
        for r in docs.select(
            F.explode(F.split(F.trim("text"), " +")).alias("token")
        )
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    n_total = sum(exact.values())
    capacity = 50
    got = frequency.frequent_tokens_approx(docs, topk=20, capacity=capacity).collect()
    for r in got:
        assert r.count_min <= exact[r.token] <= r.count_max, (
            r.token,
            r.count_min,
            exact[r.token],
            r.count_max,
        )
    # every token above the MG threshold must be reported
    threshold = n_total / (capacity + 1)
    heavy = {t for t, n in exact.items() if n > threshold}
    reported = {r.token for r in got}
    assert heavy <= reported, heavy - reported
    # and the heaviest token ranks first
    assert got[0].token == "t1"


def test_interval_width_is_bounded(spark):
    docs = _zipf_docs(spark)
    n_total = docs.select(
        F.sum(F.size(F.split(F.trim("text"), " +")))
    ).collect()[0][0]
    capacity = 50
    got = frequency.frequent_tokens_approx(docs, topk=5, capacity=capacity).collect()
    for r in got:
        assert r.count_max - r.count_min <= n_total / (capacity + 1) * 1.001


def test_summary_rows_bounded_by_capacity_per_partition(spark):
    """The scale property: however many tokens a partition holds, its
    summary is ≤ capacity+1 rows (counters + the decrement marker)."""
    docs = _zipf_docs(spark).repartition(4)
    capacity = 20
    # peek at the pre-merge summaries through the same code path
    import pandas as pd

    from sales_analytics_etl_sql_powerbi_spark.operators.text import tokens_expr

    toks = docs.select(F.explode_outer(tokens_expr("text")).alias("token")).where(
        F.col("token").isNotNull()
    )

    def count_rows(it):
        rows = 0
        counters: dict = {}
        dec = 0
        for pdf in it:
            for token, cnt in pdf["token"].value_counts().items():
                dec += frequency.misra_gries_update(counters, token, int(cnt), capacity)
        yield pd.DataFrame({"n": [len(counters)]})

    sizes = [
        r.n
        for r in toks.mapInPandas(count_rows, schema="n long").collect()
    ]
    assert all(s <= capacity for s in sizes), sizes
