"""Rules-engine semantics (SURVEY §2.8 F1-F3, §7 gotchas).

The load-bearing behaviors: pass ordering (unguarded pass 3 overrides
passes 1-2), first-match-wins keyword overlap ('storage bench' before
'%storage%'), case-insensitive LIKE, guard semantics, and the
Spark-vs-SQL compiler equivalence via DuckDB.
"""

import duckdb

from sales_analytics_etl_sql_powerbi_spark.operators.rules import (
    KEEP,
    Guard,
    REFERENCE_CATEGORY_PASSES,
    REFERENCE_SUBCATEGORY_PASSES,
    RulePass,
    When,
    apply_passes,
    passes_to_sql,
)

COLS = ["main_sku_code", "english_name", "category", "subcategory"]
SCHEMA = "main_sku_code string, english_name string, category string, subcategory string"


def run_ref(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    out = apply_passes(
        df, REFERENCE_CATEGORY_PASSES + REFERENCE_SUBCATEGORY_PASSES
    )
    return {
        r.main_sku_code: (r.category, r.subcategory)
        for r in out.collect()
    }


def test_pass3_overrides_prefix_rule(spark):
    # CN1139-% -> Automotive must override the CN% -> Furniture prefix rule
    got = run_ref(
        spark,
        [
            ("CN1139-7", "Generic Widget", None, None),
            ("CN0001", "Mystery Item", None, None),
        ],
    )
    assert got["CN1139-7"][0] == "Automotive"
    assert got["CN0001"][0] == "Furniture"


def test_keyword_overlap_order(spark):
    # 'storage bench' products: pass B sends '%bench%' -> Bench first;
    # a storage product without 'bench' must hit Storage Bench vs
    # Storage Furniture in the right order inside pass C.
    got = run_ref(
        spark,
        [
            ("CN1", "Entryway Storage Bench", None, None),
            ("CN2", "Garage Storage Tower", None, None),
            ("CN3", "Queen Bed Frame", None, None),
        ],
    )
    # '%bench%' matches in pass B already (reference 30_*.sql:39-53)
    assert got["CN1"] == ("Furniture", "Bench")
    assert got["CN2"] == ("Furniture", "Storage Furniture")
    assert got["CN3"] == ("Furniture", "Bed")


def test_like_is_case_insensitive(spark):
    got = run_ref(spark, [("ZZ9", "LUXURY SOFA Set", None, None)])
    # matches '%sofa%' despite upper case (SQL Server collation gotcha)
    assert got["ZZ9"][0] == "Furniture"
    assert got["ZZ9"][1] == "Sofa"


def test_null_fallback_and_else_other(spark):
    got = run_ref(spark, [("ZZ1", "Unclassifiable Thing", None, None)])
    assert got["ZZ1"][0] == "Other"


def test_guard_skips_settled_rows(spark):
    # category pre-set -> prefix pass must not touch it (guard category IS NULL)
    got = run_ref(spark, [("CN5", "Plain Chair", "Lighting", None)])
    assert got["CN5"][0] == "Lighting"


def test_exact_eq_rule(spark):
    got = run_ref(spark, [("ZZ2", "Rack", None, None)])
    # lower(name) = 'rack' exact-match (10_*.sql:92) -> Storage & Organization
    assert got["ZZ2"][0] == "Storage & Organization"


def test_spark_and_sql_compilers_agree(spark):
    rows = [
        ("CN1139-1", "Bumper Diffuser Kit", None, None),
        ("CN7", "Mid-Century Dining Set", None, None),
        ("HZ1", "Garden Gazebo 10x12", None, None),
        ("NB2", "Velvet Accent Chair", None, None),
        ("SZ3", "Spoiler Wing", None, None),
        ("HIFINE9", "Spare Belt", None, None),
        ("ZZ8", "storage ottoman with tray", None, None),
        ("ZZ9", "LED Panel Light 2x4", None, None),
    ]
    passes = REFERENCE_CATEGORY_PASSES + REFERENCE_SUBCATEGORY_PASSES
    spark_out = {
        r.main_sku_code: (r.category, r.subcategory)
        for r in apply_passes(spark.createDataFrame(rows, SCHEMA), passes).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE base (main_sku_code VARCHAR, english_name VARCHAR,"
        " category VARCHAR, subcategory VARCHAR)"
    )
    con.executemany("INSERT INTO base VALUES (?, ?, ?, ?)", rows)
    sql = passes_to_sql("SELECT * FROM base", passes, base_columns=COLS)
    duck_out = {
        r[0]: (r[2], r[3]) for r in con.execute(sql).fetchall()
    }
    assert spark_out == duck_out


def test_else_none_yields_null(spark):
    p = RulePass(
        target="category",
        whens=(When("X", (("english_name", "like", "%x%"),)),),
        else_=None,
    )
    df = spark.createDataFrame([("a", "no match", "pre", None)], SCHEMA)
    out = apply_passes(df, (p,)).first()
    assert out.category is None  # CASE with no ELSE -> SQL NULL


def test_empty_guard_is_unguarded(spark):
    p = RulePass(
        target="category",
        whens=(When("X", (("english_name", "like", "%thing%"),)),),
        guard=Guard(),  # empty == no guard, must not crash
    )
    df = spark.createDataFrame([("a", "a thing", "pre", None)], SCHEMA)
    assert apply_passes(df, (p,)).first().category == "X"
    sql = passes_to_sql("SELECT * FROM base", (p,), base_columns=COLS)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE base (main_sku_code VARCHAR, english_name VARCHAR,"
        " category VARCHAR, subcategory VARCHAR)"
    )
    con.execute("INSERT INTO base VALUES ('a', 'a thing', 'pre', NULL)")
    assert con.execute(sql).fetchone()[2] == "X"


def test_guard_eq_case_insensitive(spark):
    # SQL Server CI collation applies to the UPDATE's WHERE guard too:
    # a dim arriving with 'outdoor & garden' must still get subcategories
    got = run_ref(spark, [("HZ77", "Garden Gazebo", "outdoor & garden", None)])
    assert got["HZ77"][1] == "Gazebo / Pergola"


def test_freshness_check_fresh_stale_and_empty(spark):
    from sales_analytics_etl_sql_powerbi_spark.operators import quality

    df = spark.createDataFrame(
        [("2024-01-01 00:00:00",), ("2024-01-01 10:00:00",)], "ts string"
    ).selectExpr("cast(ts as timestamp) ts")
    fresh = quality.freshness_check(
        df, "ts", max_age_seconds=7200, as_of="2024-01-01 11:00:00"
    ).collect()[0]
    assert fresh.fresh and fresh.age_seconds == 3600.0
    stale = quality.freshness_check(
        df, "ts", max_age_seconds=1800, as_of="2024-01-01 11:00:00"
    ).collect()[0]
    assert not stale.fresh
    empty = quality.freshness_check(
        df.where("ts > timestamp'2030-01-01'"), "ts", 10**9,
        as_of="2024-01-01 00:00:00",
    ).collect()[0]
    assert empty.max_ts is None and not empty.fresh  # silence = stale


def test_volume_drift_check(spark):
    import pytest

    from sales_analytics_etl_sql_powerbi_spark.operators import quality

    df = spark.range(90)
    r = quality.volume_drift_check(df, expected=100, tolerance=0.2).collect()[0]
    assert r.within and r.row_count == 90 and abs(r.ratio - 0.9) < 1e-12
    r2 = quality.volume_drift_check(df, expected=200, tolerance=0.2).collect()[0]
    assert not r2.within  # half the rows silently missing -> flagged
    with pytest.raises(ValueError):
        quality.volume_drift_check(df, expected=0)
