"""P3 — fuzzy column auto-map (reference product_info_etl.py:192-278)."""

from sales_analytics_etl_sql_powerbi_spark.functions.cleaning import auto_map_columns


def test_exact_alias_case_insensitive(spark):
    df = spark.createDataFrame([("S1", "S2")], ["MainSKUCode", "Second_Sku"])
    out, mapping = auto_map_columns(df)
    assert out.first().masterSku == "S1"
    assert out.first().sku == "S2"
    assert mapping["masterSku"] == "MainSKUCode"


def test_exact_alias_skipped_when_target_present(spark):
    df = spark.createDataFrame([("keep", "alias")], ["masterSku", "mainSkuCode"])
    out, _ = auto_map_columns(df)
    assert out.first().masterSku == "keep"


def test_substring_discovery_first_match_wins(spark):
    df = spark.createDataFrame(
        [("e1", "e2", "c1", "x")],
        ["Product English Name", "english_name_alt", "Customer Code", "other"],
    )
    out, mapping = auto_map_columns(df)
    assert mapping["english_name"] == "Product English Name"
    assert mapping["customer_code"] == "Customer Code"
    assert mapping["chinese_name"] is None
    assert out.first().english_name == "e1"
