"""Dim upsert / enrich / backfill semantics (SURVEY J3-J5)."""

from sales_analytics_etl_sql_powerbi_spark.operators.dims import (
    backfill_from_staging,
    enrich_coalesce,
    upsert_missing,
)

DIM_SCHEMA = "k string, a string, b string"


def test_upsert_missing_inserts_once_per_key(spark):
    dim = spark.createDataFrame([("k1", "a1", "b1")], DIM_SCHEMA)
    staged = spark.createDataFrame(
        [
            ("k1", "x", "x"),  # existing key — must NOT insert
            ("k2", "a2", "b2"),
            ("k2", "a2", "b2"),  # duplicate staging rows — one insert
            ("k3", "a3", "b3"),
        ],
        DIM_SCHEMA,
    )
    out = upsert_missing(dim, staged, "k").orderBy("k").collect()
    assert [(r.k, r.a) for r in out] == [("k1", "a1"), ("k2", "a2"), ("k3", "a3")]


def test_upsert_idempotent(spark):
    dim = spark.createDataFrame([("k1", "a1", "b1")], DIM_SCHEMA)
    staged = spark.createDataFrame([("k2", "a2", "b2")], DIM_SCHEMA)
    once = upsert_missing(dim, staged, "k")
    twice = upsert_missing(once, staged, "k")
    assert twice.count() == 2  # rerun adds nothing


def test_enrich_coalesce_prefers_staged_deterministically(spark):
    dim = spark.createDataFrame([("k1", None, "keep"), ("k2", "old", "keep")], DIM_SCHEMA)
    staged = spark.createDataFrame(
        [("k1", "s-1", "x"), ("k1", "s-2", "x")], DIM_SCHEMA
    )
    out = {r.k: (r.a, r.b) for r in enrich_coalesce(dim, staged, "k", ["a"]).collect()}
    # deterministic winner = max() over duplicate staging rows
    assert out["k1"] == ("s-2", "keep")
    assert out["k2"] == ("old", "keep")  # no staging row -> keep


def test_backfill_only_fills_nulls(spark):
    dim = spark.createDataFrame([("k1", None, "b"), ("k2", "set", "b")], DIM_SCHEMA)
    staged = spark.createDataFrame(
        [("k1", "fill", "x"), ("k2", "ignored", "x")], DIM_SCHEMA
    )
    out = {r.k: r.a for r in backfill_from_staging(dim, staged, "k", ["a"]).collect()}
    assert out == {"k1": "fill", "k2": "set"}


def test_merge_dim_enriches_and_inserts(spark):
    """Full MERGE in one op: matched rows pick up staged attributes,
    missing keys are appended — and a second run is a no-op."""
    from sales_analytics_etl_sql_powerbi_spark.operators.dims import merge_dim

    dim = spark.createDataFrame(
        [(1, "k1", None), (2, "k2", "B2")], "id int, key string, brand string"
    )
    staged = spark.createDataFrame(
        [(1, "k1", "B1"), (3, "k3", "B3")], "id int, key string, brand string"
    )
    out = merge_dim(dim, staged, "key", enrich_cols=["brand"])
    got = {r.key: (r.id, r.brand) for r in out.collect()}
    assert got == {"k1": (1, "B1"), "k2": (2, "B2"), "k3": (3, "B3")}
    again = merge_dim(out, staged, "key", enrich_cols=["brand"])
    assert again.count() == 3  # idempotent
