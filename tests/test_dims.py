"""Dim upsert / enrich / backfill semantics (SURVEY J3-J5)."""

import pytest

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


def _scd_dim(spark, rows):
    return spark.createDataFrame(
        rows,
        "customer_id long, state_code string, postal_code string,"
        " valid_from timestamp, valid_to timestamp, is_current boolean",
    )


def test_scd2_apply_change_new_unchanged_and_idempotent(spark):
    import datetime as dt

    from sales_analytics_etl_sql_powerbi_spark.operators.dims import (
        SCD2_END_OF_TIME,
        scd2_apply,
    )

    t0 = dt.datetime(2024, 1, 1)
    t1 = dt.datetime(2024, 6, 1)
    eot = dt.datetime(9999, 12, 31)
    dim = _scd_dim(
        spark,
        [
            (1, "CA", "90001", t0, eot, True),   # will change state
            (2, "NY", "10001", t0, eot, True),   # unchanged
            (3, "TX", "73301", t0, t1, False),   # historical row
            (3, "TX", "75001", t1, eot, True),   # current for key 3
        ],
    )
    changes = spark.createDataFrame(
        [
            (1, "WA", "98001", t1),   # real change
            (2, "NY", "10001", t1),   # no-op (identical values)
            (9, "FL", "33101", t1),   # brand-new key
        ],
        "customer_id long, state_code string, postal_code string, effective_ts timestamp",
    )
    out = scd2_apply(
        dim, changes, "customer_id", ["state_code", "postal_code"]
    )
    rows = {
        (r.customer_id, r.state_code, r.is_current): (r.valid_from, r.valid_to)
        for r in out.collect()
    }
    assert out.count() == 6  # 4 original (1 closed) + 1 new ver + 1 new key
    assert rows[(1, "CA", False)] == (t0, t1)            # closed
    assert rows[(1, "WA", True)][0] == t1                # new version
    assert rows[(2, "NY", True)] == (t0, eot)            # untouched
    assert (3, "TX", False) in rows and (3, "TX", True) in rows  # history kept
    assert rows[(9, "FL", True)][0] == t1                # new key
    # idempotence: replaying the same batch changes nothing
    again = scd2_apply(out, changes, "customer_id", ["state_code", "postal_code"])
    assert again.count() == 6
    assert again.exceptAll(out).count() == 0


def test_scd2_null_safe_change_detection(spark):
    import datetime as dt

    from sales_analytics_etl_sql_powerbi_spark.operators.dims import scd2_apply

    t0 = dt.datetime(2024, 1, 1)
    t1 = dt.datetime(2024, 6, 1)
    eot = dt.datetime(9999, 12, 31)
    dim = _scd_dim(spark, [(1, None, "90001", t0, eot, True)])
    changes = spark.createDataFrame(
        [(1, "CA", "90001", t1)],
        "customer_id long, state_code string, postal_code string, effective_ts timestamp",
    )
    out = scd2_apply(dim, changes, "customer_id", ["state_code", "postal_code"])
    assert out.count() == 2  # NULL -> CA is a real change


def test_entity_match_pairs_blocked_fuzzy(spark):
    from sales_analytics_etl_sql_powerbi_spark.operators.dims import (
        entity_match_pairs,
    )

    dim = spark.createDataFrame(
        [
            (1, "Acme Corp.", "CA"),
            (2, "ACME CORP", "CA"),      # same after normalization -> dist 0
            (3, "Acme Corpse", "CA"),    # dist 2 from 'acme corp'
            (4, "Acme Corp.", "NY"),     # different block -> never a candidate
            (5, "Zenith LLC", "CA"),     # unrelated
            (6, "acme corp", "CA"),
        ],
        "customer_id long, customer_name string, state_code string",
    )
    out = entity_match_pairs(dim, max_distance=2)
    pairs = {(r.key_a, r.key_b): r.distance for r in out.collect()}
    assert pairs[(1, 2)] == 0 and pairs[(1, 6)] == 0 and pairs[(2, 6)] == 0
    assert pairs[(1, 3)] == 2
    assert all(4 not in p and 5 not in p for p in pairs)
    # plan: blocked equi-join, never all-pairs
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # ordered=False (round 19) returns the same ROWS minus the
    # presentation sort (whose range exchange evaluates the verify
    # twice); the length pre-gate inside must not drop true pairs —
    # (1, 3) has |len diff| 1 and distance exactly max_distance
    unordered = entity_match_pairs(dim, max_distance=2, ordered=False)
    assert {
        (r.key_a, r.key_b): r.distance for r in unordered.collect()
    } == pairs
    uplan = unordered._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" not in uplan.lower()


def test_entity_match_prescan_audit_and_reuse(spark, sf_dir):
    """Round 14 (VERDICT r13 item 4): auto mode records the plan
    decision it made into ``audit`` so repeated matching against the
    same corpus can replay the resolved value and skip the eager
    prescan job entirely — with identical output (the decision only
    picks a plan shape)."""
    from sales_analytics_etl_sql_powerbi_spark.operators.dims import (
        entity_match_pairs,
    )

    dim = spark.createDataFrame(
        [
            (1, "Acme Corp.", "CA"),
            (2, "ACME CORP", "CA"),
            (3, "Acme Corpse", "CA"),
            (5, "Zenith LLC", "CA"),
            (6, "acme corp", "CA"),
        ],
        "customer_id long, customer_name string, state_code string",
    )
    # broadcast regime: a parquet-backed dim with KNOWN small stats
    # (the in-memory LocalRelation above estimates past the broadcast
    # threshold, so it exercises the shuffle leg below instead)
    from sales_analytics_etl_sql_powerbi_spark.sources.readers import read_table

    cust = read_table(spark, sf_dir, "customer")
    ab: dict = {}
    entity_match_pairs(
        cust, key="c_custkey", name_col="c_name", block_cols=["c_nationkey"],
        audit=ab,
    )
    assert ab["regime"] == "broadcast"
    assert ab["resolved_max_cell_size"] is None
    assert ab["prescan_seconds"] == 0.0

    a1: dict = {}
    first = entity_match_pairs(dim, audit=a1)
    got1 = {(r.key_a, r.key_b) for r in first.collect()}
    assert a1["regime"] in ("broadcast", "shuffle")

    # shuffle regime: force it, prescan runs once and is timed
    thr0 = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a2: dict = {}
        second = entity_match_pairs(dim, audit=a2)
        got2 = {(r.key_a, r.key_b) for r in second.collect()}
        assert a2["regime"] == "shuffle"
        assert "sampled_max_cell_scaled" in a2
        assert a2["prescan_seconds"] > 0.0
        resolved = a2["resolved_max_cell_size"]
        assert resolved is None or resolved >= 1

        # replay the resolved decision: no prescan, identical output
        a3: dict = {}
        third = entity_match_pairs(dim, max_cell_size=resolved, audit=a3)
        got3 = {(r.key_a, r.key_b) for r in third.collect()}
        assert a3 == {
            "regime": "explicit",
            "resolved_max_cell_size": resolved,
            "prescan_seconds": 0.0,
        }
        assert got1 == got2 == got3
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr0)


def test_scd2_strict_rejects_late_arriving_change(spark):
    """strict=True surfaces an inverted interval (a change whose
    effective_ts precedes the current row's valid_from) as a raise
    with the offending key named, instead of silently corrupt history;
    the default lax mode keeps the documented garbage-in contract."""
    import datetime as dt


    from sales_analytics_etl_sql_powerbi_spark.operators.dims import scd2_apply

    t1 = dt.datetime(2024, 6, 1)
    late = dt.datetime(2024, 3, 1)  # BEFORE the current row opened
    eot = dt.datetime(9999, 12, 31)
    dim = _scd_dim(spark, [(7, "CA", "90001", t1, eot, True)])
    changes = spark.createDataFrame(
        [(7, "WA", "98001", late)],
        "customer_id long, state_code string, postal_code string, effective_ts timestamp",
    )
    with pytest.raises(ValueError, match=r"late-arriving.*\[7\]"):
        scd2_apply(
            dim, changes, "customer_id", ["state_code", "postal_code"], strict=True
        )
    # lax mode: documented upstream contract, no check
    out = scd2_apply(dim, changes, "customer_id", ["state_code", "postal_code"])
    assert out.count() == 2


def test_scd2_strict_is_noop_for_in_order_batches(spark):
    import datetime as dt

    from sales_analytics_etl_sql_powerbi_spark.operators.dims import scd2_apply

    t0, t1 = dt.datetime(2024, 1, 1), dt.datetime(2024, 6, 1)
    eot = dt.datetime(9999, 12, 31)
    dim = _scd_dim(spark, [(1, "CA", "90001", t0, eot, True)])
    changes = spark.createDataFrame(
        [(1, "WA", "98001", t1), (9, "FL", "33101", t1)],
        "customer_id long, state_code string, postal_code string, effective_ts timestamp",
    )
    strict = scd2_apply(
        dim, changes, "customer_id", ["state_code", "postal_code"], strict=True
    )
    lax = scd2_apply(dim, changes, "customer_id", ["state_code", "postal_code"])
    assert strict.exceptAll(lax).count() == 0
    assert lax.exceptAll(strict).count() == 0


def test_scd2_apply_plan_is_key_equi_joins_no_full_dim_window(spark):
    """Scale guard: change detection + close-out are key equi-joins;
    there is NO window (sort over the whole dim) and no nested-loop /
    cartesian join anywhere in the apply plan."""
    import datetime as dt

    from sales_analytics_etl_sql_powerbi_spark.operators.dims import scd2_apply

    t0, t1 = dt.datetime(2024, 1, 1), dt.datetime(2024, 6, 1)
    eot = dt.datetime(9999, 12, 31)
    dim = _scd_dim(
        spark, [(i, "CA", "90001", t0, eot, True) for i in range(1, 50)]
    )
    changes = spark.createDataFrame(
        [(i, "WA", "98001", t1) for i in range(1, 60)],
        "customer_id long, state_code string, postal_code string, effective_ts timestamp",
    )
    out = scd2_apply(dim, changes, "customer_id", ["state_code", "postal_code"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_scd2_null_valid_from_is_not_a_new_key(spark):
    import datetime as dt

    from sales_analytics_etl_sql_powerbi_spark.operators.dims import scd2_apply

    t1 = dt.datetime(2024, 6, 1)
    dim = _scd_dim(spark, [(1, "CA", "90001", None, dt.datetime(9999, 12, 31), True)])
    changes = spark.createDataFrame(
        [(1, "CA", "90001", t1)],  # identical values: must be a no-op
        "customer_id long, state_code string, postal_code string, effective_ts timestamp",
    )
    out = scd2_apply(dim, changes, "customer_id", ["state_code", "postal_code"])
    assert out.count() == 1  # NOT spuriously closed + re-versioned


def test_entity_match_null_blocks_and_empty_names(spark):
    from sales_analytics_etl_sql_powerbi_spark.operators.dims import (
        entity_match_pairs,
    )

    dim = spark.createDataFrame(
        [
            (1, "Acme Corp", None),   # NULL state blocks with NULL state
            (2, "Acme Corp.", None),
            (3, "???", "CA"),         # empty after normalization
            (4, "!!!", "CA"),
        ],
        "customer_id long, customer_name string, state_code string",
    )
    pairs = {(r.key_a, r.key_b) for r in entity_match_pairs(dim).collect()}
    assert (1, 2) in pairs       # null-safe blocking
    assert (3, 4) not in pairs   # punctuation-only names excluded


def test_scd2_lookup_point_in_time(spark):
    import datetime as dt

    from sales_analytics_etl_sql_powerbi_spark.operators.dims import scd2_lookup

    t0, t1 = dt.datetime(2024, 1, 1), dt.datetime(2024, 6, 1)
    eot = dt.datetime(9999, 12, 31)
    dim = _scd_dim(
        spark,
        [
            (1, "CA", "90001", t0, t1, False),
            (1, "WA", "98001", t1, eot, True),
        ],
    )
    fact = spark.createDataFrame(
        [
            (100, 1, dt.datetime(2024, 3, 1)),   # during CA era
            (101, 1, t1),                         # exactly at change -> NEW version
            (102, 1, dt.datetime(2023, 1, 1)),   # before first version -> NULL
            (103, 9, dt.datetime(2024, 3, 1)),   # unknown key -> NULL
        ],
        "order_id long, customer_id long, ts timestamp",
    )
    out = {r.order_id: r.dim_state_code for r in
           scd2_lookup(fact, dim, "customer_id").collect()}
    assert out == {100: "CA", 101: "WA", 102: None, 103: None}
    # exactly one output row per fact row (intervals partition time)
    assert scd2_lookup(fact, dim, "customer_id").count() == 4


def test_cdc_apply_insert_update_delete_lastwriter(spark):
    from sales_analytics_etl_sql_powerbi_spark.operators.dims import cdc_apply

    snap = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    ch = spark.createDataFrame(
        [
            (2, "b2", "U", 10),          # update
            (3, None, "D", 11),          # delete
            (4, "d", "I", 12),           # insert
            (5, "e1", "I", 13),          # insert then update: seq 14 wins
            (5, "e2", "U", 14),
            (6, "f", "I", 15),           # insert then delete: gone
            (6, None, "D", 16),
        ],
        "k long, v string, op string, seq long",
    )
    out = {r.k: r.v for r in cdc_apply(snap, ch, "k").collect()}
    assert out == {1: "a", 2: "b2", 4: "d", 5: "e2"}


def test_cdc_apply_idempotent_replay(spark):
    from sales_analytics_etl_sql_powerbi_spark.operators.dims import cdc_apply

    snap = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    ch = spark.createDataFrame(
        [(1, None, "D", 5), (3, "c", "I", 6)], "k long, v string, op string, seq long"
    )
    once = cdc_apply(snap, ch, "k")
    twice = cdc_apply(once, ch, "k")
    assert sorted((r.k, r.v) for r in once.collect()) == sorted(
        (r.k, r.v) for r in twice.collect()
    )
    assert {r.k for r in once.collect()} == {2, 3}


def test_cdc_apply_window_is_batch_side_only(spark):
    """The dedup window must sit over the change batch, not the
    snapshot — the snapshot side sees only the anti-join."""
    from sales_analytics_etl_sql_powerbi_spark.operators.dims import cdc_apply

    snap = spark.createDataFrame([(i, "x") for i in range(100)], "k long, v string")
    ch = spark.createDataFrame(
        [(1, "y", "U", 1)], "k long, v string, op string, seq long"
    )
    out = cdc_apply(snap, ch, "k")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the dedup window ran ONCE, inside the eager batch-side
    # checkpoint — the downstream plan reads the materialized batch,
    # so no Window (and certainly none over the snapshot) remains
    assert plan.count("Window") == 0, plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_entity_clusters_transitive_and_singletons(spark):
    """A~B and B~C collapse into ONE entity even though A and C are
    distance 4 apart (never a direct pair); unmatched records stay
    their own entity; entity_id = min key in the component."""
    from sales_analytics_etl_sql_powerbi_spark.operators.dims import (
        entity_clusters,
    )

    dim = spark.createDataFrame(
        [
            (10, "acme corp", "CA"),
            (11, "acme corpx", "CA"),    # dist 1 from 10
            (12, "acme corpxx", "CA"),   # dist 1 from 11, dist 2 from 10
            (13, "acme corpxxxx", "CA"), # dist 2 from 12, 4 from 10 -> chained in
            (20, "zenith llc", "CA"),    # singleton
        ],
        "customer_id long, customer_name string, state_code string",
    )
    out = {r.customer_id: r.entity_id for r in entity_clusters(dim).collect()}
    assert out[10] == out[11] == out[12] == out[13] == 10
    assert out[20] == 20


def test_entity_clusters_accepts_prebuilt_pairs(spark):
    from pyspark.sql import functions as F

    from sales_analytics_etl_sql_powerbi_spark.operators.dims import (
        entity_clusters,
        entity_match_pairs,
    )

    dim = spark.createDataFrame(
        [(1, "acme corp", "CA"), (2, "acme corpx", "CA"), (3, "other", "CA")],
        "customer_id long, customer_name string, state_code string",
    )
    pairs = entity_match_pairs(dim)
    via_pairs = {
        r.customer_id: r.entity_id
        for r in entity_clusters(dim, pairs=pairs).collect()
    }
    direct = {
        r.customer_id: r.entity_id for r in entity_clusters(dim).collect()
    }
    assert via_pairs == direct == {1: 1, 2: 1, 3: 3}


def test_entity_match_auto_salt_output_identical(spark):
    """max_cell_size salting (VERDICT r6 item 5) is pure
    parallelization: the salted join must return EXACTLY the pairs of
    the unsalted join — each (a, b) pair meets once, at a's salt,
    because side B is replicated across every salt of its cell."""
    from pyspark.sql import functions as F

    from sales_analytics_etl_sql_powerbi_spark.operators.dims import (
        entity_match_pairs,
    )

    # one degenerate cell: 300 names sharing block+prefix, near-dup
    # neighbors at distance 1 (id and id+1 share 'entity N'/'entity M'
    # names close in edit distance), plus a healthy small cell
    hot = spark.range(300).select(
        F.col("id").alias("customer_id"),
        F.concat(F.lit("zz entity "), (F.col("id") / 10).cast("int").cast("string"))
        .alias("customer_name"),
        F.lit("HOT").alias("state_code"),
    )
    cold = spark.createDataFrame(
        [(1000, "acme corp", "CA"), (1001, "acme corpx", "CA")],
        "customer_id long, customer_name string, state_code string",
    )
    dim = hot.unionByName(cold)
    unsalted = {
        (r.key_a, r.key_b, r.distance)
        for r in entity_match_pairs(dim).collect()
    }
    salted = {
        (r.key_a, r.key_b, r.distance)
        for r in entity_match_pairs(dim, max_cell_size=50).collect()
    }
    assert salted == unsalted and len(unsalted) > 100
    # salt columns must not leak into the output schema
    cols = entity_match_pairs(dim, max_cell_size=50).columns
    assert cols == ["key_a", "key_b", "name_a", "name_b", "distance"]

    with pytest.raises(ValueError):
        entity_match_pairs(dim, max_cell_size=0)


def test_entity_match_auto_regime_detection(spark):
    """max_cell_size='auto' (the default — VERDICT r7 item 4) picks
    the regime from Spark's own broadcast decision statistic: a
    broadcastable side → UNSALTED plan (salting measured 2–4× worse
    there); broadcasting disabled/oversized → SALTED plan — with
    identical output either way."""
    from pyspark.sql import functions as F

    from sales_analytics_etl_sql_powerbi_spark.operators.dims import (
        entity_match_pairs,
    )

    # ONE degenerate (block, prefix) cell of 600 rows: over the 250
    # cap AND 100% of the pair work — both regime rules (r7 cap, r13
    # hot-dominates prescan) must salt it in the shuffle regime
    dim = spark.range(600).select(
        F.col("id").alias("customer_id"),
        F.concat(
            F.lit("zz entity "), (F.col("id") / 10).cast("int").cast("string")
        ).alias("customer_name"),
        F.lit("HOT").alias("state_code"),
    )

    def analyzed(df):
        return str(df._jdf.queryExecution().analyzed())

    # broadcast regime (default 10MB threshold, tiny side): no salt
    auto_bcast = entity_match_pairs(dim)
    assert "__salt" not in analyzed(auto_bcast)
    # shuffle regime (broadcasting disabled): auto engages salting
    prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        auto_shuffle = entity_match_pairs(dim)
        assert "__salt" in analyzed(auto_shuffle)
        got_shuffle = {
            (r.key_a, r.key_b, r.distance) for r in auto_shuffle.collect()
        }
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
    got_bcast = {
        (r.key_a, r.key_b, r.distance) for r in auto_bcast.collect()
    }
    assert got_shuffle == got_bcast and len(got_bcast) > 50
    with pytest.raises(ValueError, match="auto"):
        entity_match_pairs(dim, max_cell_size="always")


def test_entity_match_auto_skips_salt_on_mild_skew(spark):
    """Round 13 refinement (10M Zipfian probe): in the SHUFFLE regime,
    auto runs a prescan and salts only when the hottest cell's pair
    work exceeds an average reducer's share — mild skew (many small
    cells) keeps the cheaper unsalted plan, with identical output."""
    from pyspark.sql import functions as F

    from sales_analytics_etl_sql_powerbi_spark.operators.dims import (
        entity_match_pairs,
    )

    # 2000 rows spread over 100 (block, prefix) cells of 20: every
    # cell far below the 250 cap, no dominant cell
    dim = spark.range(2000).select(
        F.col("id").alias("customer_id"),
        F.concat(
            F.chr(F.lit(97) + F.col("id") % 10),
            F.chr(F.lit(97) + F.floor(F.col("id") / 10) % 10),
            F.lit(" entity "),
            (F.col("id") % 5).cast("string"),
        ).alias("customer_name"),
        F.lit("HOT").alias("state_code"),
    )
    prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        auto = entity_match_pairs(dim)
        assert "__salt" not in str(auto._jdf.queryExecution().analyzed())
        got = {(r.key_a, r.key_b) for r in auto.collect()}
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
    forced = {
        (r.key_a, r.key_b)
        for r in entity_match_pairs(dim, max_cell_size=50).collect()
    }
    assert got == forced and len(got) > 100
