"""As-of backward join semantics on hand-built rows."""

from datetime import datetime

from sales_analytics_etl_sql_powerbi_spark.operators.asof import (
    asof_backward,
    events_asof,
)


def ts(m):
    return datetime(2024, 1, 1, 12, m)


def test_asof_backward_picks_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [(1, 10, ts(5)), (2, 10, ts(10)), (3, 10, ts(1)), (4, 20, ts(9))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        # user 10: sources at :2 and :5 (equal-ts inclusive), user 20: none
        [(10, ts(2), 100, 1.0), (10, ts(5), 101, 2.0)],
        "user_id long, ts timestamp, src_event_id long, value double",
    )
    out = asof_backward(
        left, right, on="user_id", ts="ts",
        payload=("src_event_id", "value"), tiebreak="src_event_id",
    )
    got = {r.event_id: (r.asof_src_event_id, r.asof_value) for r in out.collect()}
    assert got[1] == (101, 2.0)  # equal timestamp is inclusive (<=)
    assert got[2] == (101, 2.0)  # latest prior, not just any prior
    assert got[3] == (None, None)  # nothing at-or-before
    assert got[4] == (None, None)  # key with no right rows


def test_asof_equal_ts_tiebreak_deterministic(spark):
    left = spark.createDataFrame(
        [(1, 5, ts(3))], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(5, ts(3), 7, 1.0), (5, ts(3), 9, 2.0)],
        "user_id long, ts timestamp, src_event_id long, value double",
    )
    out = asof_backward(
        left, right, on="user_id", ts="ts",
        payload=("src_event_id", "value"), tiebreak="src_event_id",
    ).collect()
    assert (out[0].asof_src_event_id, out[0].asof_value) == (9, 2.0)  # max tb wins


def test_events_asof_shape(spark, sf_dir):
    from sales_analytics_etl_sql_powerbi_spark.sources.readers import read_table

    out = events_asof(read_table(spark, sf_dir, "events"))
    rows = out.collect()
    assert len(rows) > 0
    assert {f.name for f in out.schema.fields} == {
        "event_id", "user_id", "ts", "prior_view_id", "prior_view_value",
    }
    assert any(r.prior_view_id is not None for r in rows)
