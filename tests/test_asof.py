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


def _pandas_oracle_frames():
    """Deterministic numeric-ts fixture with multiple keys, gaps, and
    rows before/after all matches; right ts distinct per key so pandas
    tie rules don't diverge from our tiebreak rule."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(11)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 3, 40),
            "ts": np.sort(rng.choice(np.arange(0, 400, dtype=np.int64), 40, replace=False)).astype(float),
        }
    )
    left["lid"] = np.arange(40)
    right = pd.DataFrame(
        {
            "k": rng.integers(0, 3, 30),
            "ts": np.sort(rng.choice(np.arange(0, 400, dtype=np.int64), 30, replace=False)).astype(float),
        }
    )
    right["value"] = np.arange(30).astype(float) * 10
    right = right.drop_duplicates(subset=["k", "ts"])
    return left, right


def _merge_asof(left, right, direction, tolerance=None):
    import pandas as pd

    out = pd.merge_asof(
        left.sort_values(["ts", "lid"]),
        right.sort_values("ts"),
        on="ts",
        by="k",
        direction=direction,
        tolerance=tolerance,
    )
    return {int(r.lid): (None if pd.isna(r.value) else float(r.value)) for r in out.itertuples()}


def _spark_asof(spark, fn, left, right, **kw):
    l = spark.createDataFrame(left)
    r = spark.createDataFrame(right)
    out = fn(l, r, on="k", ts="ts", payload=("value",), **kw)
    return {int(row.lid): row.asof_value for row in out.collect()}


def test_asof_directions_match_pandas_merge_asof(spark):
    from sales_analytics_etl_sql_powerbi_spark.operators.asof import (
        asof_forward,
        asof_nearest,
    )

    left, right = _pandas_oracle_frames()
    assert _spark_asof(spark, asof_backward, left, right) == _merge_asof(
        left, right, "backward"
    )
    assert _spark_asof(spark, asof_forward, left, right) == _merge_asof(
        left, right, "forward"
    )
    assert _spark_asof(
        spark, asof_nearest, left, right, left_key="lid"
    ) == _merge_asof(left, right, "nearest")


def test_asof_tolerance_matches_pandas(spark):
    from sales_analytics_etl_sql_powerbi_spark.operators.asof import (
        asof_forward,
        asof_nearest,
    )

    left, right = _pandas_oracle_frames()
    for fn, direction, kw in (
        (asof_backward, "backward", {}),
        (asof_forward, "forward", {}),
        (asof_nearest, "nearest", {"left_key": "lid"}),
    ):
        got = _spark_asof(spark, fn, left, right, tolerance_seconds=25.0, **kw)
        want = _merge_asof(left, right, direction, tolerance=25.0)
        assert got == want, direction
