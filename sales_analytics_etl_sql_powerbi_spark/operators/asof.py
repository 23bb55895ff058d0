"""As-of (backward) join — a custom operator Spark lacks natively.

``asof_backward(left, right, ...)``: each left row picks the most
recent right row with ``right.ts <= left.ts`` per key — the
time-series enrichment join (kdb ``aj``, pandas ``merge_asof``,
Flink temporal join). The naive formulation is a range join whose
candidate set explodes quadratically per key; this implementation is
the scalable shape:

1. union both sides with a side tag (right rows carry their payload,
   left rows carry NULLs);
2. ONE shuffle: window over (key) ordered by (ts, side, tiebreak) —
   right rows sort before left rows at equal ts, so ``<=`` is
   inclusive, and the tiebreak column makes equal-timestamp right rows
   deterministic;
3. ``last(payload, ignorenulls=True)`` over ROWS UNBOUNDED
   PRECEDING..CURRENT carries the latest right payload forward;
4. keep the left rows.

Cost: one hash exchange + one sort per side — same as a groupBy, with
none of the range-join blowup; at 100 TB the key partitioning spreads
users/instruments across executors and AQE handles skewed keys. The
DuckDB twin uses the identical window formulation (portable SQL — not
DuckDB's ASOF JOIN, whose equal-timestamp winner is unspecified), so
results hash-match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_backward", "events_asof", "events_asof_sql"]


def asof_backward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str = "ts",
    payload: tuple[str, ...] = ("value",),
    tiebreak: str | None = None,
) -> DataFrame:
    """Left rows + the latest right payload at-or-before their ts.

    ``payload`` columns arrive prefixed ``asof_``; left rows with no
    prior right row get NULLs (left-join semantics). ``tiebreak``
    (default: first payload column) orders equal-timestamp right rows
    deterministically — the LAST one in (ts, tiebreak) order wins.
    """
    tiebreak = tiebreak or payload[0]
    lcols = left.columns
    l = left.select(
        *lcols,
        F.lit(1).alias("__side"),
        F.lit(None).cast(right.schema[tiebreak].dataType).alias("__tb"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"__p_{c}")
            for c in payload
        ],
    )
    r = right.select(
        *[
            F.col(c) if c in (on, ts) else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
        ],
        F.lit(0).alias("__side"),
        F.col(tiebreak).alias("__tb"),
        *[F.col(c).alias(f"__p_{c}") for c in payload],
    )
    u = l.unionByName(r)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts).asc(), F.col("__side").asc(), F.col("__tb").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = [
        F.last(f"__p_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
        for c in payload
    ]
    return (
        u.select(*lcols, "__side", *carried)
        .where(F.col("__side") == 1)
        .drop("__side")
    )


def events_asof(
    events: DataFrame,
    anchor_type: str = "purchase",
    source_type: str = "view",
) -> DataFrame:
    """Each anchor event + the user's most recent prior source event.

    The canonical funnel question ("which view preceded this
    purchase?") as one as-of join keyed by user.
    """
    anchors = events.where(F.col("event_type") == anchor_type).select(
        "event_id", "user_id", "ts"
    )
    sources = events.where(F.col("event_type") == source_type).select(
        "user_id", "ts", F.col("event_id").alias("src_event_id"), "value"
    )
    out = asof_backward(
        anchors,
        sources,
        on="user_id",
        ts="ts",
        payload=("src_event_id", "value"),
        tiebreak="src_event_id",
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("asof_src_event_id").alias("prior_view_id"),
        F.col("asof_value").alias("prior_view_value"),
    ).orderBy("event_id")


def events_asof_sql(
    anchor_type: str = "purchase", source_type: str = "view"
) -> str:
    """Window-formulation twin (same ordering, same inclusive <=)."""
    return f"""
WITH u AS (
  SELECT event_id, user_id, ts, 1 AS side,
         NULL::BIGINT AS tb, NULL::BIGINT AS p_id, NULL::DOUBLE AS p_value
  FROM events WHERE event_type = '{anchor_type}'
  UNION ALL
  SELECT NULL::BIGINT, user_id, ts, 0 AS side,
         event_id AS tb, event_id AS p_id, value AS p_value
  FROM events WHERE event_type = '{source_type}'
),
carried AS (
  SELECT *,
         last_value(p_id IGNORE NULLS) OVER w AS prior_view_id,
         last_value(p_value IGNORE NULLS) OVER w AS prior_view_value
  FROM u
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, side ASC, tb ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_id, user_id, ts, prior_view_id, prior_view_value
FROM carried WHERE side = 1
ORDER BY event_id
"""
