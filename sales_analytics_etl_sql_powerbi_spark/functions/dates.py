"""Calendar / date-part expressions — SURVEY §2.8 F10/F11.

The reference builds ``dim_date`` rows in pandas
(reference etl/order_info_etl.py:104-154): a daily ``pd.date_range``
from the min to the max fact timestamp, with derived attributes

    year, quarter ((m-1)//3+1), month, month_name ('%B' full name),
    day, day_of_week (Mon=1..Sun=7), is_weekend (dow>=6 in that
    numbering → Sat/Sun), stored as 0/1 int
    (reference etl/order_info_etl.py:112-120).

``day_name`` exists in the DDL (reference sql/schema/dim_date.Table.sql:36)
and the reporting view but is never populated by the reference ETL —
we compute it anyway ('EEE' 3-letter) and document the divergence.

Here the whole calendar is ONE distributed expression:
``sequence(min, max, interval 1 day)`` + ``explode`` — no driver-side
date loop, works for a 50-year calendar as well as a 5-day one.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["date_attributes", "calendar_frame", "DATE_PART_SQL"]


def date_attributes(d: Column | str) -> dict[str, Column]:
    """Column map of every dim_date attribute derived from date ``d``.

    Mirrors reference etl/order_info_etl.py:112-120 value-for-value:
    day_of_week is ISO (Mon=1..Sun=7), is_weekend is an int 0/1
    (the DDL's BIT — reference sql/schema/dim_date.Table.sql:35).
    """
    c = F.col(d) if isinstance(d, str) else d
    dow = F.weekday(c) + F.lit(1)  # Spark weekday(): Mon=0..Sun=6
    return {
        "year": F.year(c).cast("int"),
        "quarter": F.quarter(c).cast("int"),
        "month": F.month(c).cast("int"),
        "month_name": F.date_format(c, "MMMM"),
        "day": F.dayofmonth(c).cast("int"),
        "day_of_week": dow.cast("int"),
        "is_weekend": (dow >= F.lit(6)).cast("int"),
        "day_name": F.date_format(c, "EEE"),
    }


#: DuckDB SQL text for each attribute (for oracle parity checks).
#: isodow() is Mon=1..Sun=7 like the reference; monthname()/
#: strftime('%a') match Spark's 'MMMM'/'EEE' for the English locale.
DATE_PART_SQL: dict[str, str] = {
    "year": "cast(year({d}) as int)",
    "quarter": "cast(quarter({d}) as int)",
    "month": "cast(month({d}) as int)",
    "month_name": "monthname({d})",
    "day": "cast(day({d}) as int)",
    "day_of_week": "cast(isodow({d}) as int)",
    "is_weekend": "cast(isodow({d}) >= 6 as int)",
    "day_name": "strftime({d}, '%a')",
}


def calendar_frame(
    spark: SparkSession,
    start: Column | str,
    end: Column | str,
    bounds_df: DataFrame | None = None,
) -> DataFrame:
    """Daily calendar [start, end] with all dim_date attributes.

    ``bounds_df`` is a 1-row frame carrying the min/max columns (the
    usual producer is ``df.agg(F.min(ts), F.max(ts))``); when omitted,
    ``start``/``end`` must be literal Columns and a 1-row dummy frame
    is used. The range is generated with ``sequence`` + ``explode`` on
    the executors — a 100-year calendar is ~36k rows from a single
    upstream row, no driver loop (reference builds this in pandas,
    etl/order_info_etl.py:112-113).
    """
    s = F.col(start) if isinstance(start, str) else start
    e = F.col(end) if isinstance(end, str) else end
    base = bounds_df if bounds_df is not None else spark.range(1)
    days = base.select(
        F.explode(
            F.sequence(s.cast("date"), e.cast("date"), F.expr("interval 1 day"))
        ).alias("date_id")
    )
    return days.withColumns(date_attributes("date_id"))
