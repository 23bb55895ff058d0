"""PySpark-native analytics engine with the capabilities of
felipep57/sales-analytics-etl-sql-powerbi.

The reference is a pandas + SQL Server + Power BI sales-analytics star
schema (see SURVEY.md). This package re-expresses its entire operator
surface Spark-first:

- ``sources``   : CSV / Excel / Parquet readers and sinks (SURVEY 2.1)
- ``functions`` : row-wise cleaning & derivation expressions (2.2, 2.8)
- ``operators`` : dims / fact / rules / analytics / quality (2.3-2.7)
                  plus beyond-reference dedup, similarity, text ops
- ``pipeline``  : end-to-end star build (staging → dims → fact → view)
- ``oracles``   : DuckDB SQL twins of every pipeline derivation
- ``streaming`` : Structured Streaming windows & dedup (beyond-reference)

Everything is declarative DataFrame / Spark SQL — Catalyst does the
optimization; no RDDs, no driver-side row loops.
"""

__version__ = "0.1.0"
