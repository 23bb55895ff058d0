"""Sinks — SURVEY §2.1 S5–S9.

The reference writes with chunked parameterized INSERTs
(reference etl/order_info_etl.py:68-102) into SQL Server tables created
by IF-NOT-EXISTS DDL (:260-313) and truncate-reloaded staging (:316).
On Spark those collapse to Parquet write modes — the batching machinery
is non-semantic; what must survive is:

- append vs truncate-reload (idempotent rerun) semantics;
- create-if-not-exists;
- default column values (load_ts = now, units = 1 —
  reference stg_order_export_raw.Table.sql:77, fact_sales.Table.sql:58).
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def write_append(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """S5 — batch append sink (reference etl/order_info_etl.py:68-102,351).

    ``partition_by`` matters at scale: the fact table partitioned by a
    date column turns every date-range query into partition pruning
    instead of a full scan.
    """
    w = df.write.mode("append")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_overwrite(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    cluster_by: list[str] | None = None,
) -> None:
    """S7 — truncate-reload (reference etl/order_info_etl.py:316).

    ``cluster_by`` range-partitions + sorts rows within files on the
    given columns before writing — parquet row-group min/max stats then
    let any scan filtered on those columns skip whole row groups
    (the poor man's Z-order; the right layout for a fact table queried
    by state/product at 100 TB).
    """
    if cluster_by:
        df = df.repartitionByRange(*cluster_by).sortWithinPartitions(*cluster_by)
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def create_table_if_not_exists(df: DataFrame, path: str) -> bool:
    """S6 — IF NOT EXISTS CREATE (reference etl/order_info_etl.py:260-313).

    Writes an empty frame with ``df``'s schema when the target is absent;
    returns True if it created the table. Parquet-path flavored (no
    catalog dependency); with a metastore this is
    ``CREATE TABLE IF NOT EXISTS`` instead.
    """
    if os.path.exists(os.path.join(path, "_SUCCESS")) or (
        os.path.isdir(path) and any(n.endswith(".parquet") for n in os.listdir(path))
    ):
        return False
    df.limit(0).write.mode("overwrite").parquet(path)
    return True


def with_load_defaults(
    df: DataFrame,
    load_ts_col: str = "load_ts",
    defaults: dict[str, Column] | None = None,
) -> DataFrame:
    """S8 — default column values.

    ``load_ts DEFAULT GETDATE()`` (reference stg_order_export_raw.Table.sql:77)
    and any ``COALESCE(col, default)`` style defaults
    (units=1 — reference fact_sales.Table.sql:58).
    """
    out = df.withColumn(load_ts_col, F.current_timestamp())
    for name, default in (defaults or {}).items():
        if name in out.columns:
            out = out.withColumn(name, F.coalesce(F.col(name), default))
        else:
            out = out.withColumn(name, default)
    return out


def register_temp_view(df: DataFrame, name: str) -> DataFrame:
    """S9 — staging/temp table (reference #tmp_dim_date, etl/order_info_etl.py:143).

    Spark temp views are session-scoped plan aliases — the reference's
    cross-connection temp-table visibility problem does not exist here.
    """
    df.createOrReplaceTempView(name)
    return df


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: list[str],
    n_buckets: int = 32,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table — the co-located-join layout.

    At 100 TB the star's only non-broadcastable joins are fact-to-fact
    (lineitem⋈orders) and fact-to-huge-dim; writing BOTH sides bucketed
    (and optionally sorted) on the join key means the join needs NO
    exchange at read time — Spark matches the bucket specs and plans a
    shuffle-free (and with sort_by, merge-ready) join. This is the
    write-once-join-many amortization a warehouse load should always
    buy. Bucketing requires the table catalog (``saveAsTable``), not a
    bare path.
    """
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_by)
    if sort_by:
        w = w.sortBy(*sort_by)
    w.format("parquet").saveAsTable(table)


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    key: str = "doc_id",
    salt: str = "",
) -> None:
    """Materialize :func:`operators.sampling.training_shards` as
    one parquet file per ``shard=N/`` directory.

    Layout contract: ``repartition(n_shards, shard)`` gives every
    shard exactly one task (hash collisions may co-locate two shards
    in a task — ``partitionBy`` still splits them into their own
    directories, each written by that single task, so one data file
    per shard holds); ``sortWithinPartitions(shard, __ord, key)``
    pins the within-file row order to the content hash. Result: two
    runs over the same rows produce byte-identical shard files
    regardless of input partitioning — the property that makes
    training jobs resumable and data lineage auditable. The order
    hash is dropped from the written schema; ``shard`` survives as
    the partition directory.

    Scale: one shuffle (the repartition) + a sort of each task's
    rows. Pick n_shards ≈ total_bytes / desired_file_size; shard
    task memory is corpus/n_shards, so at 100 TB use thousands of
    shards, not tens.
    """
    from ..operators.sampling import training_shards

    sharded = training_shards(df, n_shards, key, salt)
    (
        sharded.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "__ord", key)
        .drop("__ord")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
