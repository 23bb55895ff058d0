"""SparkSession factory tuned for this engine.

Local testing runs on ``local[N]``; the configs below are the ones that
matter identically on a 1000-executor cluster reading 100 TB:

- AQE on (coalesce post-shuffle partitions, skew-join splitting) — the
  state/platform unit shares in the reference are genuinely skewed
  (FL ~10%, Amazon ~56%; reference README.md:152-158), so skew handling
  is semantic, not hypothetical.
- ``spark.sql.session.timeZone=UTC`` — oracle (DuckDB) timestamps are
  UTC-naive; pinning the session TZ makes window/date results
  engine-independent.
- shuffle partitions default to cores locally; at cluster scale this is
  overridden by AQE's coalescing from
  ``spark.sql.adaptive.coalescePartitions.initialPartitionNum``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "sales-analytics-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    force_skew_split: bool = False,
) -> SparkSession:
    """Build (or reuse) the tuned SparkSession.

    ``force_skew_split`` sets ``spark.sql.adaptive.forceOptimizeSkewedJoin``,
    which makes AQE split skewed join partitions even when the split
    forces an extra shuffle downstream. Background (measured in the
    round-4 AQE probe, ``scripts/stress.py --skew``, PLAN_AUDIT.md): a
    20M-row join where one key carries 50% of the rows completes in
    ~4.9s with the default settings — AQE splits the skewed partition
    (``SortMergeJoin(skew=true)``) whenever the join output feeds a
    global aggregate, a DIFFERENT-key aggregation, or a write. The one
    shape where AQE declines to split is a groupBy on the SAME key as
    the join (the split would break the reusable hash distribution and
    force a re-shuffle). Flip this knob ON for deployments where that
    same-key-downstream skew hurts more than the extra exchange —
    e.g. a platform-share rollup immediately after a platform-keyed
    join under an Amazon-56%-of-units distribution; leave it OFF
    (default) when the downstream aggregate benefits from reusing the
    join's partitioning. Manual salting (``operators/skew.py``) remains
    the surgical per-join alternative.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or cpus

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        # -- determinism / oracle parity --
        .config("spark.sql.session.timeZone", "UTC")
        # -- adaptive execution: post-shuffle coalesce + skew-join --
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config(
            "spark.sql.adaptive.forceOptimizeSkewedJoin",
            "true" if force_skew_split else "false",
        )
        # -- shuffle sizing --
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # -- scan sizing: 128MB splits keep 100TB scans at ~800k tasks --
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # -- broadcast: dims in the star schema are tiny; let Catalyst
        #    broadcast them (explicit broadcast() hints are still used at
        #    join sites for clarity) --
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # -- Arrow for the few pandas interchange points (Excel shim,
        #    pandas_udf variants) --
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # -- Arrow batch rows cap the per-batch memory of every
        #    pandas_udf/mapInPandas worker; lower via env for
        #    memory-tight single-node stress runs (round 15) --
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            os.environ.get("SPARK_GRAFT_ARROW_BATCH", "10000"),
        )
        # -- a crashed Python worker dumps a traceback instead of the
        #    bare "exited unexpectedly" (cost: one extra signal handler)
        .config("spark.python.worker.faulthandler.enabled", "true")
        # -- the driver's events.parquet carries INT64 TIMESTAMP(NANOS)
        #    which Spark's parquet reader rejects by default; read as
        #    long and convert (readers.read_events) --
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", os.environ.get("SPARK_UI", "false"))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    # reliable checkpoint dir (used by keys.with_dense_id to pin range
    # partitioning): on a cluster point this at durable storage so the
    # numbering materialization survives executor loss; unset, the code
    # falls back to localCheckpoint (fails loudly instead of silently
    # recomputing).
    ckpt = os.environ.get("SPARK_CHECKPOINT_DIR")
    if ckpt and spark.sparkContext.getCheckpointDir() is None:
        spark.sparkContext.setCheckpointDir(ckpt)
    return spark
