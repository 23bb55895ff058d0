"""Streaming CDC replication into a versioned parquet snapshot.

The composition that turns :func:`..operators.dims.cdc_apply` into a
continuously-replicated table WITHOUT a table format: each micro-batch
of I/U/D change rows is merged onto the current snapshot and published
as a NEW versioned directory (``v=N/``), then a tiny ``_LATEST``
pointer file is swapped. Readers always open the pointed-at version —
they never observe a half-written directory (publish-then-swap, the
same discipline ``compact_parquet`` documents). Old versions remain
until pruned (time travel for free; ``prune_versions`` keeps the last
k).

This is deliberately a "table format lite": single-writer,
last-pointer-wins. A production deployment with concurrent writers
wants Delta/Iceberg — the OPERATOR (cdc_apply) is unchanged there;
only this publish mechanism is.

CROSS-BATCH ordering (the guarantee `cdc_apply` alone cannot give —
it compares sequences only within one batch): the stored snapshot
carries two hidden columns, ``__cdc_seq`` (the sequence of the change
that produced each row) and ``__cdc_deleted`` (deletes persist as
TOMBSTONES rather than vanishing). Every incoming change row is
dropped as STALE when its sequence is ≤ the stored row's — so
out-of-order batch delivery (file sources tie-break equal mtimes
arbitrarily) and re-delivered old batches cannot regress a key to an
older value, and a re-delivered insert cannot resurrect a
higher-sequence delete. ``read_snapshot`` hides both columns and the
tombstones; ``read_snapshot(..., internal=True)`` shows them.
Tombstones are retained indefinitely (the price of the guarantee
without a log); a deployment with a bounded out-of-order window can
compact them away past the window.

Failure contract: a crash between writing ``v=N`` and swapping the
pointer leaves the table at ``v=N−1`` with an orphan directory — the
checkpoint will replay the micro-batch, rewrite ``v=N`` (overwrite)
and swap; replay is safe because the stale-sequence filter makes the
merge idempotent.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dims import cdc_apply

__all__ = [
    "snapshot_init",
    "read_snapshot",
    "latest_version",
    "apply_cdc_batch",
    "stream_cdc_apply",
    "prune_versions",
]

_LATEST = "_LATEST"


def _version_dir(table_path: str, v: int) -> str:
    return os.path.join(table_path, f"v={v}")


def latest_version(table_path: str) -> int | None:
    p = os.path.join(table_path, _LATEST)
    if not os.path.exists(p):
        return None
    with open(p) as fh:
        return int(fh.read().strip())


def _publish(table_path: str, v: int) -> None:
    # write-then-rename: the pointer file appears atomically
    tmp = os.path.join(table_path, f".{_LATEST}.tmp")
    with open(tmp, "w") as fh:
        fh.write(str(v))
    os.replace(tmp, os.path.join(table_path, _LATEST))


def snapshot_init(df: DataFrame, table_path: str) -> int:
    """Create version 0 from an initial load and publish it. Initial
    rows carry sequence −∞ (any change supersedes them)."""
    os.makedirs(table_path, exist_ok=True)
    seeded = df.withColumn(
        "__cdc_seq", F.lit(-(2**63)).cast("long")
    ).withColumn("__cdc_deleted", F.lit(False))
    seeded.write.mode("overwrite").parquet(_version_dir(table_path, 0))
    _publish(table_path, 0)
    return 0


def read_snapshot(
    spark: SparkSession,
    table_path: str,
    version: int | None = None,
    internal: bool = False,
) -> DataFrame:
    """Open the pointed-at (or an explicit historical) version.
    ``internal=True`` exposes the ``__cdc_seq``/``__cdc_deleted``
    bookkeeping columns and the delete tombstones."""
    v = latest_version(table_path) if version is None else version
    if v is None:
        raise FileNotFoundError(f"no published snapshot under {table_path!r}")
    df = spark.read.parquet(_version_dir(table_path, v))
    if internal:
        return df
    return df.where(~F.col("__cdc_deleted")).drop("__cdc_seq", "__cdc_deleted")


def apply_cdc_batch(
    spark: SparkSession,
    table_path: str,
    changes: DataFrame,
    key: str,
    seq_col: str = "seq",
    op_col: str = "op",
) -> int:
    """Merge one change batch → write v=N+1 → swap the pointer.

    Returns the published version. Stale rows (sequence ≤ the stored
    row's ``__cdc_seq``) are dropped BEFORE the merge, so re-delivered
    or out-of-order batches — including replays of already-applied
    batches — never regress a key; deletes become tombstone rows so
    the stale filter also guards them.
    """
    cur_v = latest_version(table_path)
    if cur_v is None:
        raise FileNotFoundError(
            f"no published snapshot under {table_path!r} — snapshot_init first"
        )
    snap = spark.read.parquet(_version_dir(table_path, cur_v))
    # drop stale changes: anything at or below the stored sequence
    stored_seq = snap.select(key, F.col("__cdc_seq").alias("__stored_seq"))
    fresh = (
        changes.join(stored_seq, on=key, how="left")
        .where(
            F.col("__stored_seq").isNull()
            | (F.col(seq_col) > F.col("__stored_seq"))
        )
        .drop("__stored_seq")
    )
    # deletes persist as tombstones: every change becomes an upsert
    # carrying its own sequence + deleted flag, so cdc_apply's delete
    # path is bypassed and the row (with bookkeeping) survives
    as_upserts = fresh.withColumn("__cdc_seq", F.col(seq_col).cast("long")) \
        .withColumn("__cdc_deleted", F.col(op_col) == "D") \
        .withColumn(op_col, F.lit("U"))
    merged = cdc_apply(snap, as_upserts, key, seq_col=seq_col, op_col=op_col)
    new_v = cur_v + 1
    merged.write.mode("overwrite").parquet(_version_dir(table_path, new_v))
    _publish(table_path, new_v)
    return new_v


def stream_cdc_apply(
    change_stream: DataFrame,
    table_path: str,
    key: str,
    checkpoint_dir: str,
    seq_col: str = "seq",
    op_col: str = "op",
    available_now: bool = True,
):
    """Continuous replication: foreachBatch(cdc merge + publish).

    Each micro-batch publishes one new version; the streaming
    checkpoint provides exactly-once batch tracking on top of the
    idempotent merge. Returns the started StreamingQuery.
    """

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        apply_cdc_batch(
            batch_df.sparkSession,
            table_path,
            batch_df,
            key,
            seq_col=seq_col,
            op_col=op_col,
        )

    writer = change_stream.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def prune_versions(table_path: str, keep_last: int = 2) -> list[int]:
    """Delete all but the newest ``keep_last`` versions (never the
    pointed-at one). Returns the versions removed."""
    import re
    import shutil

    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    cur = latest_version(table_path)
    versions = sorted(
        int(m.group(1))
        for d in os.listdir(table_path)
        if (m := re.fullmatch(r"v=(\d+)", d))
    )
    victims = [v for v in versions[:-keep_last] if v != cur]
    for v in victims:
        shutil.rmtree(_version_dir(table_path, v), ignore_errors=True)
    return victims
