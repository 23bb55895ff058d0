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

Failure contract: a crash between writing ``v=N`` and swapping the
pointer leaves the table at ``v=N−1`` with an orphan directory — the
checkpoint will replay the micro-batch, rewrite ``v=N`` (overwrite)
and swap; replay is safe because cdc_apply is idempotent.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

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
    """Create version 0 from an initial load and publish it."""
    os.makedirs(table_path, exist_ok=True)
    df.write.mode("overwrite").parquet(_version_dir(table_path, 0))
    _publish(table_path, 0)
    return 0


def read_snapshot(
    spark: SparkSession, table_path: str, version: int | None = None
) -> DataFrame:
    """Open the pointed-at (or an explicit historical) version."""
    v = latest_version(table_path) if version is None else version
    if v is None:
        raise FileNotFoundError(f"no published snapshot under {table_path!r}")
    return spark.read.parquet(_version_dir(table_path, v))


def apply_cdc_batch(
    spark: SparkSession,
    table_path: str,
    changes: DataFrame,
    key: str,
    seq_col: str = "seq",
    op_col: str = "op",
) -> int:
    """Merge one change batch → write v=N+1 → swap the pointer.

    Returns the published version. Rerunning the same batch against
    the resulting version is a no-op merge (cdc_apply idempotence), so
    at-least-once delivery upstream is safe.
    """
    cur_v = latest_version(table_path)
    if cur_v is None:
        raise FileNotFoundError(
            f"no published snapshot under {table_path!r} — snapshot_init first"
        )
    snap = spark.read.parquet(_version_dir(table_path, cur_v))
    merged = cdc_apply(snap, changes, key, seq_col=seq_col, op_col=op_col)
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
