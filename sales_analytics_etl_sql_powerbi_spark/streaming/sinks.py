"""Streaming sinks — the write side of readStream → transform → writeStream.

The reference's sinks are batch SQL Server inserts; the streaming
extension mirrors them with the two shapes a production pipeline uses:

- :func:`stream_to_parquet` — the built-in fault-tolerant parquet sink
  (exactly-once per checkpointed epoch);
- :func:`foreach_batch_upsert_parquet` — ``foreachBatch`` with an
  anti-join upsert per micro-batch: the streaming twin of the batch
  insert-if-missing (operators/dims.upsert_missing), giving idempotent
  appends even when a batch replays after failure (the key-level dedup
  makes the replay a no-op, where the plain parquet sink relies on the
  checkpoint's epoch tracking alone).

Both default to ``trigger(availableNow=True)`` — drain-everything-then-
stop, the batch-friendly trigger the tests and backfills use; pass
``available_now=False`` for a continuously running query.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

__all__ = ["stream_to_parquet", "foreach_batch_upsert_parquet"]


def stream_to_parquet(
    stream_df: DataFrame,
    path: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Fault-tolerant parquet sink; returns the started StreamingQuery."""
    writer = (
        stream_df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def foreach_batch_upsert_parquet(
    stream_df: DataFrame,
    path: str,
    checkpoint_dir: str,
    key_cols: list[str],
    available_now: bool = True,
):
    """Idempotent streaming upsert into a parquet table.

    Every micro-batch is key-deduped then anti-joined against the
    current table before appending — a replayed batch (failure
    recovery, at-least-once sources) inserts nothing the table already
    has. The anti-join reads only the key columns of the existing
    table (column-pruned scan); the batch side is micro-batch-sized.
    Returns the started StreamingQuery.
    """

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        fresh = batch_df.dropDuplicates(key_cols)
        if os.path.isdir(path) and any(
            f.endswith(".parquet") for f in os.listdir(path)
        ):
            existing_keys = spark.read.parquet(path).select(*key_cols)
            fresh = fresh.join(existing_keys, on=key_cols, how="left_anti")
        fresh.write.mode("append").parquet(path)

    writer = stream_df.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
