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

PATHS: every pointer/directory operation routes through the Hadoop
FileSystem API when ``table_path`` carries a non-local scheme
(s3a://, hdfs://, gs://...), and through the driver-local filesystem
(with an atomic ``os.replace`` pointer swap) for plain paths — the
same split ``sinks.compact_parquet`` uses for sizing. On remote
filesystems the pointer swap is delete-then-rename (no portable
atomic-overwrite rename), so a reader can catch the pointer ABSENT
mid-swap; :func:`latest_version` closes that window by falling back
to the newest fully-committed ``v=N`` directory (``_SUCCESS`` marker
present — the commit protocol writes it last), which at that instant
is exactly the version being published.

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

TOMBSTONE COMPACTION (bounded out-of-order window): by default
tombstones are retained indefinitely — the price of the guarantee
without a log, and under a delete-heavy workload the snapshot grows
without bound. A source that bounds its out-of-order skew (any
still-in-flight change has sequence > observed-max − W) can pass
``tombstone_window=W``: during each publish, tombstones with
``__cdc_seq ≤ HWM − W`` are dropped — they can no longer be
contradicted by an admissible late arrival, so the snapshot's delete
overhead is bounded by the window, not by history (delete-heavy
probe: scripts/stress.py --cdc). The high-water mark HWM is the max
sequence observed across ALL applied batches, persisted per version
as a tiny ``_HWM`` sidecar file in the version directory — so it is
MONOTONE across process restarts: a late, out-of-order batch with low
sequences restores the stored mark instead of re-deriving a lower one
from its own rows (the incoming-batch aggregate is micro-batch-sized;
the snapshot is never re-scanned). HWM never exceeds a sequence the
store actually saw, so the compaction threshold never exceeds
observed-max − W: over-compaction is structurally impossible while
the source honours its window (restart probe:
scripts/stress.py --cdc-restart). A change arriving LATER than the
promised window may resurrect a compacted delete; that is the source
violating its own bound, not this store.

Failure contract: a crash between writing ``v=N`` and swapping the
pointer leaves the table at ``v=N−1`` with an orphan directory — the
checkpoint will replay the micro-batch, rewrite ``v=N`` (overwrite)
and swap; replay is safe because the stale-sequence filter makes the
merge idempotent.
"""

from __future__ import annotations

import os
import re
from urllib.parse import urlparse

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
_HWM = "_HWM"
_V_RE = re.compile(r"v=(\d+)")


def _version_dir(table_path: str, v: int) -> str:
    return table_path.rstrip("/") + f"/v={v}"


def _is_local(path: str) -> bool:
    return urlparse(path).scheme in ("", "file")


def _strip_file_scheme(path: str) -> str:
    # both URI forms reach here: file:///tmp/x and Hadoop's file:/tmp/x
    if path.startswith("file://"):
        return path[len("file://"):]
    if path.startswith("file:"):
        return path[len("file:"):]
    return path


def _hadoop_fs(path: str, spark: SparkSession | None):
    """(jvm, FileSystem, Path) for a non-local ``path`` — needs a live
    session for the JVM gateway (the driver always has one when it is
    writing snapshots)."""
    spark = spark or SparkSession.getActiveSession()
    if spark is None:
        raise RuntimeError(
            f"no active SparkSession to reach {path!r} via the Hadoop "
            "FileSystem API — pass spark= explicitly"
        )
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return jvm, fs, hpath


def _committed_versions(table_path: str, spark: SparkSession | None) -> list[int]:
    """Version numbers of fully-committed ``v=N`` dirs (``_SUCCESS``
    present — partially-(re)written dirs are excluded)."""
    out: list[int] = []
    if _is_local(table_path):
        local = _strip_file_scheme(table_path)
        if not os.path.isdir(local):
            return out
        for d in os.listdir(local):
            m = _V_RE.fullmatch(d)
            if m and os.path.exists(os.path.join(local, d, "_SUCCESS")):
                out.append(int(m.group(1)))
        return sorted(out)
    jvm, fs, hpath = _hadoop_fs(table_path, spark)
    if not fs.exists(hpath):
        return out
    for st in fs.listStatus(hpath):
        m = _V_RE.fullmatch(st.getPath().getName())
        if m and fs.exists(
            jvm.org.apache.hadoop.fs.Path(st.getPath(), "_SUCCESS")
        ):
            out.append(int(m.group(1)))
    return sorted(out)


def latest_version(
    table_path: str, spark: SparkSession | None = None
) -> int | None:
    """The published version: the ``_LATEST`` pointer when present,
    else (mid-swap on a filesystem without atomic overwrite-rename)
    the newest fully-committed ``v=N`` directory."""
    if _is_local(table_path):
        p = os.path.join(_strip_file_scheme(table_path), _LATEST)
        if os.path.exists(p):
            with open(p) as fh:
                return int(fh.read().strip())
    else:
        jvm, fs, _ = _hadoop_fs(table_path, spark)
        pointer = jvm.org.apache.hadoop.fs.Path(
            table_path.rstrip("/") + "/" + _LATEST
        )
        if fs.exists(pointer):
            stream = fs.open(pointer)
            try:
                reader = jvm.java.io.BufferedReader(
                    jvm.java.io.InputStreamReader(stream, "UTF-8")
                )
                line = reader.readLine()
            finally:
                stream.close()
            if line is not None and line.strip():
                return int(line.strip())
    committed = _committed_versions(table_path, spark)
    return committed[-1] if committed else None


def _read_hwm(
    table_path: str, v: int, spark: SparkSession | None = None
) -> int | None:
    """Stored sequence high-water mark of version ``v`` (the ``_HWM``
    sidecar written by :func:`apply_cdc_batch` when tombstone
    compaction is on); None when absent — e.g. version 0, or a table
    that never compacted — in which case the caller falls back to the
    incoming batch's own max (the conservative direction: a lower
    mark only compacts less)."""
    path = _version_dir(table_path, v) + "/" + _HWM
    if _is_local(table_path):
        p = _strip_file_scheme(path)
        if not os.path.exists(p):
            return None
        with open(p) as fh:
            s = fh.read().strip()
        return int(s) if s else None
    jvm, fs, _ = _hadoop_fs(table_path, spark)
    hp = jvm.org.apache.hadoop.fs.Path(path)
    if not fs.exists(hp):
        return None
    stream = fs.open(hp)
    try:
        reader = jvm.java.io.BufferedReader(
            jvm.java.io.InputStreamReader(stream, "UTF-8")
        )
        line = reader.readLine()
    finally:
        stream.close()
    return int(line.strip()) if line is not None and line.strip() else None


def _write_hwm(
    table_path: str, v: int, hwm: int, spark: SparkSession | None = None
) -> None:
    """Persist the high-water mark INSIDE the version directory,
    after the parquet commit and before the pointer swap — a crash in
    between replays the micro-batch, which overwrites both."""
    path = _version_dir(table_path, v) + "/" + _HWM
    if _is_local(table_path):
        p = _strip_file_scheme(path)
        tmp = p + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(str(hwm))
        os.replace(tmp, p)
        return
    jvm, fs, _ = _hadoop_fs(table_path, spark)
    out = fs.create(jvm.org.apache.hadoop.fs.Path(path), True)
    try:
        out.write(bytearray(str(hwm).encode("utf-8")))
    finally:
        out.close()


def _publish(table_path: str, v: int, spark: SparkSession | None = None) -> None:
    if _is_local(table_path):
        local = _strip_file_scheme(table_path)
        # write-then-rename: the pointer file appears atomically
        tmp = os.path.join(local, f".{_LATEST}.tmp")
        with open(tmp, "w") as fh:
            fh.write(str(v))
        os.replace(tmp, os.path.join(local, _LATEST))
        return
    jvm, fs, _ = _hadoop_fs(table_path, spark)
    base = table_path.rstrip("/")
    tmp = jvm.org.apache.hadoop.fs.Path(base + f"/.{_LATEST}.tmp")
    dst = jvm.org.apache.hadoop.fs.Path(base + "/" + _LATEST)
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(str(v).encode("utf-8")))
    finally:
        out.close()
    # no portable atomic-overwrite rename: delete-then-rename leaves a
    # pointer-absent window that latest_version's committed-dir
    # fallback covers (module docstring, PATHS)
    if fs.exists(dst):
        fs.delete(dst, False)
    fs.rename(tmp, dst)


def snapshot_init(df: DataFrame, table_path: str) -> int:
    """Create version 0 from an initial load and publish it. Initial
    rows carry sequence −∞ (any change supersedes them)."""
    spark = df.sparkSession
    if _is_local(table_path):
        os.makedirs(_strip_file_scheme(table_path), exist_ok=True)
    else:
        jvm, fs, hpath = _hadoop_fs(table_path, spark)
        fs.mkdirs(hpath)
    seeded = df.withColumn(
        "__cdc_seq", F.lit(-(2**63)).cast("long")
    ).withColumn("__cdc_deleted", F.lit(False))
    seeded.write.mode("overwrite").parquet(_version_dir(table_path, 0))
    _publish(table_path, 0, spark)
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
    v = latest_version(table_path, spark) if version is None else version
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
    tombstone_window: int | None = None,
) -> int:
    """Merge one change batch → write v=N+1 → swap the pointer.

    Returns the published version. Stale rows (sequence ≤ the stored
    row's ``__cdc_seq``) are dropped BEFORE the merge, so re-delivered
    or out-of-order batches — including replays of already-applied
    batches — never regress a key; deletes become tombstone rows so
    the stale filter also guards them. ``tombstone_window=W`` bounds
    tombstone retention (module docstring, TOMBSTONE COMPACTION): one
    extra micro-batch-sized max-seq aggregate + a narrow filter on the
    write path, never a snapshot-sized extra pass.
    """
    cur_v = latest_version(table_path, spark)
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
    # the stored mark is carried forward by EVERY batch — a batch
    # applied without tombstone_window must not orphan it (a later
    # windowed batch would fall back to its own max and silently
    # regress the threshold; the monotonicity guarantee is
    # per-table, not per-call)
    hwm: int | None = _read_hwm(table_path, cur_v, spark)
    if tombstone_window is not None:
        if tombstone_window < 0:
            raise ValueError("tombstone_window must be >= 0")
        # high watermark = max(stored mark, incoming batch max) — the
        # incoming side is a micro-batch-sized aggregate (the snapshot
        # is never re-scanned for it), the stored side a one-line
        # sidecar read. The stored mark makes the mark MONOTONE across
        # restarts: a late out-of-order batch cannot lower the
        # compaction threshold (it restores the stored mark), and the
        # mark never exceeds an actually-observed sequence, so the
        # threshold never exceeds observed-max − W (no over-compaction
        # while the source honours its window). Restart-probed:
        # scripts/stress.py --cdc-restart.
        batch_hwm = changes.agg(F.max(F.col(seq_col).cast("long"))).collect()[0][0]
        marks = [m for m in (batch_hwm, hwm) if m is not None]
        hwm = max(marks) if marks else None
        if hwm is not None:
            threshold = hwm - tombstone_window
            merged = merged.where(
                ~(F.col("__cdc_deleted") & (F.col("__cdc_seq") <= threshold))
            )
    new_v = cur_v + 1
    merged.write.mode("overwrite").parquet(_version_dir(table_path, new_v))
    if hwm is not None:
        _write_hwm(table_path, new_v, hwm, spark)
    _publish(table_path, new_v, spark)
    return new_v


def stream_cdc_apply(
    change_stream: DataFrame,
    table_path: str,
    key: str,
    checkpoint_dir: str,
    seq_col: str = "seq",
    op_col: str = "op",
    available_now: bool = True,
    tombstone_window: int | None = None,
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
            tombstone_window=tombstone_window,
        )

    writer = change_stream.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def prune_versions(
    table_path: str, keep_last: int = 2, spark: SparkSession | None = None
) -> list[int]:
    """Delete all but the newest ``keep_last`` versions (never the
    pointed-at one). Returns the versions removed."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    cur = latest_version(table_path, spark)
    if _is_local(table_path):
        import shutil

        local = _strip_file_scheme(table_path)
        versions = sorted(
            int(m.group(1))
            for d in os.listdir(local)
            if (m := _V_RE.fullmatch(d))
        )
        victims = [v for v in versions[:-keep_last] if v != cur]
        for v in victims:
            shutil.rmtree(
                os.path.join(local, f"v={v}"), ignore_errors=True
            )
        return victims
    jvm, fs, hpath = _hadoop_fs(table_path, spark)
    versions = sorted(
        int(m.group(1))
        for st in fs.listStatus(hpath)
        if (m := _V_RE.fullmatch(st.getPath().getName()))
    )
    victims = [v for v in versions[:-keep_last] if v != cur]
    for v in victims:
        fs.delete(
            jvm.org.apache.hadoop.fs.Path(_version_dir(table_path, v)), True
        )
    return victims
