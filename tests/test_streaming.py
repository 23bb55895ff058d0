"""Structured Streaming smoke: batch/stream parity via availableNow."""

import datetime

from sales_analytics_etl_sql_powerbi_spark.streaming import windows as W

EVENTS = "event_id long, ts timestamp, user_id long, event_type string, value double"


from sales_analytics_etl_sql_powerbi_spark.streaming.sinks import (
    drain_available_now as drain_stateful,
)


def events_rows():
    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    for i in range(40):
        rows.append(
            (
                i,
                t0 + datetime.timedelta(minutes=7 * i),
                i % 3,
                "click" if i % 2 == 0 else "view",
                float(i),
            )
        )
    # duplicate event ids for dedup
    rows.append((0, t0 + datetime.timedelta(minutes=1), 0, "click", 0.0))
    return rows


def test_tumbling_batch(spark):
    df = spark.createDataFrame(events_rows(), EVENTS)
    out = W.tumbling_counts(df).collect()
    assert sum(r.event_count for r in out) == 41
    starts = {r.window_start.minute for r in out}
    assert starts == {0}  # hour-aligned


def test_session_windows_gap(spark):
    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (1, t0, 7, "a", 1.0),
        (2, t0 + datetime.timedelta(minutes=2), 7, "a", 1.0),
        (3, t0 + datetime.timedelta(minutes=30), 7, "a", 1.0),  # new session
    ]
    df = spark.createDataFrame(rows, EVENTS)
    out = sorted(W.session_windows(df).collect(), key=lambda r: r.session_start)
    assert len(out) == 2
    assert out[0].event_count == 2
    # session_window end = last event + gap
    assert out[0].session_end == t0 + datetime.timedelta(minutes=2 + 5)


def test_session_window_exact_gap_boundary(spark):
    """An event landing EXACTLY gap after the previous one merges into
    the same session — Spark's session_window coalesces adjacent
    sessions (strict > starts a new one). Found by the round-15 window
    fuzz: the r14 DuckDB twin used >= (new session on an exact-gap
    event) and diverged on this shape; both engines must agree here.
    """
    import duckdb

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (1, t0, 7, "a", 1.0),
        (2, t0 + datetime.timedelta(minutes=5), 7, "a", 1.0),  # == gap: merge
        (3, t0 + datetime.timedelta(minutes=10, seconds=1), 7, "a", 1.0),  # > gap
    ]
    df = spark.createDataFrame(rows, EVENTS)
    got = sorted(
        (r.user_id, r.session_start, r.session_end, r.event_count)
        for r in W.session_windows(df).collect()
    )
    assert got == [
        (7, t0, t0 + datetime.timedelta(minutes=10), 2),
        (
            7,
            t0 + datetime.timedelta(minutes=10, seconds=1),
            t0 + datetime.timedelta(minutes=15, seconds=1),
            1,
        ),
    ]

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events (event_id BIGINT, ts TIMESTAMP, user_id BIGINT,"
        " event_type VARCHAR, value DOUBLE)"
    )
    con.executemany("INSERT INTO events VALUES (?, ?, ?, ?, ?)", rows)
    want = sorted(
        (r[0], r[1], r[2], r[3])
        for r in con.execute(W.SESSION_SQL).fetchall()
    )
    assert got == want


def test_dedup_batch(spark):
    df = spark.createDataFrame(events_rows(), EVENTS)
    assert W.dedup_within_watermark(df, ["event_id"]).count() == 40


def test_streaming_matches_batch(spark, tmp_path):
    df = spark.createDataFrame(events_rows(), EVENTS)
    src = str(tmp_path / "events_src")
    df.write.parquet(src)

    stream = spark.readStream.schema(EVENTS).parquet(src)
    agg = W.tumbling_counts(stream)
    q = (
        agg.writeStream.format("memory")
        .queryName("t_stream_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.window_start, r.event_type): (r.event_count, r.sum_value)
        for r in spark.table("t_stream_out").collect()
    }
    want = {
        (r.window_start, r.event_type): (r.event_count, r.sum_value)
        for r in W.tumbling_counts(df).collect()
    }
    assert got == want


def test_streaming_dedup_within_watermark(spark, tmp_path):
    df = spark.createDataFrame(events_rows(), EVENTS)
    src = str(tmp_path / "dedup_src")
    df.write.parquet(src)
    stream = spark.readStream.schema(EVENTS).parquet(src)
    out = W.dedup_within_watermark(stream, ["event_id"])
    q = (
        out.writeStream.format("memory")
        .queryName("t_dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert spark.table("t_dedup_out").count() == 40


def test_running_totals_stateful_stream(spark, tmp_path):
    """applyInPandasWithState accumulates across micro-batches."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    batch1 = [(1, t0, 7, "a", 2.0), (2, t0, 7, "a", 3.0), (3, t0, 8, "a", 1.0)]
    batch2 = [(4, t0, 7, "a", 5.0)]
    src = str(tmp_path / "stateful_src")
    spark.createDataFrame(batch1, EVENTS).write.mode("append").parquet(src)

    stream = spark.readStream.schema(EVENTS).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    out = W.running_totals_stateful(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("t_state_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    drain_stateful(q)
    first = {
        r.user_id: (r.event_count, r.value_sum)
        for r in spark.table("t_state_out").collect()
    }
    assert first[7] == (2, 5.0) and first[8] == (1, 1.0)

    # second batch continues from stored state
    spark.createDataFrame(batch2, EVENTS).write.mode("append").parquet(src)
    q2 = (
        W.running_totals_stateful(
            spark.readStream.schema(EVENTS).parquet(src)
        )
        .writeStream.format("memory")
        .queryName("t_state_out2")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    drain_stateful(q2)
    got = {
        r.user_id: (r.event_count, r.value_sum)
        for r in spark.table("t_state_out2").collect()
    }
    assert got[7] == (3, 10.0)  # both files in one fresh run


def test_running_totals_batch_twin(spark):
    df = spark.createDataFrame(events_rows(), EVENTS)
    out = {r.user_id: r.event_count for r in W.running_totals_stateful(df).collect()}
    assert sum(out.values()) == 41


def test_watermark_drops_late_data(spark, tmp_path):
    """An event older than watermark arriving in a later micro-batch is
    dropped from the windowed aggregate (append mode emits only closed
    windows, and the late row never reopens one)."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    src = str(tmp_path / "late_src")
    ckpt = str(tmp_path / "late_ckpt")
    out_dir = str(tmp_path / "late_out")

    def run_once(qname):
        stream = spark.readStream.schema(EVENTS).parquet(src)
        return (
            W.tumbling_counts(stream)
            .writeStream.format("parquet")
            .queryName(qname)
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )

    # run 1: events up to 02:00 -> watermark persists at 01:50 in ckpt
    on_time = [
        (i, t0 + dt.timedelta(minutes=10 * i), 1, "a", 1.0) for i in range(13)
    ]
    spark.createDataFrame(on_time, EVENTS).write.mode("append").parquet(src)
    q1 = run_once("t_late_out_1")
    q1.awaitTermination(180)

    # run 2 (same checkpoint): an event at 00:05 - far behind watermark
    spark.createDataFrame(
        [(99, t0 + dt.timedelta(minutes=5), 1, "a", 100.0)], EVENTS
    ).write.mode("append").parquet(src)
    q2 = run_once("t_late_out_2")
    q2.awaitTermination(180)

    closed = {
        r.window_start: (r.event_count, r.sum_value)
        for r in spark.read.parquet(out_dir).collect()
    }
    # the 00:00 window closed with its on-time count; the late 100.0
    # event must NOT appear in it
    w0 = closed.get(t0)
    assert w0 is not None
    assert w0[0] == 6 and w0[1] == 6.0  # events at :00..:50, value 1.0 each


def test_stream_to_parquet_sink(spark, tmp_path):
    from sales_analytics_etl_sql_powerbi_spark.streaming import sinks

    df = spark.createDataFrame(events_rows(), EVENTS)
    src = str(tmp_path / "sink_src")
    df.write.parquet(src)
    out = str(tmp_path / "sink_out")
    q = sinks.stream_to_parquet(
        spark.readStream.schema(EVENTS).parquet(src),
        out,
        str(tmp_path / "sink_ckpt"),
    )
    q.awaitTermination(120)
    assert spark.read.parquet(out).count() == df.count()


def test_foreach_batch_upsert_idempotent(spark, tmp_path):
    """The streaming insert-if-missing: a second full replay of the
    source (fresh checkpoint — forced reprocessing) appends nothing."""
    from sales_analytics_etl_sql_powerbi_spark.streaming import sinks

    df = spark.createDataFrame(events_rows(), EVENTS)
    src = str(tmp_path / "ups_src")
    df.write.parquet(src)
    out = str(tmp_path / "ups_out")

    for attempt in range(2):
        q = sinks.foreach_batch_upsert_parquet(
            spark.readStream.schema(EVENTS).parquet(src),
            out,
            str(tmp_path / f"ups_ckpt_{attempt}"),  # new ckpt = full replay
            key_cols=["event_id"],
        )
        q.awaitTermination(120)
        back = spark.read.parquet(out)
        assert back.count() == df.select("event_id").distinct().count()


def test_stream_order_export_matches_batch(spark, tmp_path):
    """The continuous CSV front door must produce exactly the batch
    path's typed staging frame — asserted with the DRIVER's own
    order-insensitive value digest (scripts/check_correctness.py's
    frame_digest: sorted columns, stable float/bytes formatting,
    sorted rows, md5), not just row-tuple parity. The batch side of
    this compare is the oracle-green `staging_csv_roundtrip` frame, so
    hash-equality here chains the streaming path to the DuckDB oracle:
    same bytes as batch, and batch is hash-green against the oracle."""
    import os
    import sys

    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "scripts")
    )
    from check_correctness import frame_digest

    from sales_analytics_etl_sql_powerbi_spark.sources.fixtures import (
        ensure_order_export_csv,
    )
    from sales_analytics_etl_sql_powerbi_spark.sources.readers import read_input
    from sales_analytics_etl_sql_powerbi_spark.pipeline import clean_order_export
    from sales_analytics_etl_sql_powerbi_spark.streaming.ingest import (
        stream_order_export,
    )

    path = ensure_order_export_csv("/root/testdata/sf0.001")
    batch = clean_order_export(read_input(spark, path))

    out = stream_order_export(spark, path, max_files_per_trigger=8)
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("stream_ingest")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("stream_ingest")
    assert got.schema == batch.schema
    b_rows = [tuple(r) for r in batch.collect()]
    s_rows = [tuple(r) for r in got.collect()]
    assert frame_digest(batch.columns, s_rows) == frame_digest(
        batch.columns, b_rows
    ), "streaming bytes diverge from the oracle-green batch frame"


def purchase_rows():
    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    eid = 0
    for u in range(3):
        for m in (0, 5, 20, 61):  # views at various offsets
            rows.append((eid, t0 + datetime.timedelta(minutes=m), u, "view", float(m)))
            eid += 1
        # purchase at minute 35: views at 5 and 20 are within 30min, 0 is not
        rows.append((eid, t0 + datetime.timedelta(minutes=35), u, "purchase", 9.9))
        eid += 1
    return rows


def test_interval_join_batch_semantics(spark):
    df = spark.createDataFrame(purchase_rows(), EVENTS)
    out = W.view_purchase_interval_join(df, lookback="30 minutes").collect()
    by_purchase = {}
    for r in out:
        by_purchase.setdefault(r.purchase_id, set()).add(round(r.gap_seconds))
    # per user: exactly the 5-min and 20-min-offset views qualify
    # (gaps 30min=1800s and 15min=900s); the minute-0 view (gap 35min)
    # and the minute-61 view (after the purchase) do not
    assert all(v == {1800, 900} for v in by_purchase.values())
    assert len(by_purchase) == 3


def test_interval_join_stream_matches_batch(spark, tmp_path):
    df = spark.createDataFrame(purchase_rows(), EVENTS)
    src = str(tmp_path / "ij_src")
    df.write.parquet(src)
    stream = spark.readStream.schema(EVENTS).parquet(src)
    out = W.view_purchase_interval_join(stream, lookback="30 minutes")
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("t_ij_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.purchase_id, r.view_id, round(r.gap_seconds))
        for r in spark.table("t_ij_out").collect()
    }
    want = {
        (r.purchase_id, r.view_id, round(r.gap_seconds))
        for r in W.view_purchase_interval_join(df, lookback="30 minutes").collect()
    }
    assert got == want and got


# ---------------------------------------------------------------------------
# streaming CDC replication into the versioned snapshot store (round 6)
# ---------------------------------------------------------------------------

CDC_SCHEMA = "k long, v string, op string, seq long"


def test_cdc_snapshot_versioning_and_batch_apply(spark, tmp_path):
    from sales_analytics_etl_sql_powerbi_spark.streaming import cdc

    table = str(tmp_path / "tbl")
    init = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    assert cdc.snapshot_init(init, table) == 0
    assert cdc.latest_version(table) == 0

    ch = spark.createDataFrame(
        [(1, "a2", "U", 1), (3, "c", "I", 2), (2, None, "D", 3)], CDC_SCHEMA
    ).select("k", "v", "op", "seq")
    v = cdc.apply_cdc_batch(spark, table, ch.select("k", "v", "op", "seq"), "k")
    assert v == 1 and cdc.latest_version(table) == 1
    got = {
        r.k: r.v for r in cdc.read_snapshot(spark, table).select("k", "v").collect()
    }
    assert got == {1: "a2", 3: "c"}
    # time travel: version 0 still readable
    old = {r.k: r.v for r in cdc.read_snapshot(spark, table, version=0).collect()}
    assert old == {1: "a", 2: "b"}
    # replaying the SAME batch publishes a new version with identical content
    v2 = cdc.apply_cdc_batch(spark, table, ch, "k")
    again = {r.k: r.v for r in cdc.read_snapshot(spark, table).select("k", "v").collect()}
    assert v2 == 2 and again == got


def test_cdc_stream_replication_end_to_end(spark, tmp_path):
    """Change files arriving as a stream → foreachBatch merge →
    versioned snapshot matches a one-shot batch apply of all changes."""
    from sales_analytics_etl_sql_powerbi_spark.streaming import cdc

    table = str(tmp_path / "tbl2")
    cdc.snapshot_init(
        spark.createDataFrame([(i, "init") for i in range(10)], "k long, v string"),
        table,
    )
    src = str(tmp_path / "changes")
    import os

    os.makedirs(src, exist_ok=True)
    all_changes = [
        (1, "x1", "U", 1),
        (2, None, "D", 2),
        (20, "new", "I", 3),
        (1, "x2", "U", 4),   # later seq for key 1 in a LATER file
    ]
    spark.createDataFrame(all_changes[:3], CDC_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    spark.createDataFrame(all_changes[3:], CDC_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    stream = spark.readStream.schema(CDC_SCHEMA).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    q = cdc.stream_cdc_apply(
        stream, table, "k", checkpoint_dir=str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    got = {
        r.k: r.v for r in cdc.read_snapshot(spark, table).select("k", "v").collect()
    }
    assert got[1] == "x2" and 2 not in got and got[20] == "new"
    assert len(got) == 10  # 10 - 1 delete + 1 insert
    assert cdc.latest_version(table) >= 1


def test_cdc_prune_versions_keeps_latest(spark, tmp_path):
    from sales_analytics_etl_sql_powerbi_spark.streaming import cdc

    table = str(tmp_path / "tbl3")
    cdc.snapshot_init(
        spark.createDataFrame([(1, "a")], "k long, v string"), table
    )
    for s in range(3):
        ch = spark.createDataFrame([(1, f"v{s}", "U", s)], CDC_SCHEMA)
        cdc.apply_cdc_batch(spark, table, ch, "k")
    removed = cdc.prune_versions(table, keep_last=2)
    assert removed == [0, 1]
    assert cdc.latest_version(table) == 3
    assert cdc.read_snapshot(spark, table).count() == 1
    import pytest

    with pytest.raises(Exception):
        cdc.read_snapshot(spark, table, version=0)


def test_cdc_out_of_order_batches_cannot_regress(spark, tmp_path):
    """The cross-batch guarantee cdc_apply alone can't give: applying
    an OLDER batch after a newer one must be a no-op (stale filter),
    and a re-delivered older insert must not resurrect a
    higher-sequence delete (tombstones)."""
    from sales_analytics_etl_sql_powerbi_spark.streaming import cdc

    table = str(tmp_path / "tbl_ooo")
    cdc.snapshot_init(
        spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"), table
    )
    newer = spark.createDataFrame(
        [(1, "NEW", "U", 10), (2, None, "D", 11)], CDC_SCHEMA
    )
    older = spark.createDataFrame(
        [(1, "OLD", "U", 5), (2, "zombie", "I", 6)], CDC_SCHEMA
    )
    cdc.apply_cdc_batch(spark, table, newer, "k")
    cdc.apply_cdc_batch(spark, table, older, "k")  # must be fully stale
    got = {r.k: r.v for r in cdc.read_snapshot(spark, table).collect()}
    assert got == {1: "NEW"}  # no regression, no zombie resurrection
    # the tombstone is visible internally, with its sequence
    internal = {
        r["k"]: (r["__cdc_seq"], r["__cdc_deleted"])
        for r in cdc.read_snapshot(spark, table, internal=True).collect()
    }
    assert internal[2] == (11, True)
    # a genuinely newer insert DOES revive the key
    revive = spark.createDataFrame([(2, "back", "I", 12)], CDC_SCHEMA)
    cdc.apply_cdc_batch(spark, table, revive, "k")
    got = {r.k: r.v for r in cdc.read_snapshot(spark, table).collect()}
    assert got == {1: "NEW", 2: "back"}


def test_cdc_tombstone_hwm_monotone_across_restart(spark, tmp_path):
    """Stored high-water mark for tombstone compaction (VERDICT r7
    item 6 / r9 item 3). All store state lives on disk (version dirs
    + the ``_HWM`` sidecar), so each ``apply_cdc_batch`` call IS a
    restart — nothing in memory carries over. Pins three properties:

    1. a late out-of-order batch with low sequences cannot resurrect
       a tombstoned key (per-key stale filter, unchanged);
    2. the compaction mark is MONOTONE across restarts — the late
       batch restores the stored mark instead of deriving a lower one
       from its own rows;
    3. the mark never exceeds an observed sequence, so a tombstone is
       compacted exactly when the window says it may be — never
       earlier (no over-compaction).

    Scale probe with real session restarts: scripts/stress.py
    --cdc-restart.
    """
    from sales_analytics_etl_sql_powerbi_spark.streaming import cdc

    table = str(tmp_path / "tbl_hwm")
    window = 50
    cdc.snapshot_init(
        spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
        ),
        table,
    )
    # batch A: delete k=1 @90, update k=2 @100 → mark 100, threshold
    # 50 → the 90-tombstone is retained (90 > 50)
    a = spark.createDataFrame([(1, None, "D", 90), (2, "b2", "U", 100)], CDC_SCHEMA)
    cdc.apply_cdc_batch(spark, table, a, "k", tombstone_window=window)
    assert cdc._read_hwm(table, 1) == 100
    internal = cdc.read_snapshot(spark, table, internal=True)
    assert internal.where("k = 1 AND __cdc_deleted").count() == 1
    # "restart" + late batch B, max seq 30: batch-local marking would
    # drop the threshold to −20; the stored mark keeps it at 100
    b = spark.createDataFrame(
        [(1, "zombie", "U", 30), (3, "c2", "U", 20)], CDC_SCHEMA
    )
    cdc.apply_cdc_batch(spark, table, b, "k", tombstone_window=window)
    assert cdc._read_hwm(table, 2) == 100  # monotone (property 2)
    got = {r.k: r.v for r in cdc.read_snapshot(spark, table).collect()}
    assert 1 not in got  # tombstone still rejects the zombie (1)
    assert got[3] == "c2"  # fresh-by-key change still applies
    internal = cdc.read_snapshot(spark, table, internal=True)
    assert internal.where("k = 1 AND __cdc_deleted").count() == 1  # (3)
    # batch C @145 → threshold 95 → the 90-tombstone compacts NOW,
    # exactly when the window first allows it
    c = spark.createDataFrame([(4, "d", "I", 145)], CDC_SCHEMA)
    cdc.apply_cdc_batch(spark, table, c, "k", tombstone_window=window)
    assert cdc._read_hwm(table, 3) == 145
    internal = cdc.read_snapshot(spark, table, internal=True)
    assert internal.where("k = 1").count() == 0  # compacted
    got = {r.k: r.v for r in cdc.read_snapshot(spark, table).collect()}
    assert got == {2: "b2", 3: "c2", 4: "d"}
    # mixed usage: a batch applied WITHOUT tombstone_window must carry
    # the stored mark forward — a later windowed late batch would
    # otherwise fall back to its own max and regress the threshold
    nowin = spark.createDataFrame([(5, "e", "I", 60)], CDC_SCHEMA)
    cdc.apply_cdc_batch(spark, table, nowin, "k")  # no window arg
    assert cdc._read_hwm(table, 4) == 145  # carried, not dropped
    late2 = spark.createDataFrame([(6, "f", "I", 10)], CDC_SCHEMA)
    cdc.apply_cdc_batch(spark, table, late2, "k", tombstone_window=window)
    assert cdc._read_hwm(table, 5) == 145  # still monotone


def test_stream_static_dim_enrichment(spark, tmp_path):
    """Stream-static broadcast join: streamed events pick up dim
    attributes; results match the batch join; the stream side never
    shuffles (single stateless projection + broadcast join)."""
    from sales_analytics_etl_sql_powerbi_spark.streaming import windows as W

    ev = spark.createDataFrame(
        [(1, 10, "view"), (2, 20, "view"), (3, 99, "purchase")],
        "event_id long, user_id long, event_type string",
    )
    dim = spark.createDataFrame(
        [(10, "gold"), (20, "silver")], "user_id long, tier string"
    )
    # batch route (oracle-checkable semantics)
    batch = {
        r.event_id: r.tier
        for r in W.enrich_with_dim(ev, dim, on="user_id").collect()
    }
    assert batch == {1: "gold", 2: "silver", 3: None}
    # stream route: identical results through availableNow
    src = str(tmp_path / "enrich_src")
    ev.write.parquet(src)
    stream = spark.readStream.schema(
        "event_id long, user_id long, event_type string"
    ).parquet(src)
    out = W.enrich_with_dim(stream, dim, on="user_id")
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("t_enrich_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = {
        r.event_id: r.tier for r in spark.sql("select * from t_enrich_out").collect()
    }
    assert got == batch


def test_cdc_tombstone_compaction_bounded_window(spark, tmp_path):
    """tombstone_window=W (VERDICT r6 item 2): tombstones older than
    max(incoming seq) − W are dropped at publish — the snapshot's
    delete overhead is bounded by the window, not by history — while
    tombstones INSIDE the window keep blocking zombie resurrection."""
    from sales_analytics_etl_sql_powerbi_spark.streaming import cdc

    table = str(tmp_path / "tbl_compact")
    cdc.snapshot_init(
        spark.createDataFrame(
            [(k, f"v{k}") for k in range(1, 6)], "k long, v string"
        ),
        table,
    )
    # batch 1: delete keys 1,2 at seq 10,11 (window 100 → retained)
    cdc.apply_cdc_batch(
        spark,
        table,
        spark.createDataFrame([(1, None, "D", 10), (2, None, "D", 11)], CDC_SCHEMA),
        "k",
        tombstone_window=100,
    )
    internal = cdc.read_snapshot(spark, table, internal=True)
    assert internal.where("__cdc_deleted").count() == 2
    # zombie insert for key 1 below its tombstone seq: still blocked
    cdc.apply_cdc_batch(
        spark,
        table,
        spark.createDataFrame([(1, "zombie", "I", 5)], CDC_SCHEMA),
        "k",
        tombstone_window=100,
    )
    got = {r.k for r in cdc.read_snapshot(spark, table).collect()}
    assert 1 not in got and 2 not in got
    # batch at seq 200: both tombstones (seq ≤ 200-100) compact away
    cdc.apply_cdc_batch(
        spark,
        table,
        spark.createDataFrame([(3, "v3b", "U", 200)], CDC_SCHEMA),
        "k",
        tombstone_window=100,
    )
    internal = cdc.read_snapshot(spark, table, internal=True)
    assert internal.where("__cdc_deleted").count() == 0
    assert {r.k for r in cdc.read_snapshot(spark, table).collect()} == {3, 4, 5}
    # no window (default): tombstones retained indefinitely
    table2 = str(tmp_path / "tbl_nocompact")
    cdc.snapshot_init(
        spark.createDataFrame([(1, "a")], "k long, v string"), table2
    )
    cdc.apply_cdc_batch(
        spark, table2,
        spark.createDataFrame([(1, None, "D", 10)], CDC_SCHEMA), "k",
    )
    cdc.apply_cdc_batch(
        spark, table2,
        spark.createDataFrame([(2, "b", "I", 500)], CDC_SCHEMA), "k",
    )
    assert (
        cdc.read_snapshot(spark, table2, internal=True)
        .where("__cdc_deleted")
        .count()
        == 1
    )


def test_cdc_latest_version_falls_back_to_committed_dirs(spark, tmp_path):
    """Mid-swap (or crashed-publish) recovery: with the _LATEST
    pointer missing, latest_version finds the newest fully-committed
    v=N directory via its _SUCCESS marker."""
    import os

    from sales_analytics_etl_sql_powerbi_spark.streaming import cdc

    table = str(tmp_path / "tbl_ptr")
    cdc.snapshot_init(
        spark.createDataFrame([(1, "a")], "k long, v string"), table
    )
    cdc.apply_cdc_batch(
        spark, table,
        spark.createDataFrame([(1, "b", "U", 1)], CDC_SCHEMA), "k",
    )
    assert cdc.latest_version(table) == 1
    os.remove(os.path.join(table, "_LATEST"))
    assert cdc.latest_version(table) == 1  # fallback scan
    assert {r.v for r in cdc.read_snapshot(spark, table).collect()} == {"b"}
    # file:// scheme resolves through the same local path
    assert cdc.latest_version("file://" + table) == 1


def test_multibatch_watermark_matches_python_simulator(spark, tmp_path):
    """Round 15 (VERDICT r14 item 4): the stream-ONLY semantics —
    watermark advance, late-row dropping, append-mode window
    emission — twinned against a pure-Python watermark simulator on
    generated multi-batch streams. Batch boundaries are made
    deterministic by restarting an availableNow query per data file
    against one checkpoint (the same technique as
    test_watermark_drops_late_data). Simulator rules (Spark's
    documented semantics):

      - W starts at epoch; after each committed batch,
        W = max(W, max_event_ts_seen - delay)
      - a row whose window end <= W at processing time is dropped
      - append mode emits a window exactly once, in the first run
        whose post-batch W >= window end (availableNow runs the
        no-data flush batch before terminating)
    """
    import datetime as dt
    import random

    from pyspark.sql import functions as F

    delay_us = 10 * 60 * 1_000_000
    hour_us = 3_600_000_000
    base = dt.datetime(2024, 1, 1)
    rnd = random.Random(20250815)

    for case in range(2):
        src = str(tmp_path / f"wm_src_{case}")
        ckpt = str(tmp_path / f"wm_ckpt_{case}")
        out_dir = str(tmp_path / f"wm_out_{case}")

        # 3 batches; each mixes fresh timestamps with stragglers far
        # behind the running max, plus exact hour boundaries
        batches = []
        eid = 0
        for b in range(3):
            batch = []
            for _ in range(rnd.randrange(2, 7)):
                mode = rnd.random()
                if mode < 0.25:
                    off = (b + rnd.randrange(0, 2)) * hour_us  # boundary
                elif mode < 0.5:
                    off = rnd.randrange(0, hour_us)  # straggler to batch 0's hour
                else:
                    off = b * hour_us + rnd.randrange(0, hour_us)
                batch.append((eid, off))
                eid += 1
            batches.append(batch)

        # --- python simulator ---
        w = -(1 << 62)
        state: dict[int, int] = {}
        emitted: dict[dt.datetime, int] = {}
        for batch in batches:
            for _, off in batch:
                ws = off - off % hour_us
                if ws + hour_us <= w:
                    continue  # late beyond watermark: dropped
                state[ws] = state.get(ws, 0) + 1
            w = max(w, max(off for _, off in batch) - delay_us)
            for ws in sorted([s for s in state if s + hour_us <= w]):
                emitted[base + dt.timedelta(microseconds=ws)] = state.pop(ws)

        # --- the real stream, one availableNow run per batch ---
        for batch in batches:
            rows = [
                (i, base + dt.timedelta(microseconds=off), 1, "a", 1.0)
                for i, off in batch
            ]
            spark.createDataFrame(rows, EVENTS).write.mode("append").parquet(src)
            q = (
                W.tumbling_counts(
                    spark.readStream.schema(EVENTS).parquet(src)
                )
                .writeStream.format("parquet")
                .option("path", out_dir)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(180)

        got = {
            r.window_start: r.event_count
            for r in spark.read.parquet(out_dir)
            .where(F.col("event_type") == "a")
            .collect()
        }
        assert got == emitted, (case, batches, got, emitted)


class TestUpsertCrashConsistency:
    """Round 17 (VERDICT r16 item 3): a batch dying mid-write cannot
    tear the upsert table. The committer's staging-then-rename makes
    every VISIBLE parquet file complete; the three torn states a crash
    can leave are each injected here and shown to restore the exact
    no-crash table on replay."""

    @staticmethod
    def _batch(spark, lo, hi):
        return spark.range(lo, hi).selectExpr(
            "concat('k', id) as order_id", "id * 10 as units"
        )

    def test_failed_write_job_leaves_table_unchanged_then_replay(
        self, spark, tmp_path
    ):
        """Crash BEFORE job commit: the abort path removes all staged
        output — table unchanged; a clean replay lands the batch."""
        import pytest
        from pyspark.sql.utils import PythonException

        from sales_analytics_etl_sql_powerbi_spark.streaming.sinks import (
            upsert_batch_into_parquet,
        )

        tbl = str(tmp_path / "tbl")
        upsert_batch_into_parquet(self._batch(spark, 0, 5), tbl, ["order_id"])
        before = sorted(
            tuple(r) for r in spark.read.parquet(tbl).collect()
        )
        poison = spark.range(5, 10).selectExpr(
            "concat('k', id) as order_id",
            "cast(assert_true(id < 7, 'boom') as long) as units",
        )
        with pytest.raises(Exception):
            upsert_batch_into_parquet(poison, tbl, ["order_id"])
        after = sorted(tuple(r) for r in spark.read.parquet(tbl).collect())
        assert after == before
        upsert_batch_into_parquet(self._batch(spark, 5, 10), tbl, ["order_id"])
        assert spark.read.parquet(tbl).count() == 10

    def test_torn_job_commit_replay_restores_exact_table(
        self, spark, tmp_path
    ):
        """Crash DURING job commit (per-file renames are not atomic as
        a set): table = old rows + a strict subset of the batch's
        complete files. Replay key-anti-joins and inserts exactly the
        missing keys — final table equals the no-crash outcome."""
        import glob
        import shutil

        from sales_analytics_etl_sql_powerbi_spark.streaming.sinks import (
            upsert_batch_into_parquet,
        )

        tbl = str(tmp_path / "tbl")
        side = str(tmp_path / "side")
        expect_tbl = str(tmp_path / "expect")
        upsert_batch_into_parquet(self._batch(spark, 0, 5), tbl, ["order_id"])
        batch = self._batch(spark, 5, 20)
        # the no-crash outcome
        shutil.copytree(tbl, expect_tbl)
        upsert_batch_into_parquet(batch, expect_tbl, ["order_id"])
        expected = sorted(
            tuple(r) for r in spark.read.parquet(expect_tbl).collect()
        )
        # torn commit: land only SOME of the batch's committed files
        batch.repartition(4).write.parquet(side)
        parts = sorted(glob.glob(side + "/part-*.parquet"))
        assert len(parts) >= 2
        for p in parts[: len(parts) // 2]:
            shutil.copy(p, tbl)
        torn = spark.read.parquet(tbl).count()
        assert torn < len(expected)  # genuinely torn mid-commit
        upsert_batch_into_parquet(batch, tbl, ["order_id"])
        got = sorted(tuple(r) for r in spark.read.parquet(tbl).collect())
        assert got == expected

    def test_stale_staging_cannot_leak_into_next_commit(
        self, spark, tmp_path
    ):
        """Crash BETWEEN task commit and job commit: the dead writer's
        staged task output sits under _temporary/0, which the NEXT
        append job REUSES — its job commit would publish the dead
        files alongside its own (measured before the sweep existed).
        Both append sinks sweep the staging dir first."""
        import glob
        import os
        import shutil

        from sales_analytics_etl_sql_powerbi_spark.sources.sinks import (
            write_append,
        )
        from sales_analytics_etl_sql_powerbi_spark.streaming.sinks import (
            upsert_batch_into_parquet,
        )

        for sink in ("upsert", "append"):
            tbl = str(tmp_path / f"tbl_{sink}")
            upsert_batch_into_parquet(
                self._batch(spark, 0, 5), tbl, ["order_id"]
            )
            # dead writer's committed-task-but-not-job output
            stale_src = str(tmp_path / f"stale_{sink}")
            self._batch(spark, 900, 905).coalesce(1).write.parquet(stale_src)
            task_dir = os.path.join(
                tbl, "_temporary", "0", "task_202001010000_0000_m_000000"
            )
            os.makedirs(task_dir)
            shutil.copy(
                glob.glob(stale_src + "/part-*.parquet")[0],
                os.path.join(task_dir, "part-99999-stale.parquet"),
            )
            nxt = self._batch(spark, 5, 8)
            if sink == "upsert":
                upsert_batch_into_parquet(nxt, tbl, ["order_id"])
            else:
                write_append(nxt, tbl)
            keys = {
                r.order_id for r in spark.read.parquet(tbl).collect()
            }
            assert keys == {f"k{i}" for i in range(8)}, (sink, keys)
            assert not os.path.isdir(os.path.join(tbl, "_temporary"))


class TestConcurrentWriters:
    """Round 18 (VERDICT r17 item 1): the single-writer contract is
    mechanical, not documentary. Plain appends stage in per-writer
    isolated dirs and publish by rename, so concurrent appends
    COMPOSE; the check-then-act upsert takes a liveness-checked lock
    and a second live writer RAISES instead of silently inserting
    duplicate keys. Dead writers are GC'd; live ones are never swept."""

    @staticmethod
    def _batch(spark, lo, hi):
        return spark.range(lo, hi).selectExpr(
            "concat('k', id) as order_id", "id * 10 as units"
        )

    @staticmethod
    def _dead_pid():
        import subprocess
        import sys

        p = subprocess.Popen([sys.executable, "-c", ""])
        p.wait()
        return p.pid

    @staticmethod
    def _leftovers(tbl):
        import os

        return [
            n
            for n in os.listdir(tbl)
            if n.startswith("_staging_") or n == "_temporary"
        ]

    def test_concurrent_appends_compose(self, spark, tmp_path):
        """Two writers appending disjoint batches AT THE SAME TIME:
        every row of both lands (the r17 shared-_temporary design lost
        one writer's staged rows here), no staging leftovers remain."""
        from concurrent.futures import ThreadPoolExecutor

        from sales_analytics_etl_sql_powerbi_spark.sources.sinks import (
            write_append,
        )

        tbl = str(tmp_path / "tbl")

        def writer(base):
            for i in range(3):
                write_append(
                    self._batch(spark, base + i * 10, base + i * 10 + 10), tbl
                )

        with ThreadPoolExecutor(2) as ex:
            futs = [ex.submit(writer, 0), ex.submit(writer, 1000)]
            for f in futs:
                f.result()
        got = {r.order_id for r in spark.read.parquet(tbl).collect()}
        want = {f"k{i}" for i in range(30)} | {
            f"k{i}" for i in range(1000, 1030)
        }
        assert got == want
        assert self._leftovers(tbl) == []

    def test_upsert_raises_under_live_lock(self, spark, tmp_path):
        """A live concurrent upsert writer must RAISE, not interleave."""
        import json
        import os
        import socket

        import pytest

        from sales_analytics_etl_sql_powerbi_spark.sources.sinks import (
            ConcurrentWriteError,
        )
        from sales_analytics_etl_sql_powerbi_spark.streaming.sinks import (
            upsert_batch_into_parquet,
        )

        tbl = str(tmp_path / "tbl")
        upsert_batch_into_parquet(self._batch(spark, 0, 3), tbl, ["order_id"])
        with open(os.path.join(tbl, "_UPSERT_LOCK"), "w") as f:
            json.dump({"pid": os.getpid(), "host": socket.gethostname()}, f)
        with pytest.raises(ConcurrentWriteError, match="live writer"):
            upsert_batch_into_parquet(
                self._batch(spark, 3, 6), tbl, ["order_id"]
            )
        # table unchanged — the locked-out writer wrote nothing
        assert spark.read.parquet(tbl).count() == 3

    def test_upsert_reclaims_dead_writer_lock(self, spark, tmp_path):
        """A crashed writer's lock must not wedge the table."""
        import json
        import os
        import socket

        from sales_analytics_etl_sql_powerbi_spark.streaming.sinks import (
            upsert_batch_into_parquet,
        )

        tbl = str(tmp_path / "tbl")
        upsert_batch_into_parquet(self._batch(spark, 0, 3), tbl, ["order_id"])
        with open(os.path.join(tbl, "_UPSERT_LOCK"), "w") as f:
            json.dump(
                {"pid": self._dead_pid(), "host": socket.gethostname()}, f
            )
        upsert_batch_into_parquet(self._batch(spark, 3, 6), tbl, ["order_id"])
        assert spark.read.parquet(tbl).count() == 6
        assert not os.path.exists(os.path.join(tbl, "_UPSERT_LOCK"))

    def test_concurrent_upserts_never_duplicate_keys(self, spark, tmp_path):
        """Two upsert writers racing on OVERLAPPING keys: each either
        completes or raises ConcurrentWriteError, and the table never
        holds a duplicate key — the exact corruption the unlocked
        check-then-act window allowed."""
        from concurrent.futures import ThreadPoolExecutor

        from sales_analytics_etl_sql_powerbi_spark.sources.sinks import (
            ConcurrentWriteError,
        )
        from sales_analytics_etl_sql_powerbi_spark.streaming.sinks import (
            upsert_batch_into_parquet,
        )

        tbl = str(tmp_path / "tbl")

        def writer():
            try:
                upsert_batch_into_parquet(
                    self._batch(spark, 0, 20), tbl, ["order_id"]
                )
                return "ok"
            except ConcurrentWriteError:
                return "locked"

        with ThreadPoolExecutor(2) as ex:
            outcomes = sorted(
                f.result() for f in [ex.submit(writer), ex.submit(writer)]
            )
        assert outcomes in (["locked", "ok"], ["ok", "ok"])
        rows = spark.read.parquet(tbl).groupBy("order_id").count().collect()
        assert all(r["count"] == 1 for r in rows), rows
        if "ok" in outcomes:
            assert len(rows) == 20

    def test_dead_writer_staging_swept_live_staging_kept(
        self, spark, tmp_path
    ):
        """GC discrimination: a dead same-host writer's staged rows are
        swept and never published; a LIVE writer's staging survives the
        other writer's sweep untouched (the r17 unconditional sweep
        deleted it mid-job — silent row loss)."""
        import glob
        import json
        import os
        import shutil
        import socket

        from sales_analytics_etl_sql_powerbi_spark.sources.sinks import (
            write_append,
        )

        tbl = str(tmp_path / "tbl")
        write_append(self._batch(spark, 0, 5), tbl)
        side = str(tmp_path / "side")
        self._batch(spark, 900, 905).coalesce(1).write.parquet(side)
        part = glob.glob(side + "/part-*.parquet")[0]
        host = socket.gethostname()
        for token, pid in (("deadtok", self._dead_pid()), ("livetok", os.getpid())):
            os.makedirs(os.path.join(tbl, f"_staging_{token}"))
            shutil.copy(
                part, os.path.join(tbl, f"_staging_{token}", "part-0.parquet")
            )
            with open(
                os.path.join(tbl, f"_staging_{token}.writer"), "w"
            ) as f:
                json.dump({"pid": pid, "host": host}, f)
        write_append(self._batch(spark, 5, 8), tbl)
        keys = {r.order_id for r in spark.read.parquet(tbl).collect()}
        assert keys == {f"k{i}" for i in range(8)}  # staged rows unpublished
        left = self._leftovers(tbl)
        assert sorted(left) == ["_staging_livetok", "_staging_livetok.writer"]

    def test_foreign_host_staging_and_lock_never_reclaimed(
        self, spark, tmp_path
    ):
        """Liveness is only probeable same-host, so a FOREIGN host's
        staging dir and upsert lock are conservatively treated as
        live: the GC must not sweep the staging (it may be mid-flight)
        and the lock must raise with remove-by-hand instructions, even
        when the recorded pid happens to be dead HERE."""
        import json
        import os

        import pytest

        from sales_analytics_etl_sql_powerbi_spark.sources.sinks import (
            ConcurrentWriteError,
            write_append,
        )
        from sales_analytics_etl_sql_powerbi_spark.streaming.sinks import (
            upsert_batch_into_parquet,
        )

        tbl = str(tmp_path / "tbl")
        write_append(self._batch(spark, 0, 5), tbl)
        dead = self._dead_pid()  # dead on THIS host — host differs though
        os.makedirs(os.path.join(tbl, "_staging_foreign"))
        with open(os.path.join(tbl, "_staging_foreign.writer"), "w") as f:
            json.dump({"pid": dead, "host": "some-other-executor-host"}, f)
        write_append(self._batch(spark, 5, 8), tbl)
        left = self._leftovers(tbl)
        assert sorted(left) == [
            "_staging_foreign", "_staging_foreign.writer"
        ]
        with open(os.path.join(tbl, "_UPSERT_LOCK"), "w") as f:
            json.dump({"pid": dead, "host": "some-other-executor-host"}, f)
        with pytest.raises(ConcurrentWriteError, match="foreign host"):
            upsert_batch_into_parquet(
                self._batch(spark, 8, 10), tbl, ["order_id"]
            )

    def test_failed_append_cleans_own_staging(self, spark, tmp_path):
        """A staging write that FAILS removes its own staging + marker
        before re-raising (same-pid leftovers are unsweepable by the
        liveness GC, so the writer must clean up after itself)."""
        import pytest

        from sales_analytics_etl_sql_powerbi_spark.sources.sinks import (
            write_append,
        )

        tbl = str(tmp_path / "tbl")
        write_append(self._batch(spark, 0, 5), tbl)
        poison = spark.range(5, 10).selectExpr(
            "concat('k', id) as order_id",
            "cast(assert_true(id < 7, 'boom') as long) as units",
        )
        with pytest.raises(Exception):
            write_append(poison, tbl)
        assert self._leftovers(tbl) == []
        assert spark.read.parquet(tbl).count() == 5
