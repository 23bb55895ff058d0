"""Sources & sinks (SURVEY §2.1 S1-S9)."""

import os

import pytest
from pyspark.sql import types as T

from sales_analytics_etl_sql_powerbi_spark.sources.readers import (
    read_csv_all_string,
    read_events,
    read_input,
    read_table,
)
from sales_analytics_etl_sql_powerbi_spark.sources.sinks import (
    create_table_if_not_exists,
    register_temp_view,
    with_load_defaults,
    write_append,
    write_overwrite,
)


def test_csv_all_string_bom_header(spark, tmp_path):
    p = tmp_path / "orders.csv"
    # UTF-8 BOM + space/hyphen headers + numeric-looking data
    p.write_bytes("﻿Order No,Batch Number,goods-number\nA1,B1,3\n".encode())
    df = read_csv_all_string(spark, str(p))
    assert df.columns == ["Order_No", "Batch_Number", "goods_number"]
    assert all(isinstance(f.dataType, T.StringType) for f in df.schema.fields)
    assert df.first().goods_number == "3"  # stays a string


def test_read_input_dispatch(spark, tmp_path):
    with pytest.raises(ValueError, match="Unsupported input extension"):
        read_input(spark, "/nope/file.avro")


def test_read_events_nanos_normalized(spark, sf_dir):
    ev = read_events(spark, sf_dir)
    assert isinstance(ev.schema["ts"].dataType, T.TimestampType)
    assert ev.count() > 0


def test_write_modes_and_create(spark, tmp_path):
    df = spark.range(3).withColumnRenamed("id", "n")
    path = str(tmp_path / "t")
    assert create_table_if_not_exists(df, path) is True
    assert create_table_if_not_exists(df, path) is False  # second call no-op
    write_overwrite(df, path)
    write_append(df, path)
    assert spark.read.parquet(path).count() == 6
    write_overwrite(df, path)  # truncate-reload semantics
    assert spark.read.parquet(path).count() == 3


def test_large_single_csv_splits_across_tasks(spark, tmp_path):
    """Round 18 (VERDICT r17 item 7): the CSV ingest floor is an IO
    floor per byte, so at 100 TB the question is PARALLELISM — one
    multi-GB uncompressed CSV must split across tasks, not serialize
    through one. Uncompressed CSV is line-splittable; Spark carves it
    by spark.sql.files.maxPartitionBytes. Pinned here: a single ~6 MB
    file under a 1 MB split size scans as >1 input partition through
    OUR reader (read_csv_all_string), with exact row fidelity across
    the split boundaries (a row straddling two splits must be read
    once, by the split that owns its start)."""
    p = tmp_path / "big.csv"
    n = 60_000
    with open(p, "w", encoding="utf-8") as f:
        f.write("order id,customer,amount\n")
        for i in range(n):
            f.write(f"o{i},customer_{i % 997}_{'x' * 60},{i}.25\n")
    assert p.stat().st_size > 4 * 1024 * 1024
    conf = spark.conf
    old_mpb = conf.get("spark.sql.files.maxPartitionBytes")
    old_open = conf.get("spark.sql.files.openCostInBytes")
    try:
        conf.set("spark.sql.files.maxPartitionBytes", str(1024 * 1024))
        conf.set("spark.sql.files.openCostInBytes", "0")
        df = read_csv_all_string(spark, str(p))
        n_splits = df.rdd.getNumPartitions()
        assert n_splits > 1, "single CSV file did not split across tasks"
        assert df.count() == n
        # spot fidelity: no duplicated/lost boundary rows
        assert df.where("order_id = 'o0'").count() == 1
        assert df.where(f"order_id = 'o{n - 1}'").count() == 1
        assert df.select("order_id").distinct().count() == n
    finally:
        conf.set("spark.sql.files.maxPartitionBytes", old_mpb)
        conf.set("spark.sql.files.openCostInBytes", old_open)


def test_append_scheme_qualified_path_sweeps_and_publishes(spark, tmp_path):
    """ADVICE r17: the r17 sweep used os.path, so a scheme-qualified
    table path (file:/, hdfs://) silently SKIPPED the stale-staging
    sweep the crash contract promises. All sink file ops now go
    through the Hadoop FS resolver — a file:-qualified table appends,
    publishes, and sweeps a planted legacy ``_temporary/`` exactly
    like a bare path."""
    df = spark.range(3).withColumnRenamed("id", "n")
    local = tmp_path / "t"
    path = "file://" + str(local)
    write_append(df, path)
    stale = local / "_temporary" / "0" / "task_x"
    stale.mkdir(parents=True)
    (stale / "junk").write_text("x")
    write_append(df, path)
    assert spark.read.parquet(path).count() == 6
    leftovers = [
        n
        for n in os.listdir(local)
        if n == "_temporary" or n.startswith("_staging_")
    ]
    assert leftovers == []


def test_partitioned_append_publishes_partition_dirs(spark, tmp_path):
    """Isolated-staging publish must preserve hive partition layout."""
    df = spark.createDataFrame([(1, "a"), (2, "b")], "n int, part string")
    path = str(tmp_path / "p")
    write_append(df, path, partition_by=["part"])
    write_append(
        spark.createDataFrame([(3, "a")], "n int, part string"),
        path,
        partition_by=["part"],
    )
    assert os.path.isdir(os.path.join(path, "part=a"))
    assert spark.read.parquet(path).where("part = 'a'").count() == 2
    assert spark.read.parquet(path).count() == 3


def test_partitioned_write_prunes(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "n int, part string")
    path = str(tmp_path / "p")
    write_overwrite(df, path, partition_by=["part"])
    assert os.path.isdir(os.path.join(path, "part=a"))
    got = spark.read.parquet(path).where("part = 'a'")
    assert got.count() == 1


def test_with_load_defaults(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(None,), (5,)], "units int")
    out = with_load_defaults(df, defaults={"units": F.lit(1)})
    assert {r.units for r in out.collect()} == {1, 5}
    assert "load_ts" in out.columns
    assert out.where(out.load_ts.isNull()).count() == 0


def test_register_temp_view(spark):
    df = spark.range(2)
    register_temp_view(df, "tv_test")
    assert spark.table("tv_test").count() == 2


def test_read_table_all_tables(spark, sf_dir):
    for t in ("nation", "documents", "embeddings"):
        assert read_table(spark, sf_dir, t).count() > 0


def test_scan_spread_parallelizes_row_group_starved_files(spark, sf_dir):
    """Round 18: a one-row-group parquet scan spreads to the session
    parallelism; tiny tables and disabled-conf reads stay unspread;
    rows are identical either way."""
    from sales_analytics_etl_sql_powerbi_spark.sources.readers import (
        parquet_layout,
        spread_scan,
    )

    p = spark.sparkContext.defaultParallelism
    rows, groups = parquet_layout(os.path.join(sf_dir, "documents.parquet"))
    assert groups == 1  # precondition of the fixture data
    if rows < 64 * p:
        # a very-high-core runner can outgrow the small fixture; the
        # ==p assertions below would then fail on correct code
        # (ADVICE r18) — the contract is still covered on standard
        # runners
        import pytest

        pytest.skip(f"fixture too small for parallelism {p}")
    docs = read_table(spark, sf_dir, "documents")
    assert docs.rdd.getNumPartitions() == p
    # sub-threshold table: no spread (no pointless exchange)
    assert read_table(spark, sf_dir, "nation").rdd.getNumPartitions() == 1
    # per-call opt-out
    raw = read_table(spark, sf_dir, "documents", spread=False)
    assert raw.rdd.getNumPartitions() == 1
    # conf kill-switch (plan tests that pin the at-scale shape use it)
    spark.conf.set("spark_graft.scan.rowsPerSlice", "0")
    try:
        off = read_table(spark, sf_dir, "documents")
        assert off.rdd.getNumPartitions() == 1
    finally:
        spark.conf.unset("spark_graft.scan.rowsPerSlice")
    # value identity across the spread
    a = sorted(map(tuple, docs.select("doc_id").collect()))
    b = sorted(map(tuple, raw.select("doc_id").collect()))
    assert a == b
    # non-parquet/unreadable layout: spread_scan degrades to identity
    assert spread_scan(spark, raw, "/nonexistent.parquet") is raw


def test_excel_ingest_live(spark, tmp_path):
    """S2 — driver-side Excel ingest runs in-container: a real .xlsx
    round-trip through the stdlib zip+XML reader, every value a raw
    string (dtype=str semantics), headers normalized."""
    from sales_analytics_etl_sql_powerbi_spark.sources.readers import read_excel
    from sales_analytics_etl_sql_powerbi_spark.sources.xlsx import (
        write_minimal_xlsx,
    )

    p = str(tmp_path / "orders.xlsx")
    write_minimal_xlsx(
        p,
        ["Order No", "goodsNumber", "Notes"],
        [
            ["A1", 3, "first & <escaped>"],
            ["A2", 4.5, None],  # sparse row cell + float formatting
            [None, 7, "third"],  # leading gap keeps column alignment
        ],
    )
    df = read_excel(spark, p)
    assert df.columns == ["Order_No", "goodsNumber", "Notes"]
    rows = df.collect()
    assert [r.Order_No for r in rows] == ["A1", "A2", None]
    assert [r.goodsNumber for r in rows] == ["3", "4.5", "7"]
    assert rows[0].Notes == "first & <escaped>"
    assert rows[1].Notes is None


def test_excel_sheet_selection_and_errors(spark, tmp_path):
    import pytest as _pytest

    from sales_analytics_etl_sql_powerbi_spark.sources.readers import read_excel
    from sales_analytics_etl_sql_powerbi_spark.sources.xlsx import (
        write_minimal_xlsx,
    )

    p = str(tmp_path / "sheeted.xlsx")
    write_minimal_xlsx(p, ["K"], [["v"]], sheet_name="Export")
    assert read_excel(spark, p, sheet="Export").first().K == "v"
    with _pytest.raises(ValueError, match="not found"):
        read_excel(spark, p, sheet="Missing")
    with _pytest.raises(ValueError, match="out of range"):
        read_excel(spark, p, sheet=3)
    # legacy .xls goes through the BIFF8 parser (round 12), no longer
    # a NotImplementedError boundary — full coverage in test_xls.py
    from sales_analytics_etl_sql_powerbi_spark.sources.xls import (
        write_minimal_xls,
    )

    p_xls = str(tmp_path / "legacy.xls")
    write_minimal_xls(p_xls, ["K"], [["v"]], sheet_name="Export")
    assert read_excel(spark, p_xls, sheet="Export").first().K == "v"


def test_fact_partition_pruning_roundtrip(spark, sf_dir, tmp_path):
    """Write the fact partitioned by date; a date filter must reach the
    scan as a PartitionFilter (pruning, not post-scan filtering)."""
    from pyspark.sql import functions as F

    from sales_analytics_etl_sql_powerbi_spark import pipeline

    fact = pipeline.star(spark, sf_dir)["fact"]
    path = str(tmp_path / "fact")
    write_overwrite(fact, path, partition_by=["date_id"])

    some_date = spark.read.parquet(path).select("date_id").first().date_id
    q = spark.read.parquet(path).where(F.col("date_id") == F.lit(some_date))
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(date_id" in plan
    assert q.count() > 0


def test_clustered_write_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(i % 7, i) for i in range(1000)], "k int, v int"
    )
    path = str(tmp_path / "clustered")
    write_overwrite(df, path, cluster_by=["k"])
    back = spark.read.parquet(path)
    assert back.count() == 1000
    assert {r.k for r in back.select("k").distinct().collect()} == set(range(7))


def test_csv_export_roundtrip_clean(spark, sf_dir):
    """The CSV front door end-to-end: deterministic export fixture →
    extension dispatch → all-string scan → normalized headers → typed
    cleaning stack. Dirt rows must land as NULL/default, never error."""
    from sales_analytics_etl_sql_powerbi_spark import pipeline
    from sales_analytics_etl_sql_powerbi_spark.sources.fixtures import (
        ensure_order_export_csv,
    )

    path = ensure_order_export_csv(sf_dir)
    raw = read_input(spark, path)
    assert all(f.dataType.simpleString() == "string" for f in raw.schema.fields)
    assert "Line_Number" in raw.columns  # ' Line-Number ' normalized
    out = pipeline.clean_order_export(raw)
    rows = out.collect()
    assert len(rows) > 0
    types = {f.name: f.dataType.simpleString() for f in out.schema.fields}
    assert types["order_id"] == "int" and types["submit_ts"] == "timestamp"
    # deterministic dirt: some timestamps NULL (unparseable), none raise
    assert any(r.submit_ts is None for r in rows)
    assert all(r.units is not None for r in rows)  # default applied
    assert all(r.discount_code is None for r in rows)  # ensured column
    assert max(len(r.notes) for r in rows) <= 30  # width truncation


def test_bucketed_join_needs_no_exchange(spark, sf_dir, tmp_path):
    """Both sides bucketed on the join key → the join plans without a
    shuffle: the scale answer for fact-to-fact joins that cannot
    broadcast (lineitem⋈orders at 100 TB)."""
    import uuid

    from sales_analytics_etl_sql_powerbi_spark.sources.sinks import write_bucketed

    # bucketed tables need the catalog; they land in the session's
    # spark-warehouse dir (gitignored) and are dropped at the end
    suffix = uuid.uuid4().hex[:8]
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    write_bucketed(li, f"li_b_{suffix}", ["l_orderkey"], n_buckets=8)
    write_bucketed(orders, f"ord_b_{suffix}", ["o_orderkey"], n_buckets=8)
    a = spark.table(f"li_b_{suffix}")
    b = spark.table(f"ord_b_{suffix}")
    joined = a.join(b, a.l_orderkey == b.o_orderkey)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, plan
    assert joined.count() == li.count()
    spark.sql(f"DROP TABLE li_b_{suffix}")
    spark.sql(f"DROP TABLE ord_b_{suffix}")


def test_read_input_jsonl_and_text(spark, tmp_path):
    p = tmp_path / "docs.jsonl"
    p.write_text('{"doc_id": 1, "text": "hello"}\n{"doc_id": 2, "text": "world"}\n')
    from sales_analytics_etl_sql_powerbi_spark.sources.readers import read_input

    df = read_input(spark, str(p))
    assert sorted((r.doc_id, r.text) for r in df.collect()) == [
        (1, "hello"),
        (2, "world"),
    ]

    t = tmp_path / "corpus.txt"
    t.write_text("line one\nline two\n")
    tf = read_input(spark, str(t))
    assert tf.columns == ["value"]
    assert sorted(r.value for r in tf.collect()) == ["line one", "line two"]


def test_excel_distributed_parity_and_alignment(spark, tmp_path):
    """The binaryFile+mapInPandas Excel path must equal per-file
    read_excel + union on multi-file input — including a workbook with
    a DIFFERENT column order and one with a missing column (aligned by
    normalized header name, NULL-filled); a workbook carrying an
    unknown column fails the load loudly."""
    import pytest as _pytest

    from sales_analytics_etl_sql_powerbi_spark.sources.readers import (
        read_excel,
        read_excel_distributed,
    )
    from sales_analytics_etl_sql_powerbi_spark.sources.xlsx import (
        write_minimal_xlsx,
    )

    d = tmp_path / "drops"
    d.mkdir()
    write_minimal_xlsx(
        str(d / "a.xlsx"),
        ["Order No", "goodsNumber", "Notes"],
        [["A1", 3, "x"], ["A2", 4.5, None]],
    )
    # different column order: alignment must be by name, not position
    write_minimal_xlsx(
        str(d / "b.xlsx"),
        ["Notes", "Order No", "goodsNumber"],
        [["y", "B1", 7]],
    )
    # missing column: NULL-filled
    write_minimal_xlsx(str(d / "c.xlsx"), ["Order No"], [["C1"], ["C2"]])

    dist = read_excel_distributed(spark, str(d / "*.xlsx"))
    assert dist.columns == ["source_file", "Order_No", "goodsNumber", "Notes"]

    expected = []
    for f in sorted(d.glob("*.xlsx")):
        for r in read_excel(spark, str(f)).collect():
            row = r.asDict()
            expected.append(
                (row.get("Order_No"), row.get("goodsNumber"), row.get("Notes"))
            )
    got = [
        (r.Order_No, r.goodsNumber, r.Notes)
        for r in dist.select("Order_No", "goodsNumber", "Notes").collect()
    ]
    assert sorted(got, key=str) == sorted(expected, key=str)
    # lineage column carries the real file path
    assert all(r.source_file.endswith(".xlsx") for r in dist.collect())

    # schema drift (unknown column) stops the load
    write_minimal_xlsx(str(d / "z.xlsx"), ["Order No", "Rogue"], [["Z1", "!"]])
    from py4j.protocol import Py4JJavaError

    with _pytest.raises((Py4JJavaError, Exception), match="schema drift"):
        read_excel_distributed(spark, str(d / "*.xlsx")).collect()


def test_zorder_layout_tightens_stats_in_every_dimension(spark, tmp_path):
    """Z-order must give usefully-tight per-file min/max ranges for BOTH
    columns; a single-column sort only does for its own column. Measured
    from the actual parquet footers — the stats the reader prunes on."""
    import glob

    import pyarrow.parquet as pq

    from sales_analytics_etl_sql_powerbi_spark.sources import sinks

    n = 1 << 14
    df = (
        spark.range(n)
        .selectExpr(
            "cast(conv(substring(md5(cast(id as string)), 1, 6), 16, 10) % 1024 as long) x",
            "cast(conv(substring(md5(cast(id as string)), 7, 6), 16, 10) % 1024 as long) y",
        )
    )

    def avg_spread(path, col):
        spreads = []
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            idx = md.schema.names.index(col)
            los, his = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                los.append(st.min)
                his.append(st.max)
            spreads.append((max(his) - min(los)) / 1023)
        return sum(spreads) / len(spreads)

    zpath = str(tmp_path / "z")
    sinks.write_zordered(df, zpath, ["x", "y"], n_files=16)
    spath = str(tmp_path / "s")
    df.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(spath)

    # x-sorted layout: x tight, y useless (~full range per file)
    assert avg_spread(spath, "x") < 0.15
    assert avg_spread(spath, "y") > 0.85
    # z-order: BOTH dimensions usefully tight (16 files ≈ 4×4 grid → ~0.25)
    assert avg_spread(zpath, "x") < 0.5
    assert avg_spread(zpath, "y") < 0.5
    # and values survive the layout intact
    assert spark.read.parquet(zpath).count() == n


def test_zorder_value_validation():
    import pytest

    from sales_analytics_etl_sql_powerbi_spark.sources import sinks

    with pytest.raises(ValueError):
        sinks.zorder_value({"x": (0, 10)})


def test_quantile_zorder_equalizes_bucket_heights_on_skew(spark, tmp_path):
    """The quantile variant's mechanism: on a heavy-tailed column,
    uniform-width bucketing concentrates a large share of rows into one
    bucket (that dimension contributes nothing to clustering there);
    quantile cuts give ~equal-height buckets. File ROW-count balance is
    NOT the discriminator — repartitionByRange balances counts under
    either bucketing — so the histogram is asserted directly, plus the
    written quantile layout round-trips completely."""
    import bisect
    import glob
    import math

    import pyarrow.parquet as pq

    from sales_analytics_etl_sql_powerbi_spark.sources import sinks

    n = 1 << 13
    bits = 6
    # x ~ heavy-tailed (cubed hash), y uniform
    df = spark.range(n).selectExpr(
        "cast(pow(conv(substring(md5(cast(id as string)), 1, 4), 16, 10) % 256, 3) as long) x",
        "cast(conv(substring(md5(cast(id as string)), 7, 6), 16, 10) % 1024 as long) y",
    )
    xs = sorted(r.x for r in df.select("x").collect())
    lo, hi = xs[0], xs[-1]
    span = float(hi - lo) or 1.0
    nb = 1 << bits
    uni = [0] * nb
    for x in xs:
        uni[min(nb - 1, int(math.floor((x - lo) / span * nb)))] += 1
    cuts = df.stat.approxQuantile(["x"], [i / nb for i in range(1, nb)], 0.001)[0]
    qnt = [0] * nb
    for x in xs:
        qnt[min(nb - 1, bisect.bisect_right(sorted(cuts), x))] += 1
    # uniform: the dense head lands in one bucket (>25% of all rows);
    # quantile: no bucket above ~3x the even split
    assert max(uni) / n > 0.25, max(uni) / n
    assert max(qnt) / n < 3 / nb, max(qnt) / n
    # and the executed writer path round-trips completely
    qpath = str(tmp_path / "quant")
    sinks.write_zordered(df, qpath, ["x", "y"], n_files=8, bits=bits, quantile=True)
    assert (
        sum(pq.ParquetFile(f).metadata.num_rows for f in glob.glob(f"{qpath}/*.parquet"))
        == n
    )
    assert spark.read.parquet(qpath).agg({"x": "sum"}).collect()[0][0] == sum(xs)


def test_compact_parquet_reduces_file_count_preserves_rows(spark, tmp_path):
    import glob

    from sales_analytics_etl_sql_powerbi_spark.sources import sinks

    src = str(tmp_path / "many")
    # 40 tiny appended files (micro-batch append pattern)
    for i in range(10):
        spark.range(i * 100, (i + 1) * 100).selectExpr(
            "id", "cast(id % 7 as long) k"
        ).repartition(4).write.mode("append").parquet(src)
    n_src = len(glob.glob(f"{src}/*.parquet"))
    assert n_src >= 40
    dst = str(tmp_path / "compact")
    total = sum(
        __import__("os").path.getsize(f) for f in glob.glob(f"{src}/*.parquet")
    )
    out = sinks.compact_parquet(
        spark, src, dst, target_file_bytes=total // 3, sort_within_by=["k"]
    )
    assert out <= 4  # ~3 target-sized files, not 40
    a = spark.read.parquet(src)
    b = spark.read.parquet(dst)
    assert b.count() == 1000
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_write_zordered_empty_input_is_noop_write(spark, tmp_path):
    from sales_analytics_etl_sql_powerbi_spark.sources import sinks

    empty = spark.range(0).selectExpr("id x", "id y")
    for q in (False, True):
        p = str(tmp_path / f"e{q}")
        sinks.write_zordered(empty, p, ["x", "y"], quantile=q)
        assert spark.read.parquet(p).count() == 0


def test_compact_parquet_handles_partitioned_source_and_empty(spark, tmp_path):
    import pytest

    from sales_analytics_etl_sql_powerbi_spark.sources import sinks

    src = str(tmp_path / "part_src")
    spark.range(200).selectExpr("id", "cast(id % 3 as long) dt").write.partitionBy(
        "dt"
    ).parquet(src)
    dst = str(tmp_path / "part_dst")
    n = sinks.compact_parquet(
        spark, src, dst, target_file_bytes=10**12, partition_by=["dt"]
    )
    assert n >= 1 and spark.read.parquet(dst).count() == 200
    import glob as _g

    assert sorted(
        d.split("dt=")[1] for d in _g.glob(f"{dst}/dt=*")
    ) == ["0", "1", "2"]  # hive layout preserved
    with pytest.raises(ValueError):
        sinks.compact_parquet(spark, str(tmp_path / "nothing"), dst)


def test_compact_parquet_splits_large_hive_partition(spark, tmp_path):
    """A skewed hive partition must split into several ~target-sized
    files (range partitioner allocates tasks by row count), not
    collapse into one oversized single-task file."""
    import glob

    from sales_analytics_etl_sql_powerbi_spark.sources import sinks

    src = str(tmp_path / "skew_src")
    # dt=0 holds 95% of the rows; dt=1/dt=2 are tiny
    spark.range(20_000).selectExpr(
        "id", "cast(case when id < 19000 then 0 else id % 2 + 1 end as long) dt"
    ).write.partitionBy("dt").parquet(src)
    total = sum(
        __import__("os").path.getsize(f)
        for f in glob.glob(f"{src}/**/*.parquet", recursive=True)
    )
    dst = str(tmp_path / "skew_dst")
    sinks.compact_parquet(
        spark, src, dst, target_file_bytes=max(total // 6, 1), partition_by=["dt"]
    )
    big = glob.glob(f"{dst}/dt=0/*.parquet")
    assert len(big) >= 2, "large partition stayed a single file"
    small = glob.glob(f"{dst}/dt=1/*.parquet") + glob.glob(f"{dst}/dt=2/*.parquet")
    assert len(small) <= 4  # small partitions are NOT sprayed into n_files
    a, b = spark.read.parquet(src), spark.read.parquet(dst)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_compact_parquet_all_columns_partitioned_fails_cleanly(spark, tmp_path):
    """partition_by covering EVERY column: no within-partition split
    key exists. The compact must not die in a confusing zero-arg
    F.hash() — it reaches the write, where Spark raises its canonical
    ALL_PARTITION_COLUMNS_NOT_ALLOWED (such a table cannot exist as
    hive-partitioned parquet anyway)."""
    import pytest
    from pyspark.errors.exceptions.captured import AnalysisException

    from sales_analytics_etl_sql_powerbi_spark.sources import sinks

    src = str(tmp_path / "pk_src")
    spark.range(50).selectExpr(
        "cast(id % 3 as long) dt", "id AS x"
    ).write.partitionBy("dt").parquet(src)
    dst = str(tmp_path / "pk_dst")
    with pytest.raises(AnalysisException, match="ALL_PARTITION_COLUMNS"):
        sinks.compact_parquet(
            spark, src, dst, target_file_bytes=10**12, partition_by=["dt", "x"]
        )


def test_asof_tolerance_preserves_column_order(spark):
    """Tolerance and no-tolerance calls of the same as-of function must
    return the SAME column order (ADVICE r5: the old implementation
    re-appended masked payload columns at the end)."""
    from sales_analytics_etl_sql_powerbi_spark.operators import asof

    left = spark.createDataFrame(
        [(1, 10, 100.0)], "event_id long, user_id long, ts double"
    )
    right = spark.createDataFrame(
        [(10, 90.0, 5, 1.0)], "user_id long, ts double, src long, value double"
    )
    for fn, kw in [
        (asof.asof_backward, {}),
        (asof.asof_forward, {}),
        (asof.asof_nearest, {"left_key": "event_id"}),
    ]:
        plain = fn(left, right, on="user_id", ts="ts", payload=("src", "value"), **kw)
        tol = fn(
            left, right, on="user_id", ts="ts", payload=("src", "value"),
            tolerance_seconds=5.0, **kw,
        )
        assert plain.columns == tol.columns


def test_write_zordered_all_null_column_errors(spark, tmp_path):
    import pytest

    from sales_analytics_etl_sql_powerbi_spark.sources import sinks

    df = spark.range(10).selectExpr("id x", "cast(null as long) y")
    for q in (False, True):
        with pytest.raises(ValueError, match="all-NULL"):
            sinks.write_zordered(df, str(tmp_path / f"n{q}"), ["x", "y"], quantile=q)
