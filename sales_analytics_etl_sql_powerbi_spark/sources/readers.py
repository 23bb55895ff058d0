"""Input readers — SURVEY §2.1 S1–S4.

The reference ingests order/product exports with
``pd.read_csv(dtype=str, encoding='utf-8-sig')`` (reference
etl/order_info_etl.py:176) or ``pd.read_excel(dtype=str)`` (:178),
dispatched by file extension (:174-180). Semantics to preserve:

- **everything arrives as string** (schema-on-write: explicit coercion
  later, malformed → NULL — never an ingest error);
- BOM-tolerant headers (utf-8-sig);
- unknown extension → ValueError.

Spark-first shape: the CSV path is a real distributed scan (a 100 TB
export directory splits into ~800k tasks at 128 MB each); only the
Excel shim is driver-side (xlsx is a zip — not splittable — and tiny
in practice; reference sheets are single-digit MB).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..functions.cleaning import normalize_colname

#: Driver-provided testdata tables (TESTDATA.md).
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read_csv_all_string(
    spark: SparkSession, path: str, normalize_names: bool = True
) -> DataFrame:
    """S1 — CSV scan with every column as StringType (mirrors dtype=str).

    Header inference runs once (cheap driver pass over the first file's
    header line via Spark's own header handling); data columns are never
    type-inferred, exactly like the reference. The BOM is consumed by
    Spark's UTF-8 reader on the first header cell; ``normalize_colname``
    removes any residue (reference etl/order_info_etl.py:31-35,182).
    """
    df = (
        spark.read.option("header", True)
        .option("encoding", "UTF-8")
        # keep raw strings: no schema inference pass over the data
        .option("inferSchema", False)
        .csv(path)
    )
    # header=True without a schema yields all-string columns already;
    # assert rather than re-cast so a Spark behavior change is loud.
    for f in df.schema.fields:
        if not isinstance(f.dataType, T.StringType):  # pragma: no cover
            df = df.withColumn(f.name, df[f.name].cast("string"))
    if normalize_names:
        df = df.toDF(*[normalize_colname(c) for c in df.columns])
    return df


def read_excel(
    spark: SparkSession, path: str, sheet: int | str = 0, normalize_names: bool = True
) -> DataFrame:
    """S2 — Excel ingest shim (driver-side parse → createDataFrame).

    Mirrors ``pd.read_excel(path, sheet_name=SHEET, dtype=str)``
    (reference etl/order_info_etl.py:178, sheet config :13 — the
    reference accepts BOTH ``xls`` and ``xlsx``, :177). Neither
    container is splittable, so a driver-side read is the honest
    architecture; both parses are pure-stdlib — zip+XML for ``.xlsx``
    (:mod:`.xlsx`) and CFB+BIFF8 for legacy binary ``.xls``
    (:mod:`.xls`) — and every value arrives as a raw string, like
    every other source.
    """
    if path.lower().endswith(".xls"):
        from .xls import read_xls_table

        headers, rows = read_xls_table(path, sheet)
    else:
        from .xlsx import read_xlsx_table

        headers, rows = read_xlsx_table(path, sheet)
    schema = T.StructType(
        [T.StructField(str(h), T.StringType(), True) for h in headers]
    )
    df = spark.createDataFrame(rows, schema=schema)
    if normalize_names:
        df = df.toDF(*[normalize_colname(c) for c in df.columns])
    return df


def read_excel_distributed(
    spark: SparkSession,
    path: str,
    sheet: int | str = 0,
    normalize_names: bool = True,
) -> DataFrame:
    """S2 at corpus scale — many-file Excel ingest as a distributed scan.

    The single-file shim (:func:`read_excel`) matches the reference's
    one-sheet semantics (etl/order_info_etl.py:178) and is honest for a
    single workbook — an xlsx is a non-splittable zip. But a partner
    landing zone holds MANY workbooks, and there the parallelism unit
    is the FILE: ``binaryFile`` scan → Arrow-batched ``mapInPandas``
    with the same pure-stdlib zip+XML parser running per-executor, one
    workbook per row. 10k workbooks become 10k-way parallel parses with
    no driver involvement beyond listing.

    Semantics per workbook are identical to :func:`read_excel` (same
    parser, same ``sheet`` selection, every value a raw string).
    Columns are aligned BY NORMALIZED HEADER NAME across workbooks:
    the declared schema comes from the lexicographically-first file
    (one bounded driver read — metadata-cheap, like the CSV header
    pass); a workbook missing a column yields NULLs for it, and a
    workbook with a column the schema lacks fails loudly (schema drift
    should stop a load, not silently drop data). Output carries
    ``source_file`` for lineage, like Spark's own
    ``input_file_name()`` contract.

    ``path`` accepts a directory or glob (anything ``binaryFile``
    loads); non-Excel files should be excluded via the glob (e.g.
    ``dir/*.xlsx``). Each file dispatches on its own magic bytes —
    zip ('PK') → xlsx parser, OLE2 compound file → the BIFF8 ``.xls``
    parser — so mixed landing zones work.
    """
    import io

    from .xls import read_xls_table
    from .xlsx import read_xlsx_table

    def parse_workbook(content: bytes):
        if content[:2] == b"PK":
            return read_xlsx_table(io.BytesIO(content), sheet)
        return read_xls_table(content, sheet)

    files = spark.read.format("binaryFile").load(path).select("path", "content")
    first = files.orderBy("path").limit(1).collect()
    if not first:
        raise ValueError(f"No files matched {path!r}")
    headers, _ = parse_workbook(bytes(first[0].content))
    names = [normalize_colname(h) for h in headers] if normalize_names else headers
    out_schema = T.StructType(
        [T.StructField("source_file", T.StringType(), False)]
        + [T.StructField(n, T.StringType(), True) for n in names]
    )

    def parse(batches):
        import pandas as pd

        for pdf in batches:
            frames = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                h, rows = parse_workbook(bytes(content))
                file_names = [normalize_colname(c) for c in h] if normalize_names else h
                unknown = set(file_names) - set(names)
                if unknown:
                    raise ValueError(
                        f"{fpath}: columns {sorted(unknown)} not in the "
                        f"declared schema {names} (schema drift)"
                    )
                by_name = {
                    n: [r[i] for r in rows] for i, n in enumerate(file_names)
                }
                data = {"source_file": [fpath] * len(rows)}
                for n in names:
                    data[n] = pd.Series(
                        by_name.get(n, [None] * len(rows)), dtype="object"
                    )
                frames.append(pd.DataFrame(data))
            if frames:
                yield pd.concat(frames, ignore_index=True)

    return files.mapInPandas(parse, out_schema)


def read_input(spark: SparkSession, path: str, sheet: int | str = 0) -> DataFrame:
    """S3 — dispatch by extension, raise on unknown.

    Mirrors reference etl/order_info_etl.py:174-180, widened with the
    corpus drop formats a training-data pipeline ingests: JSON-lines
    (schema inferred — JSON carries types, unlike the all-string CSV
    contract) and raw text (one row per line, ``value`` column). All
    are distributed scans; only the Excel shim is driver-side.
    """
    ext = os.path.splitext(path)[1].lower()
    if ext == ".csv":
        return read_csv_all_string(spark, path)
    if ext in (".xls", ".xlsx"):
        return read_excel(spark, path, sheet=sheet)
    if ext == ".parquet":
        return spark.read.parquet(path)
    if ext in (".json", ".jsonl", ".ndjson"):
        return spark.read.json(path)
    if ext == ".txt":
        return spark.read.text(path)
    raise ValueError(f"Unsupported input extension: {ext!r} ({path})")


#: Scan-spread default: do not create slices under this many rows.
#: Overridable per session via ``spark_graft.scan.rowsPerSlice`` (``0``
#: disables the spread entirely — the plan-shape tests that pin the
#: at-scale contract use that).
SPREAD_ROWS_PER_SLICE = 64


def parquet_layout(path: str) -> tuple[int, int] | None:
    """(rows, row_groups) from local parquet footers, or ``None``.

    Metadata only — no Spark job. ``None`` when the layout cannot be
    read cheaply (scheme-qualified remote path, missing file,
    non-parquet): callers must then fall back to a safe default, never
    guess. A directory table sums the footers of its ``*.parquet``
    parts.
    """
    if "://" in path or path.startswith("file:"):
        return None
    try:
        import pyarrow.parquet as pq

        if os.path.isdir(path):
            rows = groups = 0
            for entry in os.listdir(path):
                # a nested directory (Hive key=value partitioning)
                # holds data this top-level walk would miss — fall
                # back to the safe path instead of undercounting
                # (ADVICE r18)
                if os.path.isdir(os.path.join(path, entry)):
                    return None
                if not entry.endswith(".parquet"):
                    continue
                meta = pq.ParquetFile(os.path.join(path, entry)).metadata
                rows += meta.num_rows
                groups += meta.num_row_groups
            return (rows, groups) if groups else None
        meta = pq.ParquetFile(path).metadata
        return meta.num_rows, meta.num_row_groups
    except Exception:
        return None


def spread_scan(spark: SparkSession, df: DataFrame, path: str) -> DataFrame:
    """Scale-adaptive scan parallelism (optimization round 18).

    A parquet scan's effective parallelism is bounded by the file's
    ROW-GROUP count, not its byte size: Spark plans byte-range splits,
    but every row group is read by the single task whose split holds
    its midpoint. The driver's testdata tables are one file × one row
    group each, so every scan-side expression (md5 surrogate keys,
    regex extraction, token folds, codec decode batches) ran on ONE
    core regardless of cluster size.

    Fix, derived from the input's own metadata (guide §2 — make
    partitioning scale-adaptive rather than a constant):

    - row_groups ≥ defaultParallelism → the scan already parallelizes
      (the 100-TB case: thousands of row groups); return unchanged, so
      at scale this is a structural no-op and the scan keeps its
      pushdown/pruning shape.
    - otherwise round-robin repartition to
      ``min(defaultParallelism, rows // rowsPerSlice)`` when that
      beats the file's own parallelism. Catalyst pushes deterministic
      filters and column pruning THROUGH a Repartition node, so
      ``PushedFilters``/``ReadSchema`` still reach the scan; the
      exchange moves only the pruned columns, and row-identical
      results are partitioning-independent by construction everywhere
      in this package (content-addressed sampling, range-partitioned
      id generation, rounded/quantized aggregate surfaces).

    ``spark_graft.scan.rowsPerSlice`` (session conf) overrides the
    slice floor; ``0`` disables the spread.
    """
    try:
        rows_per_slice = int(
            spark.conf.get(
                "spark_graft.scan.rowsPerSlice", str(SPREAD_ROWS_PER_SLICE)
            )
        )
    except ValueError:
        rows_per_slice = SPREAD_ROWS_PER_SLICE
    if rows_per_slice <= 0:
        return df
    layout = parquet_layout(path)
    if layout is None:
        return df
    rows, row_groups = layout
    parallelism = spark.sparkContext.defaultParallelism
    if row_groups >= parallelism:
        return df
    target = min(parallelism, rows // rows_per_slice)
    if target <= row_groups:
        return df
    return df.repartition(target)


def read_table(
    spark: SparkSession, sf_dir: str, name: str, spread: bool = True
) -> DataFrame:
    """S4 — table scan over the driver's parquet layout.

    ``events`` gets its nanosecond epoch normalized to TimestampType
    (see :func:`read_events`). Scans are spread to the session's
    parallelism when the file's row-group layout under-parallelizes
    them (:func:`spread_scan` — a no-op at production layouts).
    ``spread=False`` opts a consumer out: measured A/B (round 18),
    queries whose first real operation is already a key shuffle or a
    reduce gain nothing from the spread and pay its exchange —
    per-branch, since filter pushdown splits otherwise-shared scan
    subtrees — so aggregate-first consumers should pass False.
    """
    if name == "events":
        return read_events(spark, sf_dir, spread=spread)
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.parquet(path)
    return spread_scan(spark, df, path) if spread else df


def read_events(
    spark: SparkSession, sf_dir: str, spread: bool = True
) -> DataFrame:
    """events table with ``ts`` as a proper TimestampType column.

    The driver's generator has shipped ``ts`` in two encodings across
    rounds, so both are normalized here rather than trusting the file:

    - parquet INT64 TIMESTAMP(NANOS), which Spark's reader rejects
      unless ``spark.sql.legacy.parquet.nanosAsLong`` is set (the conf
      is runtime-settable, so it is applied here — the driver builds
      its own SparkSession). The long nanos are truncated to
      microseconds with integer division — ``/ 1000`` through DOUBLE
      would lose precision at 1.7e18 — exactly what DuckDB's
      microsecond TIMESTAMP does, so both engines see identical values.
    - parquet ``timestamp[us]`` without a zone, which Spark reads as
      TimestampNTZType. The NTZ→TimestampType cast interprets the
      wall-clock value in the SESSION time zone, so it is pinned to
      UTC here (runtime-settable, same defensive treatment as
      nanosAsLong — the driver builds its own SparkSession and may
      not run in UTC) before casting; values stay identical to
      DuckDB's naive TIMESTAMP read of the same file.

    Downstream (streaming watermarks, window(), the oracle hash
    compare) always sees one stable type: TimestampType.
    """
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = os.path.join(sf_dir, "events.parquet")
    df = spark.read.parquet(path)
    if spread:
        df = spread_scan(spark, df, path)
    dt = df.schema["ts"].dataType
    if isinstance(dt, T.LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif isinstance(dt, T.TimestampNTZType):
        # Pin UTC only around building the cast — the session zone is
        # bound into the Cast at analysis time (ResolveTimeZone), so
        # the caller's zone can be restored immediately without the
        # plan changing meaning. No lasting session mutation.
        prior = spark.conf.get("spark.sql.session.timeZone", None)
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        try:
            df = df.withColumn("ts", F.col("ts").cast(T.TimestampType()))
        finally:
            if prior and prior != "UTC":
                spark.conf.set("spark.sql.session.timeZone", prior)
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TESTDATA_TABLES
) -> dict[str, DataFrame]:
    """Load several testdata tables as a dict of DataFrames."""
    return {n: read_table(spark, sf_dir, n) for n in names}
