"""Deterministic CSV export fixture for the ingest roundtrip oracle.

The reference's front door is a raw CSV order export read with
``pd.read_csv(dtype=str, encoding='utf-8-sig')`` (reference
etl/order_info_etl.py:176). The driver testdata is parquet, so to put
the CSV scan path (S1/S3) under the driver's hash gate we materialize a
deterministic CSV export derived from the same parquet — messy headers
(padding, spaces, hyphens) and deterministic value dirt so the cleaning
stack (P1/P4/P7/P10/P11) does real work — then both engines ingest it:
Spark via ``read_input`` → ``read_csv_all_string``, DuckDB via
``read_csv(..., all_varchar=true)``.

The export is written by DuckDB from the parquet (no Spark involved),
so the fixture bytes are identical whichever side triggers creation.
NULL round-trips as an empty unquoted field in both engines; quoted
empty stays an empty string — the one CSV convention both agree on.
"""

from __future__ import annotations

import os

#: bump when the export query changes — stale fixtures regenerate
_VERSION = "v4"
#: export as a DIRECTORY of N part files: the realistic shape of a
#: large export (daily/regional drops), and what makes the Spark scan
#: split across tasks — a single 60 MB csv is one task under the
#: default maxPartitionBytes; 32 files parse as wide as the bench's
#: local[32] session.
_N_PARTS = 32

#: the export derivation (single source of truth for both engines).
#: Dirt, all deterministic: tab/space-padded + unparseable timestamps
#: (P4), 'x' and decimal-formatted units (P7), NULL + blank master SKU
#: (P10), lowercase/padded/invalid states (P6), over-width notes (P11).
_EXPORT_SQL = """
SELECT
  cast(l.l_orderkey AS VARCHAR) AS "Order ID",
  cast(l.l_linenumber AS VARCHAR) AS " Line-Number ",
  CASE WHEN l.l_linenumber % 29 = 3 THEN 'not-a-date'
       WHEN l.l_linenumber % 23 = 2
         THEN chr(9) || cast(o.o_orderdate AS VARCHAR) || ' 00:00:00 '
       ELSE cast(o.o_orderdate AS VARCHAR) || ' 00:00:00' END AS "Submit Time",
  CASE WHEN l.l_linenumber % 37 = 0 THEN 'x'
       WHEN l.l_linenumber % 17 = 4
         THEN cast(cast(floor(l.l_quantity) AS INT) AS VARCHAR) || '.0'
       ELSE cast(cast(floor(l.l_quantity) AS INT) AS VARCHAR) END AS "Units",
  CASE WHEN l.l_partkey % 7 = 0 THEN NULL
       WHEN l.l_partkey % 11 = 0 THEN '  '
       ELSE 'SKU-' || cast(l.l_partkey AS VARCHAR) END AS "mainSkuCode",
  'ALT-' || cast(l.l_partkey AS VARCHAR) AS "Second SKU",
  CASE WHEN l.l_suppkey % 13 = 5 THEN 'XYZ'
       WHEN l.l_suppkey % 11 = 7
         THEN ' ' || lower(chr(cast(65 + l.l_suppkey % 26 AS INT)) || chr(cast(65 + (l.l_suppkey * 3) % 26 AS INT))) || ' '
       ELSE chr(cast(65 + l.l_suppkey % 26 AS INT)) || chr(cast(65 + (l.l_suppkey * 3) % 26 AS INT)) END AS "State",
  'Long running note for order ' || cast(l.l_orderkey AS VARCHAR)
    || ' line ' || cast(l.l_linenumber AS VARCHAR) AS "Notes"
FROM '{sf}/lineitem.parquet' l
JOIN '{sf}/orders.parquet' o ON l.l_orderkey = o.o_orderkey
ORDER BY l.l_orderkey, l.l_linenumber
"""


def _fixture_root() -> str:
    # repo root = parent of the package directory; .fixtures/ is gitignored
    pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return os.path.join(os.path.dirname(pkg), ".fixtures")


def ensure_order_export_csv(sf_dir: str) -> str:
    """Materialize the CSV export directory for ``sf_dir``; returns its path.

    The export is a directory of ``_N_PARTS`` csv files bucketed by
    order key (deterministic file contents) — Spark reads the directory
    as one distributed scan, DuckDB reads ``<dir>/*.csv``. Idempotent:
    skipped when the versioned directory already exists, so the Spark
    query entry and the DuckDB oracle can both call it in any order and
    read identical bytes; creation is write-to-temp + atomic rename.
    """
    import shutil

    import duckdb

    sf_name = os.path.basename(os.path.normpath(sf_dir))
    out_dir = os.path.join(_fixture_root(), "csv_roundtrip", sf_name)
    path = os.path.join(out_dir, f"order_export_{_VERSION}.csv")
    if os.path.isdir(path) and os.listdir(path):
        return path
    os.makedirs(out_dir, exist_ok=True)
    tmp = path + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    con = duckdb.connect()
    try:
        base = _EXPORT_SQL.format(sf=sf_dir)
        for i in range(_N_PARTS):
            part_sql = f"SELECT * FROM ({base}) e WHERE \"Order ID\"::BIGINT % {_N_PARTS} = {i}"
            con.execute(
                f"COPY ({part_sql}) TO '{tmp}/part-{i}.csv' (HEADER, DELIMITER ',')"
            )
        os.replace(tmp, path)  # atomic: readers never see a partial dir
    finally:
        con.close()
    return path
