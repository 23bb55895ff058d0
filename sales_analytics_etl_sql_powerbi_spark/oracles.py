"""DuckDB SQL twins of the pipeline — the correctness oracle side.

Every derivation in :mod:`.pipeline` has its exact ANSI-SQL equivalent
here, runnable by DuckDB over the same parquet tables (the driver
pre-registers ``region nation customer supplier part orders lineitem
events documents embeddings`` as views). The driver compares Spark vs
DuckDB per query: row-count + schema + order-insensitive value hash.

Parity rules baked in (learned the hard way, keep them):

- column aliases must match the Spark side exactly;
- never cast float→int directly (Spark truncates, DuckDB rounds):
  always ``floor()`` first — both sides do;
- integer sums stay integral (exact in both engines); ratios are
  computed double/double from exact integer sums (bit-identical);
- decimals are cast explicitly to the same precision/scale;
- DuckDB ``sum(BIGINT)`` returns HUGEINT (int128) — cast back to
  BIGINT before integer division, ``generate_series``, or any
  function overloaded only for BIGINT (bit the packing twin's
  window cumsum, round 10).
"""

from __future__ import annotations

from .functions.dates import DATE_PART_SQL
from .functions.keys import stable_id_sql
from .operators.rules import (
    TESTDATA_CATEGORY_PASSES,
    TESTDATA_SUBCATEGORY_PASSES,
    passes_to_sql,
)

# --------------------------------------------------------------------------
# staging (pipeline.staging_orders twin)
# --------------------------------------------------------------------------

_STABLE_ID = stable_id_sql(["customer_name", "address", "postal_code"])

STAGING_SQL = """
SELECT
  order_id, line_number, platform_name, submit_ts, ship_ts,
  units_raw,
  coalesce(try_cast(trunc(try_cast(units_raw AS DOUBLE)) AS INT), 1) AS units,
  master_sku, alt_sku,
  coalesce(nullif(trim(master_sku, ' '), ''), nullif(trim(alt_sku, ' '), '')) AS product_key,
  raw_state,
  CASE WHEN regexp_matches(upper(trim(raw_state, ' ')), '^[A-Z]{{2}}$')
       THEN upper(trim(raw_state, ' ')) END AS state_code,
  customer_name, address, postal_code,
  {stable_id} AS customer_id,
  volume_raw,
  cast(nullif(regexp_extract(volume_raw, '([0-9]+(?:\\.[0-9]+)?)', 1), '') AS DOUBLE) AS volume_num,
  cast('0.00' AS DECIMAL(18,2)) AS revenue
FROM (
  SELECT
    l.l_orderkey AS order_id,
    l.l_linenumber AS line_number,
    o.o_orderpriority AS platform_name,
    o.o_orderdate AS submit_ts,
    l.l_shipdate AS ship_ts,
    CASE WHEN l.l_linenumber % 37 = 0 THEN 'x'
         ELSE cast(cast(floor(l.l_quantity) AS INT) AS VARCHAR) END AS units_raw,
    CASE WHEN l.l_partkey % 7 = 0 THEN NULL
         WHEN l.l_partkey % 11 = 0 THEN '  '
         ELSE 'SKU-' || cast(l.l_partkey AS VARCHAR) END AS master_sku,
    'ALT-' || cast(l.l_partkey AS VARCHAR) AS alt_sku,
    CASE WHEN n.n_nationkey % 13 = 5 THEN 'XYZ'
         WHEN n.n_nationkey % 11 = 7
           THEN ' ' || lower(chr(65 + n.n_nationkey % 26) || chr(65 + (n.n_nationkey * 7) % 26)) || ' '
         ELSE chr(65 + n.n_nationkey % 26) || chr(65 + (n.n_nationkey * 7) % 26) END AS raw_state,
    c.c_name AS customer_name,
    'ADDR-' || cast(c.c_custkey AS VARCHAR) AS address,
    lpad(cast(c.c_custkey % 100000 AS VARCHAR), 5, '0') AS postal_code,
    cast(cast(floor(l.l_quantity) AS INT) AS VARCHAR) || '.5ft³' AS volume_raw
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
) raw
""".format(stable_id=_STABLE_ID)

# --------------------------------------------------------------------------
# dims
# --------------------------------------------------------------------------

DIM_PLATFORM_SQL = """
SELECT cast(row_number() OVER (ORDER BY platform_name) AS INT) AS platform_id,
       platform_name
FROM (SELECT DISTINCT platform_name FROM staging
      WHERE platform_name IS NOT NULL AND platform_name <> '') t
"""

_PRODUCT_BASE_SQL = """
SELECT
  CASE WHEN p_partkey % 7 = 0 OR p_partkey % 11 = 0
       THEN 'ALT-' || cast(p_partkey AS VARCHAR)
       ELSE 'SKU-' || cast(p_partkey AS VARCHAR) END AS product_key,
  p_name AS english_name,
  p_name,
  p_type,
  p_brand,
  p_size
FROM part
"""

_PRODUCT_RULES_SQL = passes_to_sql(
    _PRODUCT_BASE_SQL,
    TESTDATA_CATEGORY_PASSES + TESTDATA_SUBCATEGORY_PASSES,
    base_columns=["product_key", "english_name", "p_name", "p_type", "p_brand", "p_size"],
)

DIM_PRODUCT_SQL = f"""
SELECT cast(row_number() OVER (ORDER BY product_key) AS INT) AS product_id,
       product_key, english_name, p_type, p_brand, p_size, category, subcategory
FROM ({_PRODUCT_RULES_SQL}) rules_applied
"""

DIM_CUSTOMER_SQL = """
SELECT DISTINCT customer_id, customer_name, address, postal_code, state_code
FROM staging WHERE customer_id IS NOT NULL
"""

_DATE_PARTS = ",\n  ".join(
    DATE_PART_SQL[k].format(d="date_id") + f" AS {k}"
    for k in [
        "year",
        "quarter",
        "month",
        "month_name",
        "day",
        "day_of_week",
        "is_weekend",
        "day_name",
    ]
)

DIM_DATE_SQL = f"""
SELECT date_id,
  {_DATE_PARTS}
FROM (
  SELECT cast(unnest(generate_series(cast(lo AS DATE), cast(hi AS DATE), INTERVAL 1 DAY)) AS DATE) AS date_id
  FROM (SELECT min(submit_ts) AS lo, max(submit_ts) AS hi FROM staging) bounds
) days
"""

# inner joins ≡ reference's left-join + FK-not-null filter
# (reference etl/order_info_etl.py:479-488)
FACT_SQL = """
SELECT cast(s.submit_ts AS DATE) AS date_id,
       dp.platform_id, dpr.product_id, s.customer_id, s.order_id,
       s.state_code, coalesce(s.units, 1) AS units, s.revenue
FROM staging s
JOIN dim_platform dp ON s.platform_name = dp.platform_name
JOIN dim_product dpr ON s.product_key = dpr.product_key
WHERE s.submit_ts IS NOT NULL AND s.product_key IS NOT NULL
"""

VIEW_SQL = """
SELECT f.date_id, d.year, d.month, d.month_name, d.day_of_week, d.day_name,
       d.is_weekend,
       p.product_key, p.english_name, p.category, p.subcategory,
       pl.platform_name, f.state_code, f.order_id, f.units, f.revenue
FROM fact f
JOIN dim_date d ON f.date_id = d.date_id
JOIN dim_product p ON f.product_id = p.product_id
JOIN dim_platform pl ON f.platform_id = pl.platform_id
"""


def csv_roundtrip_sql(csv_path: str) -> str:
    """Twin of ``read_input`` + :func:`..pipeline.clean_order_export`.

    ``read_csv(all_varchar=true)`` mirrors the all-string Spark CSV
    scan; headers are referenced as DuckDB reports them (its reader
    trims header whitespace, so ' Line-Number ' reads as "Line-Number";
    name normalization is a rename, invisible to the value hash). The
    whitespace pre-strip uses the 'g' flag — Spark's regexp_replace
    replaces all matches.
    """
    # Spark-side ids are try_cast (round 16 — poison ids degrade to
    # NULL instead of killing the scan); the twin mirrors Spark's
    # string→int acceptance exactly, NOT DuckDB's (whose bare
    # try_cast ROUNDS decimal strings and whose trim() strips NBSP —
    # the r15 events_json lessons): strip [\\x00-\\x20], then require
    # an integral literal before casting.
    def _int_guard(col: str) -> str:
        t = (
            f"regexp_replace({col}, "
            "'^[\\x00-\\x20]+|[\\x00-\\x20]+$', '', 'g')"
        )
        return (
            f"try_cast(CASE WHEN regexp_matches({t}, "
            f"'^[+-]?[0-9]+$') THEN {t} END AS INT)"
        )

    return f"""
SELECT {_int_guard('"Order ID"')} AS order_id,
       {_int_guard('"Line-Number"')} AS line_number,
       coalesce(try_strptime(__ts, '%Y-%m-%d %H:%M:%S'),
                try_cast(__ts AS TIMESTAMP)) AS submit_ts,
       coalesce(try_cast(trunc(try_cast("Units" AS DOUBLE)) AS INT), 1) AS units,
       coalesce(nullif(trim("mainSkuCode", ' '), ''), nullif(trim("Second SKU", ' '), '')) AS product_key,
       CASE WHEN regexp_matches(upper(trim("State", ' ')), '^[A-Z]{{2}}$')
            THEN upper(trim("State", ' ')) END AS state_code,
       substring("Notes", 1, 30) AS notes,
       cast(NULL AS VARCHAR) AS discount_code
FROM (
  SELECT *, nullif(regexp_replace("Submit Time",
                                  '^[\\t\\r\\n ]+|[\\t\\r\\n ]+$', '', 'g'),
                   '') AS __ts
  FROM read_csv('{csv_path}/*.csv', all_varchar=true, header=true)
) r
"""


def with_star(final_select: str, needs: tuple[str, ...] = ()) -> str:
    """Compose a full oracle query: star CTEs + the final SELECT.

    ``needs`` lists the CTE names the final select references; the
    transitive prerequisites are added automatically in build order.
    """
    deps: dict[str, tuple[str, tuple[str, ...]]] = {
        "staging": (STAGING_SQL, ()),
        "dim_platform": (DIM_PLATFORM_SQL, ("staging",)),
        "dim_product": (DIM_PRODUCT_SQL, ()),
        "dim_customer": (DIM_CUSTOMER_SQL, ("staging",)),
        "dim_date": (DIM_DATE_SQL, ("staging",)),
        "fact": (FACT_SQL, ("staging", "dim_platform", "dim_product")),
        "vw": (VIEW_SQL, ("fact", "dim_date", "dim_product", "dim_platform")),
    }
    order = ["staging", "dim_platform", "dim_product", "dim_customer", "dim_date", "fact", "vw"]
    wanted: set[str] = set()

    def add(n: str) -> None:
        if n in wanted:
            return
        wanted.add(n)
        for d in deps[n][1]:
            add(d)

    for n in needs:
        add(n)
    ctes = [f"{n} AS ({deps[n][0]})" for n in order if n in wanted]
    if not ctes:
        return final_select
    return "WITH " + ",\n".join(ctes) + "\n" + final_select
