"""Surrogate keys — SURVEY §2.2 P9 / §2.10 U1.

The reference's only custom row function is ``stable_customer_id``:
``int(md5('|'.join(parts)).hexdigest()[:16], 16) & (2**63 - 1)``
(reference etl/order_info_etl.py:56-65). It is reproduced here THREE
ways, all bit-exact with each other (parity test: tests/test_keys.py):

1. :func:`stable_id_expr` — native Catalyst expression (the production
   path: whole-stage codegen, no Python in the executors);
2. :func:`stable_id_sql` — the same computation as portable SQL text
   (valid in Spark SQL and DuckDB) for the correctness oracle;
3. :func:`stable_id_pandas_udf` — an Arrow-vectorized pandas_udf that is
   a literal transcription of the reference function, kept as the
   parity witness.

IDENTITY(1,1) surrogate ids (dim_platform/dim_product/fact — reference
sql/schema/dim_platform.Table.sql:27) are replaced by a deterministic
dense ``row_number() OVER (ORDER BY business_key)`` — NOT
``monotonically_increasing_id`` which changes across runs/partitionings.
"""

from __future__ import annotations

import decimal
import hashlib

from pyspark.sql import Column, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

_MASK_63 = 2**63  # value & (2**63-1)  ==  value mod 2**63


def _mask_63_lit() -> Column:
    # 2**63 does not fit a Java long, so the literal must enter the plan
    # as a decimal — F.lit(int(2**63)) raises NumberFormatException in py4j.
    return F.lit(decimal.Decimal(_MASK_63))


def _concat_key(cols: list[Column | str], sep: str = "|") -> Column:
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    # The reference builds the key with f"{name}|{addr}|{postal}"
    # (etl/order_info_etl.py:60) on pandas values, where a missing value
    # stringifies to 'None'/'nan' — an accident of pandas, not a design
    # choice. We deliberately normalize NULL -> '' instead (documented
    # divergence; identical results on rows where all parts are present).
    cs = [F.coalesce(c.cast("string"), F.lit("")) for c in cs]
    return F.concat_ws(sep, *cs)


def stable_id_expr(cols: list[Column | str], sep: str = "|") -> Column:
    """63-bit md5 surrogate key as a native Catalyst expression.

    conv(hex,16,10) yields an unsigned decimal string (up to 2**64-1);
    cast to decimal(20,0) then pmod by 2**63 == masking the sign bit.
    """
    hex16 = F.substring(F.md5(_concat_key(cols, sep)), 1, 16)
    unsigned = F.conv(hex16, 16, 10).cast(T.DecimalType(20, 0))
    return F.pmod(unsigned, _mask_63_lit()).cast(T.LongType())


def stable_id_sql(col_exprs: list[str], sep: str = "|", dialect: str = "duckdb") -> str:
    """Same key as portable SQL text (for the DuckDB oracle)."""
    str_type = "varchar" if dialect == "duckdb" else "string"
    parts = ", ".join(f"coalesce(cast({e} as {str_type}), '')" for e in col_exprs)
    concat = f"concat_ws('{sep}', {parts})"
    if dialect == "duckdb":
        return (
            f"(('0x' || substring(md5({concat}), 1, 16))::UBIGINT "
            f"% {_MASK_63}::UBIGINT)::BIGINT"
        )
    # spark sql dialect
    return (
        f"cast(pmod(cast(conv(substring(md5({concat}), 1, 16), 16, 10) "
        f"as decimal(20,0)), {_MASK_63}) as bigint)"
    )


def stable_id_pandas_udf() -> Column:
    """Literal transcription of the reference function, Arrow-vectorized.

    Kept as the parity witness for stable_id_expr (see tests); the
    native expression is the production path.
    """
    def _stable_id(key):  # pd.Series -> pd.Series
        def one(s: str | None) -> int:
            s = s if s is not None else ""
            return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:16], 16) & (
                2**63 - 1
            )

        return key.map(one)

    return F.pandas_udf(_stable_id, T.LongType())


def dense_surrogate_id(order_by: list[Column | str]) -> Column:
    """Deterministic IDENTITY(1,1) replacement.

    A single-partition window is fine because it is only ever applied to
    DIMENSION tables (platforms, products, dates — thousands to millions
    of rows), never the fact. For a billion-row dimension, switch to
    zipWithIndex-style: row_number within sorted range partitions +
    cumulative partition offsets.
    """
    return F.row_number().over(Window.orderBy(*order_by)).cast(T.IntegerType())
