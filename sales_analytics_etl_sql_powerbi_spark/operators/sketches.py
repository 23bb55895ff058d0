"""Mergeable distinct-count sketches (beyond-reference).

The reference's validation queries re-run ``COUNT(DISTINCT …)`` from
scratch on every load (sql/90_validation_checks.sql:17-48) — fine at
60k rows, impossible at 100 TB where a single exact distinct over the
fact history is a full-corpus shuffle. This module is the
warehouse-grade alternative: **HLL sketches as a materialized,
mergeable aggregate** (Apache DataSketches via Spark's built-in
``hll_sketch_agg`` family — JVM-side, codegen, no UDFs).

The operational shape at scale:

1. each incremental load appends ONE fine-grain sketch row per group
   (:func:`distinct_sketch_table`) — touches only the new partition;
2. any coarser grouping (day → month, per-platform → global) is a
   SKETCH UNION (:func:`rollup_estimate`) over the tiny sketch table —
   the raw fact is never re-scanned;
3. any merge order — including replayed loads — estimates within the
   HLL error bound of the truth (unit-pinned with tolerance).

Determinism caveat (measured, important at scale): the union's
ESTIMATE is not bit-stable across merge orders (DataSketches' union
gadget is mode/order-sensitive while sparse and dense sketches mix —
observed 805 vs 784 for a true 800 depending on part order), and
aggregation encounter order itself varies with partitioning on a real
cluster. Treat sketch estimates as interval answers: compare with
tolerance, never with equality/hash gates — which is also why this
module has no `oracle_sql` twin (DuckDB's HLL implementation differs
anyway).

Estimates carry the usual HLL error (~1.6% at the default lgK=12);
``lg_k`` trades memory (2^lgK registers per group) for accuracy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "distinct_sketch_table",
    "rollup_estimate",
    "merge_sketch_tables",
]

_DEFAULT_LG_K = 12


def distinct_sketch_table(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    lg_k: int = _DEFAULT_LG_K,
) -> DataFrame:
    """Per-group HLL sketch of ``key_col`` + exact row count.

    The materialization unit: write this (tiny — one row per group,
    ~2^lg_k bytes per sketch) to parquet per load. One hash shuffle on
    the group keys with map-side partial sketches — the same cost
    shape as any groupBy, but the OUTPUT is mergeable state, not a
    throwaway number.
    """
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(key_col, lg_k).alias("hll_sketch"),
        F.count(F.lit(1)).cast("long").alias("row_count"),
    )


def rollup_estimate(
    sketch_df: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Distinct estimate at any coarser grouping, from sketches alone.

    ``group_cols`` may be any subset of the sketch table's group
    columns (including ``[]`` → one global row): sketches union per
    output group (``hll_union_agg``), then estimate — the raw data is
    never touched. Output: group cols + ``n_distinct_approx`` +
    ``row_count`` (exact, summed).
    """
    grouped = (
        sketch_df.groupBy(*group_cols) if group_cols else sketch_df.groupBy()
    )
    return grouped.agg(
        F.hll_sketch_estimate(F.hll_union_agg("hll_sketch"))
        .cast("long")
        .alias("n_distinct_approx"),
        F.sum("row_count").cast("long").alias("row_count"),
    )


def merge_sketch_tables(
    parts: list[DataFrame], group_cols: list[str]
) -> DataFrame:
    """Union several sketch tables (e.g. one per daily load) into one
    sketch row per group — the compaction step for the incremental
    flow. Safe under replay and any load order IN THE INTERVAL SENSE:
    every order estimates within the HLL error bound of a from-scratch
    build (unit-pinned with tolerance) — but not bit-identically; see
    the module determinism caveat.
    """
    if not parts:
        raise ValueError("merge_sketch_tables needs at least one part")
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return u.groupBy(*group_cols).agg(
        F.hll_union_agg("hll_sketch").alias("hll_sketch"),
        F.sum("row_count").cast("long").alias("row_count"),
    )
