"""Synthesize a larger SF dir by deterministic replication of sf0.1
(round 16 — VERDICT r15 item 3: a full-suite scale sweep at sf1).

The driver's generator is not available, so sf1 is built by 10×
replication of the driver's own sf0.1 with per-replica key shifts —
every FK stays intact WITHIN its replica, so join fan-outs, key
cardinalities, and per-key row counts all scale linearly, which is
what a scaling probe needs. Two tables need more than a key shift so
their PAIRWISE structure scales linearly instead of exploding
quadratically across replicas:

- ``embeddings``: replica r applies a cyclic coordinate ROTATION
  (stride 7·r). A shared permutation preserves norms and all
  in-replica cosines EXACTLY (the planted near-dup pairs replicate),
  while cross-replica cosines between copies of the same gaussian
  vector are ~N(0, 1/8) — far below every gate threshold, so pair
  counts scale ×replicas, not ×replicas².
- ``documents``: replica r suffixes every whitespace token with
  ``~r{r}``. In-replica shingle sets (and therefore MinHash/SimHash/
  Jaccard relations) are preserved 1:1 under the consistent rewrite;
  cross-replica Jaccard is 0.
- ``part``: replica r tags ``p_brand`` (``~r{r}``), so the entity-
  resolution blocking key (brand, name-prefix) stays replica-local
  and block DENSITY stays constant — verbatim replication made
  blocks 10× denser and the within-block pairwise verification 100×
  heavier, which blew entity_match's result past
  spark.driver.maxResultSize on the first sweep attempt. (TPC-H
  proper holds brand cardinality FIXED as SF grows, so rising block
  density is a real high-SF regime — it is probed separately by
  scripts/stress.py --entity-zipf at 10M rows; this fixture scales
  density linearly so the OTHER 39 queries' ratios stay readable.)
  ``p_partkey`` shifts by 100M, clear of the entity entry's +10M
  perturbed-twin offset (verbatim 10M shifts made twin keys collide
  with the next replica's real keys).

region/nation stay 1× (fixed dimensions, as in TPC-H). Everything is
pure SQL over the source parquet — rerunnable, seedless, byte-stable.

Usage: python scripts/make_sf.py [replicas=10] [src=/root/testdata/sf0.1]
Writes to <repo>/.fixtures/sf{replicas*src_sf}/ (gitignored).
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: per-replica key shifts — far above any source key range
SHIFTS = {
    "c_custkey": 10_000_000,
    "s_suppkey": 1_000_000,
    "p_partkey": 100_000_000,
    "o_orderkey": 100_000_000,
    "o_custkey": 10_000_000,
    "l_orderkey": 100_000_000,
    "l_partkey": 100_000_000,
    "l_suppkey": 1_000_000,
    "event_id": 100_000_000,
    "user_id": 10_000_000,
    "doc_id": 1_000_000,
    "vec_id": 1_000_000,
}


def _replicated(table: str, cols: list[str], n: int, src: str) -> str:
    exprs = []
    for c in cols:
        if c in SHIFTS:
            exprs.append(f"{c} + r.r * {SHIFTS[c]} AS {c}")
        else:
            exprs.append(c)
    return (
        f"SELECT {', '.join(exprs)} FROM '{src}/{table}.parquet', "
        f"(SELECT unnest(range({n})) AS r) r"
    )


def main() -> None:
    args = sys.argv[1:]
    n = int(args[0]) if args else 10
    src = args[1] if len(args) > 1 else "/root/testdata/sf0.1"
    src_sf = float(os.path.basename(os.path.normpath(src)).removeprefix("sf"))
    out = os.path.join(REPO, ".fixtures", f"sf{src_sf * n:g}")
    os.makedirs(out, exist_ok=True)

    import duckdb

    con = duckdb.connect()

    # Embedding-rotation collision guard (ADVICE r16), BEFORE any table
    # is written: distinct replicas must get distinct cyclic rotations —
    # 7r ≡ 7r' (mod dim) for r != r' would hand two replicas IDENTICAL
    # vectors (cross-replica cosine-1 duplicate pairs), the quadratic
    # blowup the fixture's linear-scaling claim depends on avoiding.
    # Distinctness holds iff n <= dim / gcd(7, dim), checked against the
    # SOURCE table's actual width, not an assumed 64.
    import math

    emb_dim = con.execute(
        f"SELECT len(embedding) FROM '{src}/embeddings.parquet' "
        "WHERE embedding IS NOT NULL LIMIT 1"
    ).fetchone()[0]
    max_replicas = emb_dim // math.gcd(7, emb_dim)
    if n > max_replicas:
        raise SystemExit(
            f"replicas={n} > {max_replicas} distinct stride-7 rotations "
            f"at embedding dim {emb_dim}: replica pairs r, r+{max_replicas} "
            "would carry identical vectors (cross-replica cosine-1 "
            "duplicates) — pick a stride coprime with the width or fewer "
            "replicas"
        )

    def emit(name: str, sql: str) -> None:
        dest = os.path.join(out, f"{name}.parquet")
        # small row groups so Spark's byte-range splits actually land
        # on row-group boundaries: DuckDB's default 122880-row groups
        # left documents/embeddings as ONE group, which pinned every
        # scan-bound query to ONE task however many cores the box has
        # (found by the round-16 sf1 sweep: doc_profile ran 24.5s on
        # 1 of 32 threads). A real lake writes many files/row groups;
        # 8192 rows reproduces that here.
        con.execute(
            f"COPY ({sql}) TO '{dest}' (FORMAT PARQUET, ROW_GROUP_SIZE 8192)"
        )
        rows = con.execute(f"SELECT count(*) FROM '{dest}'").fetchone()[0]
        print(f"{name}: {rows} rows")

    # fixed dims: copy 1×
    for t in ("region", "nation"):
        emit(t, f"SELECT * FROM '{src}/{t}.parquet'")

    emit(
        "customer",
        _replicated(
            "customer",
            ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"],
            n,
            src,
        ),
    )
    emit(
        "supplier",
        _replicated(
            "supplier", ["s_suppkey", "s_name", "s_nationkey", "s_acctbal"], n, src
        ),
    )
    emit(
        "part",
        f"""
        SELECT p_partkey + r.r * {SHIFTS['p_partkey']} AS p_partkey,
               p_name,
               CASE WHEN r.r = 0 THEN p_brand
                    ELSE p_brand || '~r' || r.r END AS p_brand,
               p_type, p_size, p_retailprice
        FROM '{src}/part.parquet', (SELECT unnest(range({n})) AS r) r
        """,
    )
    emit(
        "orders",
        _replicated(
            "orders",
            [
                "o_orderkey",
                "o_custkey",
                "o_orderstatus",
                "o_totalprice",
                "o_orderdate",
                "o_orderpriority",
            ],
            n,
            src,
        ),
    )
    emit(
        "lineitem",
        _replicated(
            "lineitem",
            [
                "l_orderkey",
                "l_partkey",
                "l_suppkey",
                "l_linenumber",
                "l_quantity",
                "l_extendedprice",
                "l_discount",
                "l_tax",
                "l_returnflag",
                "l_linestatus",
                "l_shipdate",
            ],
            n,
            src,
        ),
    )
    emit(
        "events",
        _replicated(
            "events",
            ["event_id", "ts", "user_id", "event_type", "value", "props"],
            n,
            src,
        ),
    )
    # documents: consistent per-replica token rewrite (replica 0 = the
    # original bytes); n_chars recomputed for the rewritten text
    emit(
        "documents",
        f"""
        SELECT doc_id + r.r * {SHIFTS['doc_id']} AS doc_id,
               CASE WHEN r.r = 0 OR text IS NULL THEN text
                    ELSE list_aggregate(
                        list_transform(str_split(text, ' '),
                                       x -> x || '~r' || r.r),
                        'string_agg', ' ')
               END AS text,
               lang, source,
               CASE WHEN text IS NULL THEN n_chars
                    WHEN r.r = 0 THEN n_chars
                    ELSE length(list_aggregate(
                        list_transform(str_split(text, ' '),
                                       x -> x || '~r' || r.r),
                        'string_agg', ' '))
               END AS n_chars
        FROM '{src}/documents.parquet',
             (SELECT unnest(range({n})) AS r) r
        """,
    )
    # embeddings: per-replica cyclic coordinate rotation (stride 7r)
    emit(
        "embeddings",
        f"""
        SELECT vec_id + r.r * {SHIFTS['vec_id']} AS vec_id,
               CASE WHEN embedding IS NULL THEN NULL
                    ELSE list_transform(range(1, len(embedding) + 1),
                        j -> embedding[
                            ((j - 1 + r.r * 7) % len(embedding)) + 1])
               END AS embedding,
               label
        FROM '{src}/embeddings.parquet',
             (SELECT unnest(range({n})) AS r) r
        """,
    )
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
