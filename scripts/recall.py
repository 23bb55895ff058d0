"""Measured ANN recall vs the brute-force baseline.

Recall@k for the LSH path (single- and multi-probe) and the IVF path
against `cosine_topk` ground truth on the real embeddings table —
the number that justifies calling ANN "the scale path": a bucketed
variant that silently returned garbage would still be fast.

Usage: python scripts/recall.py [sf_dir] [n_queries] [topk]
Prints one line per configuration; paste results into PLAN_AUDIT.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def topk_sets(rows) -> dict[int, set[int]]:
    out: dict[int, set[int]] = {}
    for r in rows:
        out.setdefault(r.query_id, set()).add(r.vec_id)
    return out


def recall(want: dict[int, set[int]], got: dict[int, set[int]]) -> float:
    hits = sum(len(want[q] & got.get(q, set())) for q in want)
    total = sum(len(want[q]) for q in want)
    return hits / total


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    n_queries = int(args[1]) if len(args) > 1 else 50
    topk = int(args[2]) if len(args) > 2 else 10

    from sales_analytics_etl_sql_powerbi_spark.operators import similarity
    from sales_analytics_etl_sql_powerbi_spark.session import get_spark
    from sales_analytics_etl_sql_powerbi_spark.sources.readers import read_table

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    emb = read_table(spark, sf_dir, "embeddings")
    n = emb.count()
    n_planes = similarity.auto_n_planes(n)
    print(f"corpus={n} n_queries={n_queries} topk={topk} n_planes={n_planes}")

    t0 = time.perf_counter()
    want = topk_sets(
        similarity.cosine_topk(emb, n_queries=n_queries, topk=topk).collect()
    )
    print(f"brute: {time.perf_counter() - t0:.2f}s (ground truth)")

    for probes in (1, 2, 4, min(8, n_planes + 1)):
        t0 = time.perf_counter()
        got = topk_sets(
            similarity.ann_lsh_topk(
                emb, n_queries=n_queries, topk=topk, n_planes=n_planes, n_probes=probes
            ).collect()
        )
        print(
            f"lsh probes={probes}: recall@{topk}={recall(want, got):.3f} "
            f"({time.perf_counter() - t0:.2f}s)"
        )

    for n_clusters, nprobe in ((16, 1), (16, 2), (16, 4)):
        t0 = time.perf_counter()
        got = topk_sets(
            similarity.ann_ivf_topk(
                emb,
                n_queries=n_queries,
                topk=topk,
                n_clusters=n_clusters,
                nprobe=nprobe,
            ).collect()
        )
        print(
            f"ivf k={n_clusters} nprobe={nprobe}: "
            f"recall@{topk}={recall(want, got):.3f} "
            f"({time.perf_counter() - t0:.2f}s)"
        )


if __name__ == "__main__":
    main()
