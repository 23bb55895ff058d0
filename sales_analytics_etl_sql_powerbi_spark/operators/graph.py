"""Iterative graph algorithms on DataFrames (beyond-reference).

PageRank over an edge table — the canonical iterative workload a
relational engine must still handle (document-graph quality weighting
is a standard pre-training signal; the same loop shape serves label
propagation, which :func:`..dedup.neardup_clusters` already uses for
connected components).

The Spark-first iterative pattern, made explicit here:

- each iteration is ONE key equi-join (ranks → out-edges) + ONE
  key aggregate (mass per destination) — no RDDs, no Pregel API;
- per-iteration driver sync points (dangling mass, convergence delta)
  are INHERENT to synchronous iteration, not an anti-pattern — they
  are single-row aggregates, never data-sized collects;
- lineage is truncated with ``localCheckpoint`` every
  ``checkpoint_every`` iterations — without it the plan doubles per
  iteration and the optimizer chokes long before the data does (the
  classic iterative-DataFrame failure mode).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank"]


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    max_iter: int = 20,
    tol: float = 1e-6,
    checkpoint_every: int = 4,
) -> DataFrame:
    """PageRank over ``edges`` (columns ``src``, ``dst``).

    Standard formulation: uniform init 1/N; per iteration each node
    splits its rank over its out-edges; dangling-node mass (nodes with
    no out-edges) is redistributed uniformly; teleport factor
    ``1 − damping``. Ranks sum to 1 every iteration (mass-conserving —
    unit-pinned). Stops early when the L1 delta drops below ``tol``.

    Returns (node, rank). Deterministic: no sampling, no
    partition-order dependence (all math rides key aggregates).

    Scale shape per iteration: one join of the rank vector (node-sized)
    against the out-edge list on ``src``, one groupBy(``dst``) — both
    key-partitioned shuffles AQE can plan; plus two one-row aggregates
    (dangling mass, delta). Edge/degree frames are computed once and
    persisted; rank frames are checkpointed every ``checkpoint_every``
    iterations to keep the plan flat.
    """
    from pyspark.storagelevel import StorageLevel

    e = edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n = nodes.count()
    if n == 0:
        empty = nodes.withColumn("rank", F.lit(0.0)).localCheckpoint(eager=True)
        nodes.unpersist()  # the early return must not leak the cache entry
        return empty
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("__deg"))
    links = e.join(out_deg, "src").persist(StorageLevel.MEMORY_AND_DISK)
    links.count()
    has_out = out_deg.select(F.col("src").alias("node"))

    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank")).localCheckpoint(
        eager=True
    )
    teleport = (1.0 - damping) / n
    # dangling mass (rank held by nodes with no out-edges) for the
    # FIRST iteration; later iterations get it fused into the delta
    # aggregate — one driver sync per iteration, not two
    dangling = (
        ranks.join(has_out, "node", "left_anti")
        .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
        .collect()[0][0]
    )
    for it in range(max_iter):
        contribs = (
            links.join(ranks, links["src"] == ranks["node"])
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("__deg")).alias("__c"),
            )
            .groupBy("node")
            .agg(F.sum("__c").alias("__in"))
        )
        new_ranks = nodes.join(contribs, "node", "left").select(
            "node",
            (
                F.lit(teleport)
                + F.lit(damping)
                * (F.coalesce(F.col("__in"), F.lit(0.0)) + F.lit(dangling / n))
            ).alias("rank"),
        )
        # EVERY iteration is persisted (the delta collect materializes
        # it into cache; without this, each driver sync recomputes all
        # iterations since the last checkpoint — measured 7.6s/iter →
        # 1.9s/iter at 2M edges); the periodic checkpoint additionally
        # truncates lineage so the PLAN stays flat
        if (it + 1) % checkpoint_every == 0 or it == max_iter - 1:
            new_ranks = new_ranks.localCheckpoint(eager=True)
        else:
            new_ranks = new_ranks.persist(StorageLevel.MEMORY_AND_DISK)
        # ONE driver sync: L1 delta + the NEXT iteration's dangling
        # mass in the same aggregate (materializes new_ranks into the
        # cache as a side effect)
        delta, dangling = (
            new_ranks.alias("a")
            .join(ranks.alias("b"), "node")
            .join(
                has_out.withColumn("__has", F.lit(True)), "node", "left"
            )
            .agg(
                F.sum(F.abs(F.col("a.rank") - F.col("b.rank"))),
                F.coalesce(
                    F.sum(F.when(F.col("__has").isNull(), F.col("a.rank"))),
                    F.lit(0.0),
                ),
            )
            .collect()[0]
        )
        ranks.unpersist()
        ranks = new_ranks
        if delta < tol:
            break
    nodes.unpersist()
    links.unpersist()
    return ranks
