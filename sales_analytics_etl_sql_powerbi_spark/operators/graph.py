"""Iterative graph algorithms on DataFrames (beyond-reference).

PageRank over an edge table — the canonical iterative workload a
relational engine must still handle (document-graph quality weighting
is a standard pre-training signal; the same loop shape serves label
propagation, which :func:`..dedup.neardup_clusters` already uses for
connected components).

The Spark-first iterative pattern, made explicit here:

- each iteration is ONE key equi-join (ranks → out-edges) + ONE
  key aggregate (mass per destination) — no RDDs, no Pregel API;
- the dangling mass rides the DATAFLOW as a one-row aggregate
  broadcast-crossJoined into the next update, so fixed-iteration runs
  have ZERO driver round-trips between checkpoints; only the
  EARLY-STOP decision (tol > 0) inherently needs a per-iteration
  driver sync, and that one is a single fused one-row collect;
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
    ``tol <= 0`` selects FIXED-iteration mode (the driver-gate shape):
    early stopping is off and the dangling mass is carried INSIDE the
    dataflow (one-row aggregate, broadcast crossJoin into the next
    update), so the loop performs ZERO driver round-trips between
    checkpoints — the only jobs are the eager ``localCheckpoint``s
    every ``checkpoint_every`` iterations (collect-count pinned at 0
    in tests).

    Scale shape per iteration: one join of the rank vector (node-sized)
    against the out-edge list on ``src``, one groupBy(``dst``) — both
    key-partitioned shuffles AQE can plan; plus one one-row dangling
    aggregate (and, converging mode only, the fused delta collect).
    Edge/degree frames are computed once and persisted; rank frames
    are checkpointed every ``checkpoint_every`` iterations to keep the
    plan flat.
    """
    from pyspark.storagelevel import StorageLevel

    e = edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
    # ONE pinned partitioning for the whole loop (round 19 — guide
    # §2.4 "two operations keyed the same way can share one exchange"):
    # nodes, links, the per-iteration contribution aggregate, and every
    # rank frame (checkpoints preserve their physical partitioning) all
    # carry hash(join-key, p_n) with an EXPLICIT partition count — AQE
    # coalescing is exempted on explicit repartitions, so the counts
    # can never drift apart across iterations. Effect per iteration:
    # the links⋈ranks join and the nodes⋈contribs join both see
    # co-partitioned children and plan ZERO exchanges; the only
    # data movement left is the groupBy(dst) shuffle (the algorithm's
    # real movement) plus one node-sized repartition of the AGGREGATED
    # contributions (pinning their count back to p_n). Before: every
    # iteration re-shuffled the rank frame for the links join and
    # re-aligned the aggregate for the nodes join — rank-sized
    # exchanges at any scale, plus one AQE job per exchange locally.
    spark = edges.sparkSession
    nodes_raw = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n = nodes_raw.count()
    if n == 0:
        empty = nodes_raw.withColumn("rank", F.lit(0.0)).localCheckpoint(
            eager=True
        )
        nodes_raw.unpersist()  # the early return must not leak the cache
        return empty
    # loop partition count, derived from the graph's own size (guide
    # §2 — scale-adaptive, not a constant): enough partitions that each
    # holds ~rowsPerPartition nodes, capped at the session parallelism.
    # At sf0.1 (1.2k nodes) that is ONE partition — every per-iteration
    # exchange moves one buffer instead of launching 32 near-empty
    # tasks; at a billion-node graph the cap makes it defaultParallelism
    # exactly as before. Conf-overridable; 0 pins the old
    # parallelism-sized behavior. LIMITATION: the count sizes the loop
    # by NODES; a dense graph (edges ≫ nodes, e.g. a near-clique over
    # few vertices) computes edge-sized contribution maps at this
    # node-sized parallelism — set the conf to 0 (or a small
    # rowsPerPartition) for that shape.
    try:
        rows_per = int(
            spark.conf.get("spark_graft.graph.rowsPerPartition", "65536")
        )
    except ValueError:
        rows_per = 65536
    par = max(spark.sparkContext.defaultParallelism, 2)
    p_n = par if rows_per <= 0 else max(1, min(par, n // rows_per + 1))
    # the pinned node frame reads the already-cached distinct (one
    # node-sized exchange, no recompute)
    nodes = nodes_raw.repartition(p_n, "node").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("__deg"))
    # lazy persist (round 19): the eager count() here bought nothing —
    # the first consumer (the first checkpoint in fixed mode, the first
    # delta collect in converging mode) fills the cache with the same
    # single-computation guarantee, minus one construction-time job
    links = (
        e.join(out_deg, "src")
        .repartition(p_n, "src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    has_out = out_deg.select(F.col("src").alias("node"))

    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank")).localCheckpoint(
        eager=True
    )
    teleport = (1.0 - damping) / n

    def contribs_of(r: DataFrame) -> DataFrame:
        return (
            links.join(r, links["src"] == r["node"])
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("__deg")).alias("__c"),
            )
            .groupBy("node")
            .agg(F.sum("__c").alias("__in"))
            # node-sized pin: the aggregate's own exchange lands on the
            # AQE-coalesced count; this puts the (already reduced)
            # per-destination masses back on the loop's partitioning so
            # the nodes join and the next iteration's links join stay
            # exchange-free
            .repartition(p_n, "node")
        )

    def dangling_frame(r: DataFrame) -> DataFrame:
        # ONE-ROW aggregate: the rank mass held by nodes with no
        # out-edges (stays a DataFrame in fixed mode — never collected)
        return r.join(has_out, "node", "left_anti").agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dm")
        )

    if tol <= 0:
        # FIXED-ITERATION mode (VERDICT r7 item 3): ZERO driver
        # round-trips between checkpoints. The dangling mass rides the
        # DATAFLOW — a one-row aggregate broadcast-crossJoined into the
        # update — so the loop only builds a lazy plan; the sole
        # jobs are the eager localCheckpoints every ``checkpoint_every``
        # iterations (which also gate the deferred unpersists: dropping
        # an intermediate cache before the checkpoint materializes
        # would force recomputation back to the previous checkpoint).
        #
        # Round 18: the dangling mass is derived from the SAME
        # contribution aggregate the update already needs, via mass
        # conservation — ranks sum to 1 every iteration and
        # Σ __in = the mass held by nodes WITH out-edges (each source
        # contributes exactly deg · rank/deg), so dangling = 1 − Σ __in.
        # That removes the per-iteration anti-join + rank-frame pass
        # the old dangling aggregate cost (one shuffle fewer per
        # round at any scale); the float drift vs the anti-join sum is
        # ~1e-15 absolute, five orders below the 1e-12 gate quantum.
        # The contribs frame has two consumers (the one-row dangling
        # aggregate and the update join), so IT carries the lazy
        # persist the rank intermediates used to need. Measured
        # (round 19): WITHOUT the persist AQE's exchange reuse does
        # NOT dedupe the two references, the contribs subtree embeds
        # twice per iteration and the plan doubles per round —
        # 149 jobs / 14.7s vs 58 / 4.4s at sf0.1. The persist is
        # load-bearing, not belt-and-braces.
        # AQE is scoped OFF for the loop's actions (round 19): with
        # the partitioning pinned explicitly above, AQE has nothing
        # left to re-plan here — no coalescible exchange, no join it
        # may rewrite, no agg skew handling (it only splits joins) —
        # while its per-query-stage materialization turns every
        # checkpoint action into one JOB PER EXCHANGE: measured 58
        # driver-scheduled jobs for 6 iterations at sf0.1, each paying
        # a scheduling round-trip. Non-adaptive execution runs each
        # checkpoint as ONE job (measured 58 → 27 jobs). With AQE's
        # coalescing gone, shuffle.partitions is scoped to the SAME
        # p_n the explicit repartitions use, so the groupBy exchange
        # lands on the loop's partitioning directly (the post-agg
        # repartition collapses into it) instead of spraying a
        # node-sized reduce over 32 near-empty tasks. Both settings
        # are restored in `finally`; the returned frame is a
        # checkpointed RDD scan, so consumer actions re-plan nothing
        # under the restored settings. CAVEAT: session confs are
        # session-GLOBAL — a driver submitting unrelated queries from
        # other threads while this loop runs would plan them under the
        # scoped values; run fixed-mode pagerank from the thread that
        # owns the session (every in-repo caller does).
        prior_aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
        prior_sp = spark.conf.get("spark.sql.shuffle.partitions", "200")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.shuffle.partitions", str(p_n))
        try:
            pending: list[DataFrame] = []
            for it in range(max_iter):
                contribs = contribs_of(ranks).persist(
                    StorageLevel.MEMORY_AND_DISK
                )
                pending.append(contribs)
                dm = contribs.agg(
                    (
                        F.lit(1.0) - F.coalesce(F.sum("__in"), F.lit(0.0))
                    ).alias("__dm")
                )
                new_ranks = (
                    nodes.join(contribs, "node", "left")
                    .crossJoin(F.broadcast(dm))
                    .select(
                        "node",
                        (
                            F.lit(teleport)
                            + F.lit(damping)
                            * (
                                F.coalesce(F.col("__in"), F.lit(0.0))
                                + F.col("__dm") / F.lit(float(n))
                            )
                        ).alias("rank"),
                    )
                )
                if (it + 1) % checkpoint_every == 0 or it == max_iter - 1:
                    new_ranks = new_ranks.localCheckpoint(eager=True)
                    for p in pending:
                        p.unpersist()
                    pending = []
                ranks = new_ranks
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", prior_aqe)
            spark.conf.set("spark.sql.shuffle.partitions", prior_sp)
        nodes_raw.unpersist()
        nodes.unpersist()
        links.unpersist()
        return ranks

    # CONVERGING mode: the early-stop decision is inherently a driver
    # sync, so each iteration collects ONE fused one-row aggregate
    # (L1 delta + the next iteration's dangling mass together)
    dangling = dangling_frame(ranks).collect()[0][0]
    for it in range(max_iter):
        new_ranks = nodes.join(contribs_of(ranks), "node", "left").select(
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
        delta, dangling = (
            new_ranks.alias("a")
            .join(ranks.alias("b"), "node")
            .join(has_out.withColumn("__has", F.lit(True)), "node", "left")
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
    nodes_raw.unpersist()
    nodes.unpersist()
    links.unpersist()
    return ranks


def pagerank_sql(
    edges_sql: str,
    damping: float = 0.85,
    iters: int = 6,
    scale: float = 1e12,
) -> str:
    """DuckDB twin of a FIXED-iteration :func:`pagerank` run — the
    driver-gate companion (``max_iter=iters, tol=0.0`` on the Spark
    side so both engines run exactly ``iters`` rounds).

    The iteration is UNROLLED into one CTE chain per round (r0..rN,
    each with its own dangling-mass scalar subquery) — the relational
    closed form of the same synchronous update, written with the SAME
    operand order as the Spark side (``teleport + damping·(in_mass +
    dangling/n)``). Ranks are emitted as ``round(rank·scale)``
    INTEGERS: per-destination mass sums in different orders across
    engines (and across Spark partitionings), so raw doubles drift by
    ulps; the quantum absorbs that while pinning 12 decimals.

    ``edges_sql`` must yield columns (src, dst).
    """
    if iters < 1:
        raise ValueError("iters must be >= 1")
    # every numeric literal is cast to DOUBLE: DuckDB parses decimal
    # literals as exact DECIMALs, whose arithmetic would diverge from
    # the Spark side's IEEE doubles
    damp = f"cast({damping!r} AS DOUBLE)"
    one = "cast(1.0 AS DOUBLE)"
    zero = "cast(0.0 AS DOUBLE)"
    parts = [
        f"WITH edges AS ({edges_sql})",
        "nodes AS (SELECT DISTINCT node FROM "
        "(SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges))",
        "nn AS (SELECT count(1) AS n FROM nodes)",
        "deg AS (SELECT src, count(1) AS d FROM edges GROUP BY src)",
        f"r0 AS (SELECT node, {one} / nn.n AS rank FROM nodes, nn)",
    ]
    for i in range(iters):
        prev, cur = f"r{i}", f"r{i + 1}"
        parts.append(
            f"d{i} AS (SELECT coalesce(sum(r.rank), {zero}) AS m "
            f"FROM {prev} r LEFT JOIN deg ON deg.src = r.node "
            "WHERE deg.src IS NULL)"
        )
        parts.append(
            f"{cur} AS (SELECT n.node, "
            f"({one} - {damp}) / nn.n + {damp} * "
            f"(coalesce(c.mass, {zero}) + (SELECT m FROM d{i}) / nn.n) AS rank "
            "FROM nodes n CROSS JOIN nn LEFT JOIN "
            "(SELECT e.dst AS node, sum(r.rank / deg.d) AS mass "
            f"FROM edges e JOIN deg ON deg.src = e.src "
            f"JOIN {prev} r ON r.node = e.src GROUP BY e.dst) c "
            "ON c.node = n.node)"
        )
    body = ",\n".join(parts)
    return (
        f"{body}\n"
        f"SELECT node, cast(round(rank * cast({scale!r} AS DOUBLE)) AS BIGINT)"
        " AS rank_e12 "
        f"FROM r{iters}"
    )
