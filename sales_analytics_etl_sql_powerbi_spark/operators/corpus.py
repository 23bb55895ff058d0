"""End-to-end training-corpus construction (round 12,
beyond-reference): the ONE composed pipeline a pre-training data
job actually runs, built entirely from the oracle-green operators in
this package — quality gate → benchmark decontamination → exact dedup
→ near-dup collapse → per-language token-budget mixing → sequence
packing → example assembly → deterministic shard assignment.

``text.corpus_clean`` is the SUMMARY twin of the front half (it
returns per-lang counts and is the driver-gated entry);
:func:`build_training_corpus` MATERIALIZES the surviving corpus and
carries it through to trainer-ready examples. Every stage is the
already-tested operator — this module adds composition, stage
accounting, and nothing else, so a hash-green stage stays hash-green
here.

Scale shape: each stage is one of the audited plans (hash-aggregate
dedup, band-join near-dup, broadcast-shingle decontamination, bucketed
per-group prefix scan, two-level packing scan). The composition adds
NO new shuffles — stages hand each other doc-id keyed frames, and the
kept-id sets are semi-joined back exactly once per stage. Determinism:
every selection is content-addressed (md5 families), so reruns,
retries, and repartitioning reproduce the same corpus byte for byte
(the shard writer's reproducibility hash asserts it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from .dedup import exact_dedup, keep_canonical
from .packing import assemble_examples, pack_sequences
from .sampling import token_budget_mix, training_shards
from .text import (
    DEFAULT_STOPWORDS,
    decontaminate,
    quality_filter,
    tokens_expr,
)

__all__ = ["build_training_corpus", "observed_stage_counts"]


def build_training_corpus(
    docs: DataFrame,
    *,
    stopwords: tuple[str, ...] = DEFAULT_STOPWORDS,
    benchmark: DataFrame | None = None,
    k: int = 3,
    min_overlap: int = 2,
    neardup: bool = True,
    neardup_threshold: float = 0.8,
    neardup_max_bucket_size: int | None = None,
    token_quotas: dict[str, int] | None = None,
    group: str = "lang",
    budget: int = 512,
    n_shards: int | None = None,
) -> dict[str, DataFrame]:
    """Compose the full corpus-construction pipeline and return every
    stage as a DataFrame (lazy — callers materialize what they need):

    - ``docs``: the SURVIVING corpus rows after quality gate,
      optional benchmark decontamination, exact dedup (canonical =
      min doc_id per content hash), optional near-dup collapse, and
      optional per-``group`` token-budget mixing;
    - ``examples``: trainer-ready packed examples
      (``assemble_examples(pack_sequences(surviving, budget))``),
      plus a deterministic ``shard`` column when ``n_shards`` is set;
    - ``stage_counts``: one tiny frame of (stage, n_docs) — the
      audit trail a curation run records (counts are monotone
      non-increasing; unit-pinned). Materializing it RECOMPUTES every
      stage prefix (111s at 2M docs vs 28.7s for the pipeline itself
      — PLAN_AUDIT r12/r13); it exists as the standalone-audit
      flavor for callers that never materialize ``examples``;
    - ``observations``: the ZERO-EXTRA-PASS flavor (round 13 — the
      ``quality.observed`` pattern): one ``Observation`` per stage,
      riding the plan via ``CollectMetrics`` nodes, so the counters
      are computed DURING whatever action the caller runs on
      ``examples`` (or ``docs``) — no second pass, no recompute.
      Read them with :func:`observed_stage_counts` AFTER an action;
      equality with the recompute path is unit-pinned.

    Stage order fixes the semantics the stages themselves document:
    decontamination runs on the raw scan and intersects (identical
    result, no recompute under the shingle branch — same argument as
    ``text.corpus_clean``); near-dup collapse runs AFTER exact dedup
    so byte-identical copies never occupy near-dup clusters; the
    token budget is LAST so quotas meter what would actually be
    packed.

    CORPUS-SCALE GUIDANCE (round 14 — VERDICT r13 item 8):
    ``neardup_max_bucket_size`` defaults to None (exact LSH behavior,
    the gated contract), but a corpus-scale run over UNCURATED data
    should set it — the r13 ``--lsh-cap`` probe (PLAN_AUDIT) measured
    a 20k-doc boilerplate flood inside a 1M corpus driving the
    candidate join to 200M pairs/356s uncapped vs a FLAT 53.5k
    pairs/15.3s at cap 250, with the cap flat at ANY flood size (the
    per-band keep is cap-bounded by construction). Degradation is
    never silent: the drop counters ride the caller's own action and
    surface both via :func:`dedup.lsh_cap_audit` on the returned
    ``neardup_cap_audit`` dict and as ``neardup_dropped_entries`` /
    ``neardup_oversized_buckets`` keys in
    :func:`observed_stage_counts` output. Exact dedup upstream means
    only DISTINCT near-boilerplate documents populate a bucket, so
    cap 250 loses pair edges only inside 250+-strong near-identical
    families — whose members collapse through the surviving members'
    edges in practice (probe: survivors identical with and without
    the cap).
    """
    observations: dict[str, Observation] = {}

    def _observed(name: str, frame: DataFrame) -> DataFrame:
        # CollectMetrics rides the plan: the counter computes during
        # the caller's OWN action on any downstream frame (examples /
        # docs), costing zero extra passes. A frame re-used twice in
        # one plan (quality_filter input + join left, keep_canonical's
        # band self-join) still reports its cardinality ONCE — Spark
        # deduplicates the identical CollectMetrics subplan (verified
        # by test_corpus_observed_counts_match_recompute).
        obs = Observation()
        observations[name] = obs
        return frame.observe(
            obs, F.count(F.lit(1)).cast("long").alias("n_docs")
        )

    docs = _observed("input", docs)
    stages: list[tuple[str, DataFrame]] = [("input", docs)]

    kept = quality_filter(docs, stopwords=stopwords).select("doc_id")
    surviving = _observed("quality", docs.join(kept, "doc_id"))
    stages.append(("quality", surviving))

    if benchmark is not None:
        clean_ids = (
            decontaminate(docs, benchmark, k, min_overlap)
            .where(~F.col("contaminated"))
            .select("doc_id")
        )
        surviving = _observed(
            "decontaminated", surviving.join(clean_ids, "doc_id")
        )
        stages.append(("decontaminated", surviving))

    canonical = exact_dedup(surviving).select(
        F.col("canonical_doc_id").alias("doc_id")
    )
    surviving = _observed("exact_dedup", surviving.join(canonical, "doc_id"))
    stages.append(("exact_dedup", surviving))

    if neardup:
        # neardup_max_bucket_size (round 13): the LSH candidate-blowup
        # guard for degenerate corpora (boilerplate floods) — see
        # dedup.lsh_candidate_pairs; its drop counters ride the same
        # action as the stage counts
        neardup_audit: dict = {}
        surviving = _observed(
            "neardup",
            keep_canonical(
                surviving,
                k=k,
                threshold=neardup_threshold,
                max_bucket_size=neardup_max_bucket_size,
                audit=(
                    neardup_audit
                    if neardup_max_bucket_size is not None
                    else None
                ),
            ),
        )
        stages.append(("neardup", surviving))

    if token_quotas is not None:
        surviving = (
            token_budget_mix(
                surviving.withColumn(
                    "__n_tok", F.size(tokens_expr("text")).cast("long")
                ),
                group,
                token_quotas,
                "__n_tok",
            )
            .where(F.col("in_token_budget"))
            .drop("__n_tok", "in_token_budget")
        )
        surviving = _observed("token_budget", surviving)
        stages.append(("token_budget", surviving))

    examples = assemble_examples(pack_sequences(surviving, budget=budget))
    if n_shards is not None:
        examples = training_shards(examples, n_shards, key="example_id")

    counts = None
    for name, frame in stages:
        row = frame.select(
            F.lit(name).alias("stage"),
            F.count(F.lit(1)).cast("long").alias("n_docs"),
        )
        counts = row if counts is None else counts.unionByName(row)

    out = {
        "docs": surviving,
        "examples": examples,
        "stage_counts": counts,
        "observations": observations,
    }
    if neardup and neardup_max_bucket_size is not None:
        # read with dedup.lsh_cap_audit (available immediately — the
        # counters rode neardup_pairs' own eager materialization)
        out["neardup_cap_audit"] = neardup_audit
    return out


def observed_stage_counts(
    result: dict,
) -> dict[str, int]:
    """The per-stage doc counts recorded by
    :func:`build_training_corpus`'s riding observations — call AFTER
    an action on ``examples`` (or ``docs``; each ``Observation.get``
    blocks until an action covering its stage has completed). This is
    the zero-extra-pass audit: at 2M docs the recompute flavor
    (``stage_counts``) costs 111s of re-run stages, this one ≈0
    (PLAN_AUDIT r13).

    Pass the :func:`build_training_corpus` RESULT dict. AQE corner
    (PLAN_AUDIT r13): when a stage empties the corpus, empty-relation
    propagation can prune upstream ``CollectMetrics`` nodes and their
    observations complete with EMPTY rows (measured: an all-filtered
    corpus loses input/quality/exact_dedup). Stages lost that way
    fall back to ONE collect of the ``stage_counts`` recompute frame
    — correct counts always, zero extra passes in the normal case.
    A bare observations dict is still accepted (back-compat) but then
    an empty-metrics stage raises instead of falling back.

    When the LSH candidate cap was set (``neardup_max_bucket_size``),
    the cap's drop counters are surfaced here too (round 14 — no
    silent caps): ``neardup_dropped_entries`` and
    ``neardup_oversized_buckets`` keys alongside the stage counts."""
    if "observations" in result and "stage_counts" in result:
        observations = result["observations"]
        fallback_frame = result["stage_counts"]
    else:
        observations, fallback_frame = result, None
    cap_audit = result.get("neardup_cap_audit") if isinstance(result, dict) else None
    from .quality import observation_metrics

    out: dict[str, int] = {}
    missing: list[str] = []
    for name, obs in observations.items():
        # version-layered emptiness probe (round 14): a pruned stage
        # maps to None even if the private fast path disappears in a
        # pyspark upgrade — see quality.observation_metrics
        vals = observation_metrics(obs)
        if vals is None:
            missing.append(name)
        else:
            out[name] = int(vals["n_docs"])
    if missing:
        if fallback_frame is None:
            raise ValueError(
                "observed metrics pruned (AQE empty-relation) for "
                f"stages {missing}; pass the full build_training_corpus "
                "result so the recompute fallback is available"
            )
        rec = {r.stage: int(r.n_docs) for r in fallback_frame.collect()}
        for name in missing:
            out[name] = rec[name]
    if cap_audit is not None:
        from .dedup import lsh_cap_audit

        counters = lsh_cap_audit(cap_audit)
        out["neardup_dropped_entries"] = counters["dropped_entries"]
        out["neardup_oversized_buckets"] = counters["oversized_buckets"]
    return out
