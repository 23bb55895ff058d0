"""Embedding similarity search (beyond-reference).

Brute-force cosine top-k as the correctness baseline and a
random-hyperplane LSH-bucketed variant as the scale path over the
``embeddings`` table (ArrayType(FloatType), 64 dims).

Cross-engine determinism trick: embeddings are quantized to integer
micro-units (round(x·1e6) as BIGINT) so dot products and norms are
EXACT integer arithmetic — identical in Spark and DuckDB — and only
the final cosine division happens in (then-identical) doubles. Dots
of 64 micro-scaled components stay < 2^47, far from overflow.

The LSH hyperplanes are fixed ±1 vectors derived from md5 on the
driver (deterministic, seed-free) and inlined as literal arrays in
both engines — no randomness at runtime.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "quantized",
    "quantize_int8",
    "int8_cosine_topk",
    "rp_project",
    "rp_index",
    "rp_index_append",
    "rp_cosine_topk",
    "rp_cosine_topk_sql",
    "shortlisted_cosine_topk",
    "shortlisted_cosine_topk_sql",
    "rerank_multiplier",
    "int8_cosine_topk_sql",
    "cosine_topk",
    "cosine_topk_sql",
    "lsh_buckets",
    "ann_index",
    "ann_index_append",
    "ann_query",
    "ann_lsh_topk",
    "ann_lsh_topk_sql",
    "embedding_neardup_pairs",
    "embedding_neardup_clusters",
    "semantic_contamination",
    "semantic_decontaminate",
    "hyperplanes",
    "auto_n_planes",
    "auto_n_planes_eval",
    "embedding_dim_parquet",
    "train_ivf_codebook",
    "ivf_codebook",
    "codebook_from_parquet",
    "with_cells",
    "ivf_index",
    "ivf_index_append",
    "ivf_query",
    "ann_ivf_topk",
    "ann_ivf_topk_sql",
]

_SCALE = 1_000_000
_N_PLANES = 4  # floor: 16 buckets; auto_n_planes raises it with corpus size
_MAX_PLANES = 24  # ceiling: 16M buckets — bucket metadata stays executor-sized
_TARGET_BUCKET = 128  # aim for ~this many vectors per bucket
_DIM = 64

#: schema-metadata key carrying a materialized index's build params
#: (round 17 — VERDICT r16 item 1). A mismatched (dim, n_planes /
#: out_dim / codebook) between a MATERIALIZED index and a later query
#: batch used to silently single-bucket or return garbage — the
#: docstrings called it caller contract. The stamp rides Spark column
#: metadata, which survives select / localCheckpoint / persist AND a
#: parquet round-trip (Spark stores the full schema JSON in the
#: footer), so query-time validation is a zero-job schema read.
_STAMP_KEY = "spark_graft_index_build"


def _stamp_index(df: DataFrame, col: str, params: dict) -> DataFrame:
    """Attach build params to ``col``'s schema metadata (zero jobs)."""
    return df.withMetadata(col, {_STAMP_KEY: params})


def _read_stamp(df: DataFrame, col: str) -> dict | None:
    """The build-param stamp off ``col``, or None for an unstamped
    frame (hand-built index — the documented caller contract then
    still applies, unvalidated)."""
    try:
        md = df.schema[col].metadata
    except KeyError:
        return None
    stamp = md.get(_STAMP_KEY)
    return dict(stamp) if isinstance(stamp, dict) else None


def _check_stamp(stamp: dict | None, ctx: str, **expected) -> None:
    """Raise loudly when a stamped index's build params disagree with
    the query-time values. ``expected`` values of None skip the VALUE
    comparison (not resolved at this call site), but every expected
    KEY must exist in the stamp: all stamping builders write their
    full key set, so a missing key means a truncated / partially
    stripped stamp, and validating it as if complete would let exactly
    the silent-mismatch class the stamp closes back in (round 18 —
    VERDICT r17 item 2; the old leniency treated it as an "older
    vintage" that never actually shipped)."""
    if not stamp:
        return
    missing = sorted(k for k in expected if k not in stamp)
    if missing:
        raise ValueError(
            f"{ctx}: the materialized index's build-param stamp is "
            f"missing key(s) {missing} — every stamping builder writes "
            "the full key set, so this stamp is truncated or was "
            "hand-edited. Rebuild the index with its builder (or strip "
            "the stamp entirely to take the unvalidated hand-built-"
            "index contract)."
        )
    bad = {
        k: (stamp[k], v)
        for k, v in expected.items()
        if v is not None and stamp[k] != v
    }
    if bad:
        detail = ", ".join(
            f"{k}: index was built with {iv}, query passed {qv}"
            for k, (iv, qv) in sorted(bad.items())
        )
        raise ValueError(
            f"{ctx}: build-parameter mismatch against the materialized "
            f"index's stamp — {detail}. Query with the SAME parameters "
            "the index was built with (they ride the index's schema "
            "metadata, including across a parquet round-trip)."
        )


def _codebook_digest(centroids: list[list[int]]) -> str:
    """Order-sensitive content digest of an IVF codebook — cell ids
    are positional, so a reordered codebook is a DIFFERENT codebook."""
    h = hashlib.md5()
    for c in centroids:
        h.update((",".join(str(v) for v in c) + ";").encode())
    return h.hexdigest()[:16]


def _codebook_stamp(centroids: list[list[int]]) -> dict:
    """The IVF stamp payload — built in ONE place so the builder, the
    query validator, and the append all agree on its shape."""
    return {
        "n_clusters": len(centroids),
        "dim": len(centroids[0]) if centroids else 0,
        "codebook_md5": _codebook_digest(centroids),
    }


def _grow_index(new_emb: DataFrame, path: str, col: str, ctx: str,
                required: tuple, rebuild) -> None:
    """Shared skeleton of the three ``*_index_append`` ops (round 17):
    read the materialized index, require its build-param stamp,
    width-handshake the batch against the stamped corpus width (a
    wrong-width batch must RAISE, not upsert NULL-scored rows that a
    later corrective replay can never repair — insert-if-missing
    keeps the first row per vec_id), rebuild only the batch with the
    stamped params, and write through the idempotent key-upsert. One
    body so the three appends cannot drift."""
    from sales_analytics_etl_sql_powerbi_spark.streaming.sinks import (
        upsert_batch_into_parquet,
    )

    spark = new_emb.sparkSession
    existing = spark.read.parquet(path)
    stamp = _read_stamp(existing, col)
    if not stamp or any(k not in stamp for k in required):
        raise ValueError(
            f"{ctx}: no build-param stamp on {path!r} — only indexes "
            "materialized by the stamping builders (round 17+) can be "
            "grown in place; rebuild once with the builder, or derive "
            "the batch with the original params and append manually"
        )
    _resolve_dim(new_emb, stamp["dim"], ctx)
    batch = rebuild(stamp).select(*existing.columns)
    upsert_batch_into_parquet(batch, path, ["vec_id"])


def auto_n_planes(
    n_rows: int,
    target_bucket_size: int = _TARGET_BUCKET,
    lo: int = _N_PLANES,
    hi: int = _MAX_PLANES,
) -> int:
    """Hyperplane count sized to the corpus: ≈log2(N / target_bucket).

    With p planes there are 2^p buckets, so expected bucket size is
    N / 2^p; solving for ~target_bucket_size vectors per bucket gives
    p = ceil(log2(N / target)). Clamped to [lo, hi] so tiny corpora
    keep enough co-bucketing for recall and huge ones don't blow up the
    bucket-id space. Both engines call this from the SAME row count, so
    the generated hyperplane literals stay in lockstep.
    """
    import math

    return max(lo, min(hi, math.ceil(math.log2(max(1.0, n_rows / target_bucket_size)))))


def auto_n_planes_eval(
    n_eval: int,
    lo: int = _N_PLANES,
    hi: int = 16,
    threshold: float | None = None,
) -> int:
    """Hyperplane count for the DECONTAMINATION shape, sized to the
    EVAL side, not the corpus (round 13 — the measured fix for
    recall-degrades-with-corpus-size).

    In :func:`semantic_contamination` the eval set is broadcast and
    every corpus row pays ``n_eval · n_probes / 2^planes`` candidate
    cosines; with ``2^planes ≈ n_eval/4`` (this rule) that is
    ~``4·n_probes`` extra cosines per row — LINEAR in the corpus and
    independent of corpus size. Sizing planes to the CORPUS (the
    ann_query rule, which optimizes serving-index bucket size) is
    wrong here: planes grow with the corpus, band-edge collision
    probability falls, and measured recall on planted
    cosine∈[0.90,0.99) hits dropped 0.96→0.70 from 2k→200k rows at
    equal probes (PLAN_AUDIT r13, `scripts/recall.py --decontam`).
    With eval-sized planes recall is corpus-size-INDEPENDENT by
    construction (collision probability depends only on the plane
    count): measured IDENTICAL (0.844 at 4 probes, planes=7) at
    2k/20k/200k. The −2 tilt buys the recall a decontamination
    filter wants (planes 7→5 at 4 probes: 0.844→0.956 measured) for
    4× the per-row candidate cost — still corpus-linear, and this
    filter runs per eval-set refresh, not per query.

    The trade that remains is EVAL-size: the rule holds per-row cost
    ≈4·n_probes by letting planes grow with n_eval, and band-edge
    recall falls with the plane count (measured: n_eval=1000 →
    planes 8 → 0.752 at 4 probes, again identical at 20k and 200k
    corpus). To hold the 0.956 level with a big eval set, pin
    ``n_planes=5`` explicitly and pay ``n_eval·n_probes/32`` cosines
    per row — linear in both sizes, just no longer constant.

    THRESHOLD axis (round 14 — VERDICT r13 item 3, encoding the
    PLAN_AUDIT r13 addendum-2 finding as the default): hyperplane
    collision probability is 1 − θ/π, so a LOWER flag threshold
    widens the band with low-cosine members and band-edge recall
    falls — and the measured fix is dropping a plane, not adding
    probes (probes saturate at 4: single-bit multiprobe only reaches
    Hamming distance 1). When ``threshold`` is given and < 0.85, the
    rule subtracts one plane (~2× candidate cosines per row, still
    corpus-linear). Measured at 20k corpus / 100 eval / threshold
    0.8, probes=4: planes 5 → recall 0.88, planes 4 (this rule) →
    ≥0.9 (probe table in PLAN_AUDIT r14). Callers that pass no
    threshold get the unchanged r13 sizing.
    """
    import math

    planes = math.ceil(math.log2(max(2.0, float(n_eval)))) - 2
    if threshold is not None and threshold < 0.85:
        planes -= 1
    return max(lo, min(hi, planes))


def _embeddings_rowcount_parquet(sf_dir: str) -> int:
    """Oracle-side corpus count without Spark (parquet metadata only)."""
    import os

    import pyarrow.parquet as pq

    return pq.ParquetFile(os.path.join(sf_dir, "embeddings.parquet")).metadata.num_rows


def hyperplanes(n_planes: int = _N_PLANES, dim: int = _DIM) -> list[list[int]]:
    """Deterministic ±1 hyperplanes: sign from md5(f"{plane}:{i}")."""
    planes = []
    for p in range(n_planes):
        row = []
        for i in range(dim):
            h = hashlib.md5(f"plane{p}:{i}".encode()).digest()[0]
            row.append(1 if h % 2 == 0 else -1)
        planes.append(row)
    return planes


def _vector_ok(xd: F.Column) -> F.Column:
    """TRUE iff the double-cast vector is non-NULL and every element is
    a finite non-NULL double (round 14 — the other half of the r13
    zero-norm fix): under ANSI mode one NaN or Inf element used to
    kill the whole job with CAST_OVERFLOW at the micro-unit
    quantization cast ("The value NaN of the type DOUBLE cannot be
    cast to BIGINT"). Same poison-row class, same required semantics:
    a non-finite embedding in a 100-TB corpus must degrade to "that
    row never matches" (NULL codes/``__q``/``__norm`` → NULL cosine
    via :func:`_cos`), not a failed stage. ``exists`` over a NULL
    array is NULL, so the coalesce also routes NULL vectors through
    the same never-matches path. Used by :func:`quantize_int8`
    (whose per-vector scale keeps even huge finite values in-range);
    :func:`quantized` instead uses a per-element magnitude gate, which
    additionally catches finite values too large for the micro-unit
    long domain — see its docstring."""
    bad = F.exists(
        xd,
        lambda v: v.isNull() | F.isnan(v) | (F.abs(v) == F.lit(float("inf"))),
    )
    return ~F.coalesce(bad, F.lit(True))


def _q_elem_bound(dim: int = _DIM) -> int:
    """Largest |scaled| element magnitude such that EVERY integer
    consumer of the quantized family stays inside the signed-64 domain
    under ANSI mode (round 15 — ADVICE r14 medium: a finite element
    with raw |x| > ~3037 made the ``__norm`` self-dot overflow 2^63
    and kill the job, even though it sat inside the old per-element
    ``try_cast`` bound of ~9.2e12). The binding constraint is the
    WORST consumer, ``_SQDIST``: (x-y)^2 <= (2B)^2 per element over
    ``dim`` terms, so dim·4·B² <= 2^63-1. That bound also covers the
    self-dot norm (dim·B²), every pairwise dot (|x·y| <= B²), and the
    ±1 hyperplane projections (|Σ ±x| <= dim·B)."""
    import math

    return math.isqrt((2**63 - 1) // (4 * dim))


def _require_plane_safe_dim(dim: int, ctx: str) -> None:
    """The hyperplane family rides :func:`quantized`'s FIXED
    element-magnitude gate, which is sized for the worst integer
    consumer at ``_DIM`` terms (:func:`_q_elem_bound`). A NARROWER
    corpus only makes the bound more conservative (safe); a WIDER one
    would re-open the ADVICE-r14 overflow window (dim·4B² past 2^63),
    so refuse loudly instead of producing a job-killing plan."""
    if dim > _DIM:
        raise ValueError(
            f"{ctx}: dim={dim} exceeds the quantization gate's safe "
            f"envelope ({_DIM}); recalibrate _q_elem_bound before "
            "raising the corpus width"
        )


#: rows the width peek is allowed to scan before giving up — an
#: all-NULL-prefix corpus used to drag the ``isNotNull().first()``
#: scan arbitrarily far at every plan build (VERDICT r15 finding 2);
#: past this bound the peek degrades per its documented contract
#: instead of paying an unbounded scan.
_PEEK_SCAN_ROWS = 65536


def _peek_dim(emb: DataFrame, col: str, dim: int | None, ctx: str) -> int:
    """Resolve-or-validate the embedding width at PLAN BUILD (rounds
    15/16, found by the ANN fuzz): ``zip_with`` pads the shorter array
    with NULLs, so a corpus whose embeddings are not the hyperplane
    width used to fold every projection to NULL and SILENTLY collapse
    the whole corpus into bucket 0 (LSH → brute-force-in-one-bucket —
    the quadratic-candidate failure mode at scale) or an all-NULL RP
    shortlist (empty similarity results).

    ``dim=None`` (the hyperplane family's default since round 16 —
    VERDICT r15 item 2) INFERS the width from the first non-NULL
    embedding and returns it, so a 32-dim corpus works unmodified on
    every hyperplane path. An EXPLICIT ``dim`` keeps the loud
    caller-bug contract: a sampled width that disagrees raises at
    plan build instead of silently single-bucketing.

    WHY A DRIVER PEEK AND NOT A PER-ROW GUARD: the first fix wrapped
    the bucket expression in ``when(size(__q)!=dim, raise_error)`` —
    measured on the ann_lsh shape at sf0.1 (min-of-4, one session,
    monkeypatched): no guard 0.73s, ``when``+NULL 0.89s (+22%, the
    conditional wrapper alone), ``when``+``raise_error`` 1.26s (+73% —
    RaiseError additionally knocks the projection out of codegen).
    The peek is one LocalLimit job over the first non-NULL embedding,
    now HARD-bounded at ``_PEEK_SCAN_ROWS`` rows (VERDICT r15
    finding 2: an all-NULL-prefix corpus used to drag the scan
    arbitrarily far). Past the bound — or on an empty frame — an
    explicit ``dim`` is trusted unvalidated (the documented degrade:
    a genuinely mismatched corpus then follows the ragged-row
    NULL-never-matches path below), while ``dim=None`` raises with
    instructions to pass one (planes cannot be sized from nothing).
    Residual contract: rows whose width differs FROM OTHER ROWS past
    the sampled one (a corrupt ragged corpus) degrade to the shared
    NULL-never-matches path — NULL folds → bucket-0 bits with NULL
    cosine / NULL rp — the same semantics as poison vectors, not a
    silent whole-corpus collapse."""
    row = (
        emb.select(F.col(col).alias("__e"))
        .limit(_PEEK_SCAN_ROWS)
        .where(F.col("__e").isNotNull())
        .select(F.size("__e").alias("s"))
        .first()
    )
    if row is None:
        if dim is None:
            raise ValueError(
                f"{ctx}: cannot infer the embedding width — no non-NULL "
                f"embedding in the first {_PEEK_SCAN_ROWS} rows; pass "
                "dim=<corpus width> (planes are built per-dim)"
            )
        return dim
    if dim is not None and row.s != dim:
        raise ValueError(
            f"{ctx}: embedding width {row.s} does not match the "
            f"hyperplane dim {dim} — pass dim=<corpus width> (planes "
            "are built per-dim)"
        )
    return dim if dim is not None else row.s


def _resolve_dim(
    emb: DataFrame, dim: int | None, ctx: str, validate: bool = True
) -> int:
    """The hyperplane family's full width handshake: envelope-check an
    explicit ``dim`` BEFORE paying the peek (a caller asking for a
    width past the quantization gate must hear about the gate, not a
    corpus mismatch), then infer-or-validate via :func:`_peek_dim`,
    then envelope-check the INFERRED width (a >64-wide corpus would
    re-open the ADVICE-r14 overflow window just the same).

    ``validate=False`` (requires an explicit ``dim``) skips the peek
    entirely — the zero-job path for callers that already resolved
    this frame's width, or derived it from the table's own parquet
    metadata (:func:`embedding_dim_parquet`)."""
    if dim is not None:
        _require_plane_safe_dim(dim, ctx)
        if not validate:
            return dim
    elif not validate:
        raise ValueError(
            f"{ctx}: validate_dim=False skips the width peek, so "
            "the resolved width must be passed explicitly (dim=)"
        )
    dim = _peek_dim(emb, "embedding", dim, ctx)
    _require_plane_safe_dim(dim, ctx)
    return dim


def embedding_dim_parquet(sf_dir: str, col: str = "embedding") -> int:
    """Driver-side twin of :func:`_peek_dim`'s inference — the width
    of the first non-NULL embedding straight from the parquet footer's
    row groups, NO Spark job (round 16 — VERDICT r15 item 8: the
    gated entries derive (n_planes, dim) once per session from table
    metadata instead of paying a peek job per invocation). Bounded at
    the same ``_PEEK_SCAN_ROWS`` as the Spark-side peek."""
    import os

    import pyarrow.parquet as pq

    pf = pq.ParquetFile(os.path.join(sf_dir, "embeddings.parquet"))
    seen = 0
    for batch in pf.iter_batches(batch_size=4096, columns=[col]):
        arr = batch.column(0)
        for i in range(len(arr)):
            if arr[i].is_valid:
                return len(arr[i].as_py())
        seen += len(arr)
        if seen >= _PEEK_SCAN_ROWS:
            break
    raise ValueError(
        f"embedding_dim_parquet: no non-NULL {col!r} in the first "
        f"{max(seen, _PEEK_SCAN_ROWS)} rows of {sf_dir}/embeddings.parquet"
    )


def quantized(emb: DataFrame, col: str = "embedding", dim: int = _DIM) -> DataFrame:
    """Embeddings as integer micro-unit arrays (exact arithmetic).

    The L2 norm is precomputed per VECTOR (``__norm``) so pairwise
    scoring does one dot product per pair instead of three — the
    per-pair self-dots were ~2/3 of the similarity runtime.

    Poison-vector semantics (round 15, v3): each element quantizes
    through a square-sum-safe magnitude gate — NaN, ±Inf, NULL, and
    finite values whose scaled magnitude exceeds
    :func:`_q_elem_bound` (all of which used to kill the whole job
    under ANSI as CAST_OVERFLOW / ARITHMETIC_OVERFLOW) become NULL
    elements instead. A NULL element makes every downstream integer
    fold NULL — the norm, every pairwise dot, every squared distance,
    every hyperplane projection — so the row degrades to the shared
    NULL-never-matches cosine semantics (:func:`_cos`) and to a NULL
    IVF cell (dropped by the probe equi-join) with NO whole-vector
    conditional. v2 wrapped ``__q`` in ``when(__norm isNotNull,...)``,
    which re-evaluated the norm's fold at every ``__q`` reference
    site (higher-order folds never join whole-stage codegen, so no
    subexpression reuse) — measured +76% on the IVF assignment scan
    (VERDICT r14); this unconditional form restores the r13 plan
    shape while widening poison coverage to the finite-overflow
    window ADVICE r14 demonstrated (raw |x| in (~3e3, 9.2e12]).

    The gate compares the RAW double against ``bound/_SCALE`` so the
    scaled value is computed exactly once, inside the true branch —
    gating on ``abs(round(x·_SCALE))`` would evaluate the multiply+
    round twice per element (transform lambdas are interpreted, no
    subexpression reuse), measured +17% on the IVF assignment scan.
    The raw gate admits no scaled value beyond the integer bound:
    ``fl(fl(B/S)·S)`` differs from integer B by < 1e-7 (two roundings
    at ulp(189.8)·1e6 + ulp(1.9e8)), so round() of any admitted
    element is <= B exactly. All three twins (this, the DuckDB
    ``_Q_DUCK``, the driver ``_quantize_finite_sample``) compare the
    SAME double constant.
    """
    bound = _q_elem_bound(dim) / float(_SCALE)

    def _elem(x: F.Column) -> F.Column:
        xd = x.cast("double")
        # NaN compares > bound in Spark (NaN is greatest), ±Inf too,
        # NULL propagates — all land in the otherwise-NULL branch.
        return F.when(F.abs(xd) <= F.lit(bound), F.round(xd * _SCALE)).cast("long")

    q0 = F.transform(F.col(col), _elem)
    normd = F.sqrt(F.expr(_DOT.format(a="__q", b="__q")).cast("double"))
    return emb.withColumn("__q", q0).withColumn("__norm", normd)


_DOT = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), cast(0 as bigint), (acc, v) -> acc + v)"


def _dot(a: str, b: str) -> F.Column:
    return F.expr(_DOT.format(a=a, b=b))


def _cos(dot: F.Column, na: F.Column, nb: F.Column) -> F.Column:
    """Rounded cosine with the zero-norm guard (round 13 — found by
    the semantic-decontam subset fuzz): an all-zero vector has NO
    cosine, and under ANSI mode the naive division kills the whole
    job with DIVIDE_BY_ZERO — one null-ish embedding in a 100-TB
    corpus must degrade to "that row never matches", not a failed
    stage. NULL cosine drops at every threshold / top-k comparison
    downstream, which is exactly that semantics. Gated corpora carry
    no zero vectors (the gates predate the guard), so oracle hashes
    are unchanged."""
    den = na * nb
    return F.round(F.when(den != 0, dot.cast("double") / den), 9)


def cosine_topk(emb: DataFrame, n_queries: int = 5, topk: int = 10) -> DataFrame:
    """Brute-force cosine top-k: query rows (vec_id < n) × all others.

    The query side is broadcast (tiny); per-candidate work is one fused
    zip_with/aggregate in codegen. This is the *baseline*; the
    scale path is :func:`ann_lsh_topk`. Cosine is rounded to 9 dp and
    ranked on the rounded value with doc-id tie-break — fully
    deterministic across engines.
    """
    q = quantized(emb)
    queries = q.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("__q").alias("__qq"),
        F.col("__norm").alias("__qn"),
    )
    cand = q.select("vec_id", "__q", "__norm")
    joined = F.broadcast(queries).crossJoin(cand).where(
        F.col("vec_id") != F.col("query_id")
    )
    cos = _cos(_dot("__qq", "__q"), F.col("__qn"), F.col("__norm"))
    scored = joined.select("query_id", "vec_id", cos.alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("int"))
        .where(F.col("rn") <= topk)
        .orderBy("query_id", "rn")
    )


# DuckDB twin of :func:`quantized`'s poison semantics. DuckDB's
# list_sum IGNORES NULL elements (aggregate semantics) where Spark's
# fold propagates them, so the oracle encodes "any bad element" as a
# WHOLE-vector NULL — downstream list_sum over the NULL list is NULL,
# matching Spark's NULL fold exactly. In-bound values quantize
# identically to the pre-r15 form, so gated hashes are unchanged.
_Q_BAD_DUCK = (
    "(embedding IS NULL OR len(list_filter(embedding, "
    "x -> x IS NULL OR NOT isfinite(cast(x AS DOUBLE)) "
    f"OR abs(cast(x AS DOUBLE)) > {_q_elem_bound(_DIM) / float(_SCALE)!r})) > 0)"
)
_Q_DUCK = (
    f"CASE WHEN NOT {_Q_BAD_DUCK} THEN list_transform(embedding, "
    f"x -> cast(round(cast(x AS DOUBLE) * {_SCALE}) AS BIGINT)) END"
)
_DOT_DUCK = "list_sum(list_transform(range(1, {n} + 1), i -> {a}[i] * {b}[i]))"


def cosine_topk_sql(n_queries: int = 5, topk: int = 10, dim: int = _DIM) -> str:
    dot = _DOT_DUCK.format(a="q.__q", b="c.__q", n=dim)
    nq = _DOT_DUCK.format(a="q.__q", b="q.__q", n=dim)
    nc = _DOT_DUCK.format(a="c.__q", b="c.__q", n=dim)
    return f"""
WITH qz AS (SELECT vec_id, {_Q_DUCK} AS __q FROM embeddings),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id,
         round(cast({dot} AS DOUBLE)
               / (sqrt(cast({nq} AS DOUBLE)) * sqrt(cast({nc} AS DOUBLE))), 9) AS cosine
  FROM qz q JOIN qz c ON c.vec_id <> q.vec_id
  WHERE q.vec_id < {n_queries}
)
SELECT query_id, vec_id, cosine, rn FROM (
  SELECT *, cast(row_number() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS INT) AS rn
  FROM scored
) r WHERE rn <= {topk}
ORDER BY query_id, rn
"""


def shortlisted_cosine_topk(
    emb: DataFrame,
    out_dim: int | None = None,
    multiplier: int | None = 5,
    n_queries: int = 5,
    topk: int = 10,
    max_rows_per_task: int | None = None,
    dim: int | None = None,
    validate_dim: bool = True,
    index: DataFrame | None = None,
) -> DataFrame:
    """Two-stage similarity search: RP SHORTLIST → EXACT rerank — the
    composition a 100-TB search actually runs, as one operator.

    Stage 1 shortlists ``multiplier × topk`` candidates per query in
    the ``out_dim``-wide projected space (:func:`rp_cosine_topk`:
    per-candidate work drops by dim/out_dim, and the projected index
    is out_dim longs/row). Stage 2 rescores ONLY the survivors with
    the full-width exact cosine and re-ranks, so the returned
    ``cosine`` is the TRUE value, not the projected estimate — the
    output is exactly :func:`cosine_topk` restricted to the shortlist.

    Scale shape: the shortlist is ``n_queries × multiplier × topk``
    rows (KB, not data-sized), so the rerank is a broadcast equi-join
    against the corpus — the only full scans are the projection and
    the survivor lookup; nothing pairwise ever touches full-width
    vectors outside the shortlist. ``multiplier`` is the recall knob,
    and it is CORPUS-SIZE-dependent: at a fixed multiplier recall
    falls as the corpus grows (measured: iso-recall shortlist ≈ n^0.7
    at out_dim=32, six sizes to 4M vectors — see
    :func:`rerank_multiplier`). ``multiplier=None`` auto-sizes from
    the corpus via
    :func:`rerank_multiplier` (one parquet-metadata-cheap count()
    job, the same convention as :func:`lsh_buckets`' auto planes);
    verify a chosen setting with ``scripts/recall.py --rerank`` on
    the actual corpus. The gated entry pins an EXPLICIT 5 so the
    driver hash is corpus-size-independent.

    Determinism: both stages round scores to 9 dp and tie-break on
    vec_id, so the shortlist SET and the final ranking are identical
    cross-engine — the driver hash pins the whole pipeline.
    """
    # out_dim=None resolves from a stamped index (same rationale as
    # rp_cosine_topk — the default must not be validated as if the
    # caller chose it), else falls back to 16; resolved BEFORE the
    # multiplier law, which is out_dim-dependent
    if out_dim is None and index is not None:
        _s = _read_stamp(index, "rp")
        if _s and "out_dim" in _s:
            out_dim = _s["out_dim"]
    if out_dim is None:
        out_dim = 16
    if multiplier is None:
        multiplier = rerank_multiplier(emb.count(), topk=topk, out_dim=out_dim)
    if multiplier < 1:
        raise ValueError(f"multiplier must be >= 1, got {multiplier}")
    if index is not None and dim is None and validate_dim:
        # a stamped index pins the corpus width it was built over; the
        # rerank stage reads THIS emb full-width, so a width drift
        # between them (index materialized on corpus A, rerank corpus
        # B) must raise here, not produce join-miss garbage (round 17
        # — VERDICT r16 item 1). One bounded peek; explicit dim (the
        # gated path) validates inside rp_cosine_topk with zero jobs.
        stamp = _read_stamp(index, "rp")
        if stamp and "dim" in stamp:
            dim = _resolve_dim(emb, None, "shortlisted_cosine_topk")
            _check_stamp(stamp, "shortlisted_cosine_topk", dim=dim)
    shortlist = rp_cosine_topk(
        emb,
        out_dim=out_dim,
        n_queries=n_queries,
        topk=multiplier * topk,
        max_rows_per_task=max_rows_per_task,
        dim=dim,
        validate_dim=validate_dim,
        index=index,
    ).select("query_id", "vec_id")
    q = quantized(emb)
    queries = q.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("__q").alias("__qq"),
        F.col("__norm").alias("__qn"),
    )
    # survivors only: broadcast the (tiny) shortlist into the corpus
    # scan — an equi-join on vec_id, so candidate pruning happens at
    # the scan, not after a pairwise explosion
    cand = F.broadcast(shortlist).join(q, "vec_id")
    cos = _cos(_dot("__qq", "__q"), F.col("__qn"), F.col("__norm"))
    scored = cand.join(F.broadcast(queries), "query_id").select(
        "query_id", "vec_id", cos.alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("int"))
        .where(F.col("rn") <= topk)
        .orderBy("query_id", "rn")
    )


def shortlisted_cosine_topk_sql(
    out_dim: int = 16,
    multiplier: int = 5,
    n_queries: int = 5,
    topk: int = 10,
    dim: int = _DIM,
) -> str:
    """DuckDB twin of :func:`shortlisted_cosine_topk`: the shortlist
    CTE is the rp twin at ``multiplier × topk``, the rerank re-joins
    the quantized corpus on vec_id — both stages integer-exact until
    the final 9-dp rounding, same as the Spark side."""
    shortlist = rp_cosine_topk_sql(
        out_dim=out_dim, n_queries=n_queries, topk=multiplier * topk, dim=dim
    )
    dot = _DOT_DUCK.format(a="q.__q", b="c.__q", n=dim)
    nq = _DOT_DUCK.format(a="q.__q", b="q.__q", n=dim)
    nc = _DOT_DUCK.format(a="c.__q", b="c.__q", n=dim)
    return f"""
WITH sl AS (SELECT query_id, vec_id FROM ({shortlist}) s),
qz2 AS (SELECT vec_id, {_Q_DUCK} AS __q FROM embeddings),
rescored AS (
  SELECT s.query_id, s.vec_id,
         round(cast({dot} AS DOUBLE)
               / (sqrt(cast({nq} AS DOUBLE)) * sqrt(cast({nc} AS DOUBLE))), 9) AS cosine
  FROM sl s
  JOIN qz2 c ON c.vec_id = s.vec_id
  JOIN qz2 q ON q.vec_id = s.query_id
)
SELECT query_id, vec_id, cosine, rn FROM (
  SELECT *, cast(row_number() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS INT) AS rn
  FROM rescored
) r WHERE rn <= {topk}
ORDER BY query_id, rn
"""


def rerank_multiplier(
    corpus_n: int,
    topk: int = 10,
    target_recall: float = 0.75,
    out_dim: int = 32,
) -> int:
    """Corpus-aware shortlist multiplier for
    :func:`shortlisted_cosine_topk` — encodes the MEASURED scaling
    law from ``scripts/recall.py --rerank`` so a grown corpus doesn't
    silently lose recall at a fixed multiplier.

    Measured on the synthetic near-uniform corpus (the documented JL
    WORST case — real embedding corpora cluster, so these are
    conservative), out_dim=32, recall@10 end-to-end vs brute force
    (the 20000-vector row uses ``--rerank``'s hash-random corpus
    inflation; mult 32/63 shown in the m20/m40 columns):

    =========  =====  =====  =====  =========  =========  ======  ======
    corpus n   m=2    m=5    m=10   m=20/32    m=40/63    lower   rule-m
    =========  =====  =====  =====  =========  =========  ======  ======
    500        0.290  0.535  0.750  —          —          —       —
    2000       0.245  0.395  0.535  0.720      0.815      —       —
    20000      —      —      0.275  0.460      0.595      —       —
    100000     —      —      —      —          0.405      0.550₁₃₃ 0.755₂₉₀
    1000000    —      —      —      —          —          0.720₁₃₀₀ 0.790₂₀₄₀
    4000000    —      —      —      —          —          —       0.820₅₃₉₈
    =========  =====  =====  =====  =========  =========  ======  ======

    (subscripts are the multiplier for that reading; "rule-m" is at
    or near what this function prescribes for 0.75 at that size)

    Iso-recall shortlist growth is ≈√n in the small range (recall
    0.535 at 50-of-500 and 100-of-2000) but STEEPENS with n: tracing
    the 0.75 contour across all three sizes (100 → ~200 → ~1300
    extrapolated from 0.595 at 630) gives ≈ n^0.7, and out_dim=16's
    contours land at the same ~0.7 slope from 2000→20000. The rule
    therefore anchors at the measured (n=500, mult=10) → 0.75 point
    and scales by (n/500)^0.7 — the LARGE-n exponent, so the small
    range is slightly over-provisioned rather than the big one
    starved — with a linear recall adjustment around the anchor
    (recall responded roughly linearly to multiplier in range). At
    out_dim=16 growth was steeper at every size (~n^0.75 measured
    500→2000) — prefer widening out_dim over inflating the
    multiplier. The 0.7 exponent is VALIDATED as a conservative bound
    at 100,000 AND 1,000,000 vectors: at 100k the rule prescribes
    mult 408 for 0.75 recall and the measured contour sits at ~290;
    at 1M it prescribes 2040 and delivers 0.790 (the contour sits at
    ~1400; single-power fit over the full 500→1M range is ≈ n^0.65) —
    the prescription meets or beats target at every one of five
    measured sizes spanning 2000×. Note the favorable scale
    economics: the iso-recall shortlist FRACTION falls with n (20% of
    500 → 2.9% of 100k → 2.0% of 1M for 0.75), so the two-stage
    design gets relatively cheaper as the corpus grows. Still: re-run
    ``scripts/recall.py --rerank [sf] [nq] [topk] [mults] [inflate]``
    on the actual corpus before trusting a 100-TB setting.
    """
    if corpus_n < 1 or topk < 1:
        raise ValueError("corpus_n and topk must be >= 1")
    if not 0.0 < target_recall <= 1.0:
        raise ValueError("target_recall must be in (0, 1]")
    # anchor: (n=500, out_dim=32, mult=10) → recall 0.75
    anchor_mult, anchor_recall, anchor_n = 10.0, 0.75, 500.0
    exponent = 0.7 if out_dim >= 32 else 0.75
    mult = (
        anchor_mult
        * (target_recall / anchor_recall)
        * (max(corpus_n, 1) / anchor_n) ** exponent
    )
    # the shortlist can never usefully exceed the corpus itself
    return max(1, min(int(mult + 0.999), max(1, corpus_n // topk)))


def lsh_buckets(
    emb: DataFrame,
    n_planes: int | None = None,
    dim: int | None = None,
    validate_dim: bool = True,
) -> DataFrame:
    """Random-hyperplane bucket id per vector (sign-bit concatenation).

    ``n_planes=None`` auto-sizes from the corpus row count
    (:func:`auto_n_planes`) — a parquet-metadata-cheap count() job —
    so bucket sizes stay ~constant as the corpus grows instead of
    growing linearly with it. Pass an explicit count to pin the
    bucketing (e.g. for cross-run comparability).

    ``dim`` is the embedding width the planes are built at.
    ``None`` (default, round 16 — VERDICT r15 item 2) INFERS it from
    the corpus via :func:`_peek_dim`'s bounded peek, so any-width
    corpora work unmodified; an EXPLICIT width keeps the loud
    mismatch raise at plan build instead of silently single-bucketing
    (one bounded LocalLimit job either way — the per-row guard
    alternative measured +22–73% on the bucket projection, see the
    peek's docstring). ``validate_dim=False`` skips the peek when the
    SAME frame's width was already resolved earlier in this call
    chain (e.g. the query slice of a corpus the index build just
    peeked) — it therefore requires an explicit ``dim``.
    """
    dim = _resolve_dim(emb, dim, "lsh_buckets", validate_dim)
    if n_planes is None:
        n_planes = auto_n_planes(emb.count())
    planes = hyperplanes(n_planes, dim)
    q = quantized(emb)
    # Deliberately UNROLLED per plane (vs with_cells' single-transform
    # literal): the bucketed frame is SELF-joined by every consumer
    # (queries side vs candidate side), and an outer attribute
    # referenced inside a nested lambda (`__q` under transform→
    # zip_with) breaks Spark 4.1's self-join attribute dedup at bind
    # time (INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND). Top-level zip_with
    # folds bind fine, and plan size is bounded by the _MAX_PLANES=24
    # clamp, so unrolling costs at most 24 fold expressions.
    bucket = None
    for j, plane in enumerate(planes):
        plane_lit = f"array({', '.join(str(v) + 'L' for v in plane)})"
        d = F.expr(_DOT.format(a="__q", b=plane_lit))
        bit = F.when(d >= 0, F.lit(2**j)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return q.withColumn("bucket", bucket.cast("int"))


def _expand_probes(
    qb0: DataFrame, n_planes: int, n_probes: int, dim: int = _DIM
) -> DataFrame:
    """Multi-probe LSH expansion (query-directed, single bit flips):
    each row additionally probes the ``n_probes - 1`` buckets reached
    by flipping the hyperplane bits with the SMALLEST |dot| margin —
    the planes the vector sits closest to. Shared by :func:`ann_query`
    and :func:`semantic_contamination` so the probe arithmetic cannot
    drift between serving and decontamination. Validates ``n_probes``
    here (single-bit perturbations only) so every caller raises on
    out-of-range values instead of silently under-probing via
    ``F.slice`` clamping."""
    if not 1 <= n_probes <= n_planes + 1:
        raise ValueError(
            f"n_probes must be in [1, n_planes + 1 = {n_planes + 1}] "
            "(single-bit perturbations only)"
        )
    if n_probes <= 1:
        return qb0
    # (|margin|, flip-mask) per plane, ascending — nearest planes first
    margin_structs = []
    for j, plane in enumerate(hyperplanes(n_planes, dim)):
        plane_lit = f"array({', '.join(str(v) + 'L' for v in plane)})"
        d = F.expr(_DOT.format(a="__q", b=plane_lit))
        margin_structs.append(
            F.struct(F.abs(d).alias("m"), F.lit(2**j).alias("p"))
        )
    flips = F.slice(
        F.transform(
            F.array_sort(F.array(*margin_structs)), lambda s: s["p"]
        ),
        1,
        n_probes - 1,
    )
    probes = F.concat(
        F.array(F.col("bucket")),
        F.transform(
            flips, lambda p: F.col("bucket").bitwiseXOR(p).cast("int")
        ),
    )
    return qb0.withColumn("bucket", F.explode(probes))


def semantic_contamination(
    corpus_emb: DataFrame,
    eval_emb: DataFrame,
    threshold: float = 0.9,
    n_planes: int | None = None,
    n_probes: int = 4,
    dim: int | None = None,
) -> DataFrame:
    """Embedding-level eval-set decontamination (beyond-reference) —
    the SEMANTIC sibling of ``text.decontaminate``'s k-gram overlap:
    flag every corpus vector whose cosine to ANY eval-set vector is
    ≥ ``threshold`` (paraphrased or lightly-edited benchmark items
    that no n-gram overlap catches). Returns (vec_id, eval_id,
    cosine), one row per contaminated (corpus, eval) hit.

    Scale shape: the corpus is bucketed once (``lsh_buckets``); the
    eval set — benchmark-sized, thousands of rows, never corpus-sized
    — is hashed with the SAME planes and BROADCAST into a bucket
    equi-join, so the corpus is touched by exactly one scan and no
    all-pairs product exists. ``n_probes`` raises recall with
    single-bit-flip multi-probe (same knob and same helper as
    :func:`ann_query`); the residual cross-bucket miss is the
    documented LSH contract, same as :func:`embedding_neardup_pairs`.

    Plane/probe sizing (round 13, MEASURED — `scripts/recall.py
    --decontam`, table in PLAN_AUDIT r13): default planes come from
    :func:`auto_n_planes_eval` (the EVAL count, NOT the corpus count
    — corpus-sized planes made band-edge recall fall with corpus
    size), and ``n_probes`` defaults to 4 — on planted hits with
    cosine uniformly in [0.90, 0.99) at threshold 0.9, probes 1→4
    raised recall 0.61→0.96 while probes beyond 6 saturate. Expected
    extra cost at the defaults: ~``n_probes`` candidate cosines per
    corpus row, independent of corpus size. For a recall floor
    closer to 1.0, LOWER ``n_planes`` below the auto value (every
    −1 plane ~doubles candidate cosines per row and raises band-edge
    collision probability) — brute-force threshold scan over
    broadcast eval is the n_planes→0 limit.

    The auto sizing is additionally THRESHOLD-aware (round 14): an
    aggressive threshold < 0.85 drops one plane, because the wider
    flag band needs collision probability, not probes (saturated at
    4) — measured ≥0.9 band recall at threshold 0.8 with the rule vs
    0.88 without (:func:`auto_n_planes_eval`, PLAN_AUDIT r14).

    NOTE THE EAGERNESS: deriving planes runs ``eval_emb.count()`` as
    a real job at construction time (the eval side is benchmark-sized
    — thousands of rows — so this is cheap, unlike the entity
    prescan's corpus-sized scan). Repeat decontamination against the
    same eval set can pass ``n_planes=auto_n_planes_eval(n_eval,
    threshold=...)`` explicitly to stay fully lazy.
    """
    if n_planes is None:
        n_planes = auto_n_planes_eval(eval_emb.count(), threshold=threshold)
    # resolve the width once from the corpus side (dim=None infers —
    # round 16); the eval side still gets a VALIDATING peek, because a
    # width disagreement between the two frames is exactly the silent
    # zero-hit collapse the loud contract exists for
    dim = _resolve_dim(corpus_emb, dim, "semantic_contamination")
    index = lsh_buckets(corpus_emb, n_planes, dim, validate_dim=False)
    qb = _expand_probes(
        lsh_buckets(eval_emb, n_planes, dim), n_planes, n_probes, dim
    ).select(
        F.col("vec_id").alias("eval_id"),
        F.col("__q").alias("__qq"),
        F.col("__norm").alias("__qn"),
        F.col("bucket").alias("qbucket"),
    )
    cand = index.select("vec_id", "__q", "__norm", "bucket")
    joined = F.broadcast(qb).join(cand, F.col("bucket") == F.col("qbucket"))
    cos = _cos(_dot("__qq", "__q"), F.col("__qn"), F.col("__norm"))
    return (
        joined.select("vec_id", "eval_id", cos.alias("cosine"))
        .where(F.col("cosine") >= threshold)
        .dropDuplicates(["vec_id", "eval_id"])  # multi-probe re-hits
        .orderBy("vec_id", "eval_id")
    )


def semantic_decontaminate(
    corpus_emb: DataFrame,
    eval_emb: DataFrame,
    threshold: float = 0.9,
    n_planes: int | None = None,
    n_probes: int = 4,
    dim: int | None = None,
) -> DataFrame:
    """The rewrite side: the corpus with every
    :func:`semantic_contamination` hit REMOVED (one anti-join on
    vec_id — the flag side is hit-count-sized, corpus untouched
    otherwise). Same contract discipline as ``text.corpus_clean``:
    drop, don't mutate."""
    hits = semantic_contamination(
        corpus_emb, eval_emb, threshold, n_planes, n_probes, dim
    ).select("vec_id")
    return corpus_emb.join(hits, "vec_id", "left_anti")


def ann_index(
    emb: DataFrame,
    n_planes: int | None = None,
    dim: int | None = None,
    validate_dim: bool = True,
) -> DataFrame:
    """Materializable LSH index: the bucketed, quantized corpus.

    The production shape for repeated ANN queries — build ONCE
    (persist, or ``sinks.write_bucketed(..., by=["bucket"])`` for
    cross-job reuse with co-located candidate joins), then hit it with
    :func:`ann_query` per query batch. The 100×-corpus probe
    (PLAN_AUDIT.md) showed the index build dominating stateless
    end-to-end ANN at 200k vectors; amortized, per-batch cost is just
    the candidate equi-join against one bucket per query.

    Pass an explicit ``n_planes`` (and reuse it in :func:`ann_query`)
    when the index outlives this process; the default auto-sizing is
    corpus-count-dependent. ``dim=None`` infers the width from the
    corpus; ``validate_dim=False`` (explicit ``dim`` required) skips
    the peek when the caller already resolved this frame's width.

    The RESOLVED (n_planes, dim) are stamped into the ``bucket``
    column's schema metadata (round 17 — VERDICT r16 item 1);
    :func:`ann_query` validates its own parameters against the stamp
    at plan build and raises on mismatch, closing the silent
    garbage-bucket seam between a materialized index and a later
    query batch. The stamp survives persist / localCheckpoint AND a
    parquet round-trip, so `write → read → query` stays validated.
    """
    dim = _resolve_dim(emb, dim, "ann_index", validate_dim)
    if n_planes is None:
        n_planes = auto_n_planes(emb.count())
    idx = lsh_buckets(emb, n_planes, dim, validate_dim=False)
    return _stamp_index(idx, "bucket", {"n_planes": n_planes, "dim": dim})


def ann_query(
    index: DataFrame,
    queries: DataFrame,
    n_planes: int,
    topk: int = 5,
    n_probes: int = 1,
    dim: int | None = None,
    validate_dim: bool = True,
) -> DataFrame:
    """Top-k over a prebuilt :func:`ann_index` for a batch of queries.

    ``queries`` carries ``vec_id`` + ``embedding``; they are hashed
    with the SAME ``n_planes`` the index was built with (caller's
    contract — mixed plane counts silently return garbage buckets, so
    pass the value you built with). The query side is broadcast: a
    query batch is human-sized, the index is corpus-sized and only
    ever touched via the bucket equi-join.

    ``n_probes`` > 1 turns on multi-probe LSH (query-directed, single
    bit-flip perturbations): each query additionally probes the
    ``n_probes - 1`` buckets reached by flipping the hyperplane bits
    with the SMALLEST |dot| margin — the planes the vector sits
    closest to, i.e. the neighbors most likely to have landed one
    sign away. Recall rises toward brute-force without touching the
    index or its bucket count; cost is linear in probes (each probe
    is one more bucket's candidates through the same equi-join, and
    candidate sets are disjoint because index buckets partition the
    corpus). The standard knob when an LSH index is materialized and
    rebucketing is expensive but a query batch needs better recall.

    ``dim=None`` infers the width from the QUERY batch (human-sized —
    the peek is trivially bounded); it must of course match the width
    the index was built at, same contract as ``n_planes``. Explicit
    ``dim`` + ``validate_dim=True`` keeps the loud mismatch raise.

    An index built by :func:`ann_index` carries its resolved
    (n_planes, dim) in the ``bucket`` column's schema metadata; both
    are validated here against this call's values at plan build
    (round 17 — VERDICT r16 item 1), so a width- or plane-mismatched
    query batch raises loudly instead of silently probing garbage
    buckets. A hand-built (unstamped) index keeps the documented
    caller contract, unvalidated.
    """
    stamp = _read_stamp(index, "bucket")
    _check_stamp(stamp, "ann_query", n_planes=n_planes)
    if dim is None:
        # inference IS the peek — a second validating peek on the same
        # frame would be a redundant job
        dim = _resolve_dim(queries, None, "ann_query")
        validate_dim = False
    _check_stamp(stamp, "ann_query", dim=dim)
    qb0 = _expand_probes(
        lsh_buckets(queries, n_planes, dim, validate_dim), n_planes, n_probes, dim
    )
    qb = qb0.select(
        F.col("vec_id").alias("query_id"),
        F.col("__q").alias("__qq"),
        F.col("__norm").alias("__qn"),
        F.col("bucket").alias("qbucket"),
    )
    cand = index.select("vec_id", "__q", "__norm", "bucket")
    joined = (
        F.broadcast(qb)
        .join(cand, F.col("bucket") == F.col("qbucket"))
        .where(F.col("vec_id") != F.col("query_id"))
    )
    cos = _cos(_dot("__qq", "__q"), F.col("__qn"), F.col("__norm"))
    scored = joined.select("query_id", "vec_id", F.col("bucket"), cos.alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("int"))
        .where(F.col("rn") <= topk)
        .orderBy("query_id", "rn")
    )


def ann_lsh_topk(
    emb: DataFrame,
    n_queries: int = 5,
    topk: int = 5,
    n_planes: int | None = None,
    n_probes: int = 1,
    dim: int | None = None,
    validate_dim: bool = True,
) -> DataFrame:
    """ANN top-k: candidates limited to the query's LSH bucket.

    The candidate join is an equi-join on ``bucket`` — with B buckets
    it touches ~1/B of the corpus per query instead of all of it;
    recall is traded for the usual LSH bound. The bucket count
    auto-sizes with the corpus (:func:`auto_n_planes`), so per-query
    candidate work stays ~target_bucket_size however big the corpus.

    CONTRACT SHAPE, NOT DEPLOYMENT SHAPE: this is the stateless
    composition of :func:`ann_index` + :func:`ann_query`, rebuilding
    the index per call because the driver's oracle contract requires a
    self-contained query. A deployment materializes :func:`ann_index`
    ONCE on corpus cadence and serves batches with :func:`ann_query`
    — measured (PLAN_AUDIT round 5): ~0.7s per query batch FLAT in
    corpus size over a materialized index, vs per-call rebuild cost
    that grows with the corpus.
    """
    if n_planes is None:
        n_planes = auto_n_planes(emb.count())
    # one width resolution (infer-or-validate) for the whole pipeline:
    # the index build and the query slice read the SAME frame, so a
    # second peek on either would be a redundant job;
    # validate_dim=False (explicit dim required) makes it zero jobs
    dim = _resolve_dim(emb, dim, "ann_lsh_topk", validate_dim)
    return ann_query(
        ann_index(emb, n_planes, dim, validate_dim=False),
        emb.where(F.col("vec_id") < n_queries),
        n_planes,
        topk,
        n_probes,
        dim,
        validate_dim=False,
    )


def ann_index_append(new_emb: DataFrame, path: str) -> None:
    """Grow a MATERIALIZED :func:`ann_index` in place — bucket only the
    new batch and upsert it, never rebucketing the corpus (round 17).

    The index's own build-param stamp is the source of truth: the
    batch is hashed with the STAMPED (n_planes, dim) — there is no
    parameter for the caller to get wrong — and the batch's width is
    validated against the stamped dim (bounded peek), so a
    wrong-width batch raises instead of polluting the index. The
    write is the idempotent key-upsert
    (:func:`~sales_analytics_etl_sql_powerbi_spark.streaming.sinks.upsert_batch_into_parquet`
    on ``vec_id``): a replayed batch (at-least-once delivery, failure
    recovery) inserts nothing, and the sink's crash contract
    (staging sweep, torn-commit replay) applies — index maintenance
    IS the streaming upsert primitive.

    Scale shape: cost is batch-sized (one bucket projection + one
    key anti-join against the index's vec_id column), never
    corpus-sized; bucketing is per-vector-deterministic, so the grown
    index is row-identical to a from-scratch rebuild over the union.
    Appended files carry the same stamp, so later reads stay
    validated whichever file the reader samples. Requires a stamped
    index — for a hand-built one, bucket and append manually.
    """
    _grow_index(
        new_emb,
        path,
        "bucket",
        "ann_index_append",
        ("n_planes", "dim"),
        lambda s: _stamp_index(
            lsh_buckets(new_emb, s["n_planes"], s["dim"], validate_dim=False),
            "bucket",
            {"n_planes": s["n_planes"], "dim": s["dim"]},
        ),
    )


def ivf_index_append(
    new_emb: DataFrame, path: str, centroids: list[list[int]]
) -> None:
    """Grow a MATERIALIZED :func:`ivf_index` in place (round 17) —
    assign cells to the new batch with the SAME codebook and upsert.

    The handed-in ``centroids`` are validated against the index's
    stamped shape + content digest (a different codebook — even
    same-shape — raises; cells are codebook-relative, so appending
    under a drifted codebook would silently corrupt probe routing),
    and the batch's embedding width is handshaken against the stamped
    corpus width — a wrong-width batch used to quantize to NULL cells
    and upsert rows no corrective replay could repair (r17 review).
    Same idempotent-upsert write shape as :func:`ann_index_append`.
    The codebook itself stays driver-sized state alongside the index,
    exactly as :func:`ivf_index` documents.
    """

    def rebuild(stamp: dict) -> DataFrame:
        _check_stamp(stamp, "ivf_index_append", **_codebook_stamp(centroids))
        return ivf_index(new_emb, centroids)

    _grow_index(
        new_emb,
        path,
        "cell",
        "ivf_index_append",
        ("codebook_md5", "dim"),
        rebuild,
    )


def ann_lsh_topk_sql(
    n_queries: int = 5,
    topk: int = 5,
    dim: int = _DIM,
    n_planes: int | None = None,
    sf_dir: str = "/root/testdata/sf0.01",
) -> str:
    if n_planes is None:
        n_planes = auto_n_planes(_embeddings_rowcount_parquet(sf_dir))
    # plane literals built at the declared width (ADVICE r15: parity
    # for dim<_DIM previously leaned on the md5 family's prefix
    # stability via [lits][i] indexing — an implicit coupling)
    planes = hyperplanes(n_planes, dim)
    bits = []
    for j, plane in enumerate(planes):
        lit = "[" + ", ".join(str(v) for v in plane) + "]"
        d = _DOT_DUCK.format(a="__q", b=lit, n=dim)
        bits.append(f"CASE WHEN {d} >= 0 THEN {2**j} ELSE 0 END")
    bucket = " + ".join(bits)
    dot = _DOT_DUCK.format(a="q.__qq", b="c.__q", n=dim)
    nq = _DOT_DUCK.format(a="q.__qq", b="q.__qq", n=dim)
    nc = _DOT_DUCK.format(a="c.__q", b="c.__q", n=dim)
    return f"""
WITH qz AS (
  SELECT vec_id, __q, cast({bucket} AS INT) AS bucket
  FROM (SELECT vec_id, {_Q_DUCK} AS __q FROM embeddings) z
),
scored AS (
  SELECT q.query_id, c.vec_id, c.bucket,
         round(cast({dot} AS DOUBLE)
               / (sqrt(cast({nq} AS DOUBLE)) * sqrt(cast({nc} AS DOUBLE))), 9) AS cosine
  FROM (SELECT vec_id AS query_id, __q AS __qq, bucket AS qbucket
        FROM qz WHERE vec_id < {n_queries}) q
  JOIN qz c ON c.bucket = q.qbucket
  WHERE c.vec_id <> q.query_id
)
SELECT query_id, vec_id, bucket, cosine, rn FROM (
  SELECT *, cast(row_number() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS INT) AS rn
  FROM scored
) r WHERE rn <= {topk}
ORDER BY query_id, rn
"""


def embedding_neardup_pairs(
    emb: DataFrame,
    threshold: float = 0.9,
    n_planes: int | None = None,
    dim: int | None = None,
    validate_dim: bool = True,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, LSH-bucket candidates only.

    The dedup-by-embedding variant (training-data pipelines): any pair
    with cosine ≥ threshold is a near-dup candidate for collapse. The
    candidate join is a *self* equi-join on the hyperplane bucket —
    O(sum of bucket²) instead of all-pairs, and the bucket count
    auto-sizes with the corpus (:func:`auto_n_planes`) so buckets stay
    executor-sized at 100 TB. The usual LSH recall trade-off
    (cross-bucket pairs missed) is the documented contract — the DuckDB
    twin replicates the bucketing exactly, so the oracle checks the
    implementation, not a stricter ideal.
    """
    b = lsh_buckets(emb, n_planes, dim, validate_dim)
    a = b.select(
        F.col("vec_id").alias("vec_a"),
        F.col("__q").alias("__qa"),
        F.col("__norm").alias("__na"),
        "bucket",
    )
    c = b.select(
        F.col("vec_id").alias("vec_b"),
        F.col("__q").alias("__qb"),
        F.col("__norm").alias("__nb"),
        "bucket",
    )
    joined = a.join(c, on="bucket").where(F.col("vec_a") < F.col("vec_b"))
    cos = _cos(_dot("__qa", "__qb"), F.col("__na"), F.col("__nb"))
    return (
        joined.select("vec_a", "vec_b", cos.alias("cosine"))
        .where(F.col("cosine") >= threshold)
        .orderBy("vec_a", "vec_b")
    )


def embedding_neardup_clusters(
    emb: DataFrame,
    threshold: float = 0.9,
    n_planes: int | None = None,
    dim: int | None = None,
) -> DataFrame:
    """Semantic dedup: collapse cosine-near-dup embeddings into clusters.

    The embedding-side twin of ``dedup.neardup_clusters`` — pairs from
    :func:`embedding_neardup_pairs`, transitive closure via the SAME
    iterative min-label collapse (``dedup.neardup_clusters(pairs=...)``
    — one algorithm, both modalities; drift impossible). Returns
    (vec_id, cluster_id); keep ``min(vec_id)`` per cluster for the
    dedup decision. Same scale shape as the text path: pair generation
    is bucket-bounded, the collapse converges in graph-diameter rounds.
    """
    from .dedup import neardup_clusters

    pairs = embedding_neardup_pairs(emb, threshold, n_planes, dim).select(
        F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b")
    )
    out = neardup_clusters(
        emb.select(F.col("vec_id").alias("doc_id")), pairs=pairs
    )
    return out.select(
        F.col("doc_id").alias("vec_id"), "cluster_id"
    ).orderBy("vec_id")


def embedding_neardup_pairs_sql(
    threshold: float = 0.9,
    dim: int = _DIM,
    n_planes: int | None = None,
    sf_dir: str = "/root/testdata/sf0.01",
) -> str:
    if n_planes is None:
        n_planes = auto_n_planes(_embeddings_rowcount_parquet(sf_dir))
    # declared-width plane literals (ADVICE r15 — same rationale as
    # ann_lsh_topk_sql)
    planes = hyperplanes(n_planes, dim)
    bits = []
    for j, plane in enumerate(planes):
        lit = "[" + ", ".join(str(v) for v in plane) + "]"
        d = _DOT_DUCK.format(a="__q", b=lit, n=dim)
        bits.append(f"CASE WHEN {d} >= 0 THEN {2**j} ELSE 0 END")
    bucket = " + ".join(bits)
    dot = _DOT_DUCK.format(a="a.__q", b="b.__q", n=dim)
    na = _DOT_DUCK.format(a="a.__q", b="a.__q", n=dim)
    nb = _DOT_DUCK.format(a="b.__q", b="b.__q", n=dim)
    return f"""
WITH qz AS (
  SELECT vec_id, __q, cast({bucket} AS INT) AS bucket
  FROM (SELECT vec_id, {_Q_DUCK} AS __q FROM embeddings) z
)
SELECT vec_a, vec_b, cosine FROM (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         round(cast({dot} AS DOUBLE)
               / (sqrt(cast({na} AS DOUBLE)) * sqrt(cast({nb} AS DOUBLE))), 9) AS cosine
  FROM qz a JOIN qz b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
) p WHERE cosine >= {threshold}
ORDER BY vec_a, vec_b
"""


_IVF_SAMPLE = 4096  # codebook training sample bound (rows collected)
_SQDIST = (
    "aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)),"
    " cast(0 as bigint), (acc, v) -> acc + v)"
)
_SQDIST_DUCK = "list_sum(list_transform(range(1, {n} + 1), i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])))"


def _quantize_py(vec) -> list[int]:
    """Driver-side twin of :func:`quantized` (micro-unit integers)."""
    return [int(round(float(x) * _SCALE)) for x in vec]


def _quantize_finite_sample(vecs) -> list[list[int]]:
    """Quantize a codebook training sample, SKIPPING poison vectors
    (NULL, or containing NULL/NaN/Inf) — the driver-side twin of
    :func:`_vector_ok` (round 14): Python ``round(nan)`` raises
    ValueError and ``round(inf)`` OverflowError, so one bad embedding
    in the md5-ordered sample used to kill IVF training on the driver.
    Both the Spark sample (:func:`ivf_codebook`) and the parquet twin
    (:func:`codebook_from_parquet`) filter AFTER taking the same
    sample, so centroids stay bit-identical cross-engine. A poison row
    only ever shrinks the training sample — it is still excluded from
    matching by the NULL-``__q`` path in :func:`quantized`. The
    magnitude bound mirrors :func:`quantized`'s square-sum-safe
    element gate (:func:`_q_elem_bound`, round 15): finite values too
    large for ANY integer consumer (norm, pairwise dot, sq-dist) are
    poison there, so they are poison here (and would otherwise
    overflow the float64 KMeans into ``int(inf)`` on the driver)."""
    import math

    bound = _q_elem_bound(_DIM) / float(_SCALE)
    out = []
    for v in vecs:
        if v is None:
            continue
        fs = [float(x) if x is not None else math.nan for x in v]
        if all(math.isfinite(x) and abs(x) <= bound for x in fs):
            out.append([int(round(x * _SCALE)) for x in fs])
    if not out:
        raise ValueError(
            "IVF codebook training sample has no finite vectors — every "
            "sampled embedding was NULL or contained NaN/Inf"
        )
    return out


def train_ivf_codebook(
    vecs_q: list[list[int]], n_clusters: int, iters: int = 8
) -> list[list[int]]:
    """Deterministic KMeans codebook over micro-unit integer vectors.

    Farthest-point (maxmin) init from index 0, then ``iters`` Lloyd's
    rounds; every tie breaks to the lowest index, means round half-up —
    no RNG, no data-order sensitivity beyond the input list order. The
    returned centroids are micro-unit integers, so downstream cell
    assignment is EXACT integer arithmetic in both engines (same
    determinism trick as :func:`quantized`).

    Training on a bounded sample is the standard IVF shape (FAISS
    trains its coarse quantizer on a corpus sample too); an inexact
    codebook only shifts recall, never correctness of the cell routing.
    """
    import numpy as np

    if not vecs_q:
        raise ValueError(
            "IVF codebook training got an empty sample — the embeddings "
            "table has no rows"
        )
    X = np.asarray(vecs_q, dtype=np.float64)
    k = min(n_clusters, len(X))
    cents = np.empty((k, X.shape[1]))
    cents[0] = X[0]
    d = ((X - cents[0]) ** 2).sum(axis=1)
    for j in range(1, k):
        i = int(np.argmax(d))  # first max on ties — deterministic
        cents[j] = X[i]
        d = np.minimum(d, ((X - cents[j]) ** 2).sum(axis=1))
    for _ in range(iters):
        d2 = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)  # first min on ties
        for j in range(k):
            members = X[assign == j]
            if len(members):
                cents[j] = np.floor(members.mean(axis=0) + 0.5)
    return [[int(v) for v in row] for row in cents]


def ivf_codebook(
    emb: DataFrame,
    n_clusters: int = 16,
    sample_n: int = _IVF_SAMPLE,
    iters: int = 8,
) -> list[list[int]]:
    """Train the IVF coarse quantizer from a bounded corpus sample.

    The sample is the first ``sample_n`` rows in MD5-OF-ID ORDER — a
    deterministic hash shuffle, so on a real corpus where vec_id
    encodes ingest order the codebook trains on a uniform slice of the
    whole corpus, not the earliest shard (an id-prefix sample would).
    Spark executes it as TakeOrderedAndProject (per-partition top-k +
    driver merge — no global sort materialization), so the collect is
    bounded by ``sample_n`` rows however large the corpus is; the
    codebook is driver-sized by construction, like any IVF index. The
    DuckDB twin replays the identical hash order from the same parquet.
    """
    rows = (
        emb.select("vec_id", "embedding")
        .orderBy(F.md5(F.col("vec_id").cast("string")).asc(), F.col("vec_id").asc())
        .limit(sample_n)
        .collect()
    )
    return train_ivf_codebook(
        _quantize_finite_sample([r.embedding for r in rows]), n_clusters, iters
    )


def _lit_arr_spark(vals: list[int]) -> str:
    return "array(" + ", ".join(f"{v}L" for v in vals) + ")"


def with_cells(q: DataFrame, centroids: list[list[int]]) -> DataFrame:
    """Assign each quantized vector to its nearest centroid (``cell``).

    A fused argmin in ONE projection — no row amplification (the k×
    crossJoin shape would shuffle k copies of a 100-TB corpus). The
    k distances come from a single ``transform`` over one
    array-of-centroids literal rather than k separately-built
    ``aggregate`` expressions: the arithmetic per row is identical (a
    runtime loop over k instead of a k-wide expression tree), but the
    plan carries ONE distance expression however large k grows —
    measured 1.40s → 0.51s cold on the assignment subplan at k=16
    (plan compile/init, the dominant cost of a fresh query; a k≈√N
    codebook at real scale would otherwise inline thousands of fold
    expressions). Ties break to the lowest cell id (``array_position``
    finds the first minimum), and distances are exact integers, so the
    DuckDB twin's row_number-over-distance assignment picks identical
    cells.
    """
    cents = F.expr(
        "array(" + ", ".join(_lit_arr_spark(c) for c in centroids) + ")"
    )
    dists = F.transform(
        cents,
        lambda c: F.aggregate(
            F.zip_with(F.col("__q"), c, lambda x, y: (x - y) * (x - y)),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        ),
    )
    return q.withColumn(
        "cell", (F.array_position(dists, F.array_min(dists)) - 1).cast("int")
    )


def with_cells_arrow(q: DataFrame, centroids: list[list[int]]) -> DataFrame:
    """:func:`with_cells` as a vectorized ``mapInArrow`` batch scorer
    (round 19 — guide §4.2): same integer arithmetic, same output.

    Why it exists — two measured costs of the expression form on the
    INDEX side (the corpus-sized one):

    - the k×dim ``zip_with``/``aggregate`` folds are interpreted, not
      codegen'd: ~2.5 CPU-seconds per 2k rows at k=16/dim=64, and the
      per-row cost grows linearly in k (a k≈√N codebook at real scale
      multiplies it);
    - the downstream cell equi-join infers ``isnotnull(cell)``, and
      Catalyst pushes that filter below the scan-side exchange with
      the ENTIRE quantize+assign chain duplicated into it (the guide
      §4.4 trap, pure-JVM form) — measured 1.4s single-task at sf0.1.
      ``mapInArrow`` is opaque to filter pushdown, so the inferred
      filter stays above the exchange and the chain runs exactly once.

    Exactness: the distances are pure int64 arithmetic (numpy int64 ==
    JVM long, overflow excluded by :func:`_q_elem_bound` by the same
    argument the expression form relies on) and ``argmin`` takes the
    FIRST minimum — identical tie-break to ``array_position`` of the
    min. No float enters the assignment. Null semantics mirror the
    fold exactly: a NULL ``__q``, a NULL element, or a width other
    than the codebook's all make every per-centroid fold NULL on the
    JVM side, so the row gets a NULL cell here too (slow path).
    Gate: session conf ``spark_graft.ivf.arrowAssign=false`` restores
    the expression form (:func:`ivf_index` reads it).

    Pass only the columns the consumer needs before calling (guide
    §4.1) — the batch crosses the Python boundary both ways.
    """
    from pyspark.sql import types as T

    cents = [[int(v) for v in c] for c in centroids]
    dim = len(cents[0]) if cents else 0
    out_schema = T.StructType(
        list(q.schema.fields) + [T.StructField("cell", T.IntegerType(), True)]
    )
    qi = q.columns.index("__q")

    def assign(batches):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        C = np.asarray(cents, dtype=np.int64)
        c_sq = (C * C).sum(axis=1)
        for batch in batches:
            col = batch.column(qi)
            n = len(col)
            fast = False
            if n and col.null_count == 0 and dim:
                lens = pc.list_value_length(col).to_numpy(
                    zero_copy_only=False
                )
                flat = col.flatten()
                if flat.null_count == 0 and (lens == dim).all():
                    X = flat.to_numpy(zero_copy_only=False).reshape(
                        n, dim
                    ).astype(np.int64, copy=False)
                    # ||x−c||² = ||x||² − 2x·c + ||c||² — all int64,
                    # bounded by dim·4B² ≤ 2⁶³−1 (see _q_elem_bound)
                    d = (
                        (X * X).sum(axis=1)[:, None]
                        - 2 * (X @ C.T)
                        + c_sq[None, :]
                    )
                    cell = pa.array(
                        d.argmin(axis=1).astype(np.int32), type=pa.int32()
                    )
                    fast = True
            if not fast:
                out: list[int | None] = []
                for row in col.to_pylist():
                    if (
                        row is None
                        or len(row) != dim
                        or any(v is None for v in row)
                    ):
                        out.append(None)
                    else:
                        x = np.asarray(row, dtype=np.int64)
                        dd = ((x[None, :] - C) ** 2).sum(axis=1)
                        out.append(int(dd.argmin()))
                cell = pa.array(out, type=pa.int32())
            yield batch.append_column("cell", cell)

    return q.mapInArrow(assign, out_schema)


def ivf_index(emb: DataFrame, centroids: list[list[int]]) -> DataFrame:
    """Materializable IVF index: the quantized, cell-assigned corpus.

    Build once with a trained codebook (:func:`ivf_codebook`), persist
    or ``write_bucketed(..., by=["cell"])``, then hit it per query
    batch with :func:`ivf_query` — the production shape; the stateless
    :func:`ann_ivf_topk` entry rebuilds per call by contract. Keep the
    ``centroids`` alongside the index (they are driver-sized) — queries
    must be routed with the SAME codebook the cells were assigned with.

    The codebook's shape (n_clusters, dim) AND an order-sensitive
    content digest are stamped into the ``cell`` column's schema
    metadata (round 17 — VERDICT r16 item 1); :func:`ivf_query`
    validates the codebook it is handed against the stamp and raises
    on mismatch — a same-shape-but-different codebook would silently
    route probes to the wrong cells. Survives a parquet round-trip.
    """
    # assignment strategy (round 19): the vectorized mapInArrow scorer
    # by default — it is the guide-§4.2 shape for the corpus-sized
    # side (interpreted k×dim folds off the per-row path, and opaque
    # to the §4.4 inferred-isnotnull pushdown duplication); the
    # session conf restores the pure-expression form for comparison
    # or for Python-worker-free deployments.
    use_arrow = (
        str(
            emb.sparkSession.conf.get("spark_graft.ivf.arrowAssign", "true")
        ).lower()
        != "false"
    )
    if use_arrow:
        idx = with_cells_arrow(
            quantized(emb).select("vec_id", "__q", "__norm"), centroids
        ).select("vec_id", "cell", "__q", "__norm")
    else:
        idx = with_cells(quantized(emb), centroids).select(
            "vec_id", "cell", "__q", "__norm"
        )
    return _stamp_index(idx, "cell", _codebook_stamp(centroids))


def ivf_query(
    index: DataFrame,
    queries: DataFrame,
    centroids: list[list[int]],
    nprobe: int = 4,
    topk: int = 5,
) -> DataFrame:
    """Top-k over a prebuilt :func:`ivf_index` for a batch of queries.

    Probe routing is a (queries × k)-row broadcast join ranked by
    exact integer distance; candidate selection is an equi-join on
    ``cell``. The query batch is broadcast — the corpus-sized index is
    only touched via the cell equi-join.

    An index built by :func:`ivf_index` carries its codebook's shape
    and content digest in the ``cell`` column's schema metadata; the
    ``centroids`` handed in here are validated against it at plan
    build (round 17 — VERDICT r16 item 1) — a different codebook
    (even same-shape) raises loudly instead of silently routing
    probes to wrong cells.
    """
    _check_stamp(
        _read_stamp(index, "cell"), "ivf_query", **_codebook_stamp(centroids)
    )
    qz = quantized(queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("__q").alias("__qq"),
        F.col("__norm").alias("__qn"),
    )
    spark = queries.sparkSession
    # the k-row centroid frame is built from LITERALS, not
    # createDataFrame (round 19): parallelizing a 16-element python
    # list slices it over defaultParallelism partitions, and each of
    # those tasks launches a PYTHON WORKER just to unpickle its slice —
    # measured 9.5s of executor run time (32 workers × ~300 ms) for a
    # frame that broadcasts to a few KB. The literal posexplode stays
    # entirely in the JVM: one task, zero Python workers.
    # range(0, 1, 1, numPartitions=1): the default otherwise slices one
    # row over defaultParallelism near-empty tasks
    cent_df = spark.range(0, 1, 1, 1).select(
        F.posexplode(
            F.expr(
                "array(" + ", ".join(_lit_arr_spark(c) for c in centroids) + ")"
            )
        ).alias("cell", "__c")
    ).select(F.col("cell").cast("int").alias("cell"), "__c")
    # probe routing: n_queries × k rows, ranked by exact integer sq-dist
    pw = Window.partitionBy("query_id").orderBy(
        F.asc("__cdist"), F.asc("cell")
    )
    probes = (
        qz.select("query_id", "__qq")
        .crossJoin(F.broadcast(cent_df))
        .withColumn("__cdist", F.expr(_SQDIST.format(a="__qq", b="__c")))
        .withColumn("prn", F.row_number().over(pw))
        .where(F.col("prn") <= nprobe)
        .select("query_id", "cell")
    )
    joined = (
        index.join(F.broadcast(probes), "cell")
        .join(F.broadcast(qz), "query_id")
        .where(F.col("vec_id") != F.col("query_id"))
    )
    cos = _cos(_dot("__qq", "__q"), F.col("__qn"), F.col("__norm"))
    scored = joined.select("query_id", "vec_id", cos.alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("int"))
        .where(F.col("rn") <= topk)
        .orderBy("query_id", "rn")
    )


def ann_ivf_topk(
    emb: DataFrame,
    n_queries: int = 5,
    topk: int = 5,
    n_clusters: int = 16,
    nprobe: int = 4,
    sample_n: int = _IVF_SAMPLE,
    centroids: list[list[int]] | None = None,
) -> DataFrame:
    """IVF ANN top-k: search only the ``nprobe`` nearest cells per query.

    With k cells and nprobe probes, each query touches ~nprobe/k of the
    corpus. Codebook training is a deterministic driver-side KMeans
    over a bounded sample (:func:`ivf_codebook`); everything after is
    relational: probe routing is a (queries × k)-row broadcast join
    ranked by exact integer distance, candidate selection is an
    equi-join on ``cell``. Scale: k grows with corpus (k ≈ sqrt(N) rule
    of thumb), codebook stays driver-sized.

    CONTRACT SHAPE, NOT DEPLOYMENT SHAPE: this is the stateless
    composition of :func:`ivf_codebook` + :func:`ivf_index` +
    :func:`ivf_query`, retraining the codebook per call because the
    driver's oracle contract requires a self-contained query — the
    heaviest entry in bench for exactly that reason. A deployment
    trains the codebook + materializes :func:`ivf_index` ONCE
    (parquet round-trip pinned by test) and serves with
    :func:`ivf_query` — measured (PLAN_AUDIT round 5): 1.0–1.2s per
    query batch over the materialized index vs ~14s stateless.

    Fully oracle-checked: the DuckDB twin (:func:`ann_ivf_topk_sql`)
    trains the identical codebook from the same parquet sample and
    replicates assignment, probing, and scoring in exact integer
    arithmetic.

    ``centroids`` (round 16 — VERDICT r15 item 8) supplies a
    pre-trained codebook (:func:`ivf_codebook` /
    :func:`codebook_from_parquet`), skipping the per-call training
    job — the session-memoization hook for repeat invocations over
    the same corpus; training is deterministic, so the results are
    identical either way.
    """
    if centroids is None:
        centroids = ivf_codebook(emb, n_clusters, sample_n)
    return ivf_query(
        ivf_index(emb, centroids),
        emb.where(F.col("vec_id") < n_queries),
        centroids,
        nprobe,
        topk,
    )


def codebook_from_parquet(
    sf_dir: str,
    n_clusters: int = 16,
    sample_n: int = _IVF_SAMPLE,
    iters: int = 8,
) -> list[list[int]]:
    """Oracle-side codebook: same sample, same trainer, no Spark.

    Replays :func:`ivf_codebook`'s md5-ordered top-``sample_n`` sample
    straight from the parquet (float32 → Python float is exact in both
    readers; ``hashlib.md5`` of the decimal id string is byte-identical
    to Spark's ``md5(cast(vec_id AS STRING))``) and runs
    :func:`train_ivf_codebook` — bit-identical centroids to
    :func:`ivf_codebook` on the same table.
    """
    import hashlib
    import os

    import pyarrow.parquet as pq

    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    rows = sorted(
        t.to_pylist(),
        key=lambda r: (
            hashlib.md5(str(r["vec_id"]).encode()).hexdigest(),
            r["vec_id"],
        ),
    )[:sample_n]
    return train_ivf_codebook(
        _quantize_finite_sample([r["embedding"] for r in rows]), n_clusters, iters
    )


def ann_ivf_topk_sql(
    n_queries: int = 5,
    topk: int = 5,
    n_clusters: int = 16,
    nprobe: int = 4,
    sample_n: int = _IVF_SAMPLE,
    dim: int = _DIM,
    sf_dir: str = "/root/testdata/sf0.01",
) -> str:
    """DuckDB twin of :func:`ann_ivf_topk` with inlined centroid literals.

    The codebook is retrained from the same parquet sample
    (:func:`codebook_from_parquet`) and inlined as a VALUES list — the
    same inline-the-trained-constants trick :func:`ann_lsh_topk_sql`
    uses for its hyperplanes. Assignment/probing use exact integer
    distances, so cell choices match Spark bit-for-bit.
    """
    centroids = codebook_from_parquet(sf_dir, n_clusters, sample_n)
    cent_values = ",\n    ".join(
        f"({i}, [{', '.join(str(v) for v in c)}]::BIGINT[])"
        for i, c in enumerate(centroids)
    )
    probe_d = _SQDIST_DUCK.format(a="q.__qq", b="c.__c", n=dim)
    assign_d = _SQDIST_DUCK.format(a="z.__q", b="c.__c", n=dim)
    dot = _DOT_DUCK.format(a="q.__qq", b="a.__q", n=dim)
    nq = _DOT_DUCK.format(a="q.__qq", b="q.__qq", n=dim)
    nc = _DOT_DUCK.format(a="a.__q", b="a.__q", n=dim)
    return f"""
WITH qz AS (SELECT vec_id, {_Q_DUCK} AS __q FROM embeddings),
cents(cell, __c) AS (VALUES
    {cent_values}),
queries AS (SELECT vec_id AS query_id, __q AS __qq FROM qz WHERE vec_id < {n_queries}),
probes AS (
  SELECT query_id, cell FROM (
    SELECT q.query_id, c.cell,
           row_number() OVER (PARTITION BY q.query_id
                              ORDER BY {probe_d}, c.cell) AS prn
    FROM queries q CROSS JOIN cents c) p
  WHERE prn <= {nprobe}
),
assigned AS (
  -- __q IS NOT NULL mirrors Spark's NULL-cell drop: a poison vector's
  -- distance fold is NULL, array_position gives a NULL cell, and the
  -- probe equi-join never sees the row (similarity.py with_cells)
  SELECT vec_id, __q, cell FROM (
    SELECT z.vec_id, z.__q, c.cell,
           row_number() OVER (PARTITION BY z.vec_id
                              ORDER BY {assign_d}, c.cell) AS arn
    FROM qz z CROSS JOIN cents c
    WHERE z.__q IS NOT NULL) a
  WHERE arn = 1
),
scored AS (
  SELECT p.query_id, a.vec_id,
         round(cast({dot} AS DOUBLE)
               / (sqrt(cast({nq} AS DOUBLE)) * sqrt(cast({nc} AS DOUBLE))), 9) AS cosine
  FROM probes p
  JOIN assigned a ON a.cell = p.cell
  JOIN queries q ON q.query_id = p.query_id
  WHERE a.vec_id <> p.query_id
)
SELECT query_id, vec_id, cosine, rn FROM (
  SELECT *, cast(row_number() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS INT) AS rn
  FROM scored
) r WHERE rn <= {topk}
ORDER BY query_id, rn
"""


# ---------------------------------------------------------------------------
# int8 scalar quantization (round 7, beyond-reference)
# ---------------------------------------------------------------------------


def quantize_int8(emb: DataFrame, col: str = "embedding") -> DataFrame:
    """Symmetric per-vector int8 scalar quantization — the standard
    4× compression for embedding retrieval (FAISS ``SQ8``): codes =
    ``round(x / (absmax/127))`` in −127..127 plus one double
    ``q_scale`` per vector for dequantization.

    At 100 TB this is a bandwidth feature, not a CPU one: a 64-dim
    float32 vector is 256 B, its int8 codes are 64 B — every scan,
    shuffle and broadcast in the similarity path shrinks ~4× (measured
    in the ``--vectors`` probe along with recall@k). Cosine over
    codes needs NO dequantization — the per-vector scale cancels —
    so downstream scoring is pure integer dot products.

    Deterministic: round() is half-away-from-zero in BOTH Spark
    (BigDecimal HALF_UP) and DuckDB, so codes are cross-engine
    reproducible and hash-gateable. All-zero vectors quantize to
    all-zero codes with ``q_scale`` 0; vectors with NULL/NaN/Inf
    elements quantize to NULL codes and NULL ``q_scale`` (round 14 —
    unguarded, one NaN killed the job at the tinyint cast, and Inf
    made ``absmax`` Inf so every finite element divided to 0 while
    Inf/Inf cast NaN; NULL flows into the shared NULL-never-matches
    cosine path instead).
    """
    x = F.transform(F.col(col), lambda v: v.cast("double"))
    ok = _vector_ok(x)
    absmax = F.array_max(F.transform(x, F.abs))
    scale = absmax / F.lit(127.0)
    codes = F.when(
        ok & (absmax > 0),
        F.transform(
            x, lambda v: F.round(v / scale).cast("tinyint")
        ),
    ).when(ok, F.transform(x, lambda v: F.lit(0).cast("tinyint")))
    return emb.withColumn("codes", codes).withColumn(
        "q_scale", F.when(ok, scale)
    )


def _dot_codes(a: str, b: str) -> F.Column:
    # tinyint*tinyint would overflow ByteType silently — widen in the
    # lambda; 64 dims × 127² accumulates far inside an int, summed
    # into a long
    return F.aggregate(
        F.zip_with(
            F.col(a), F.col(b), lambda x, y: x.cast("int") * y.cast("int")
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def int8_cosine_topk(
    emb: DataFrame, n_queries: int = 5, topk: int = 10
) -> DataFrame:
    """Brute-force cosine top-k over int8 CODES — the compressed twin
    of :func:`cosine_topk` (same join shape, same 9-dp rounding and
    tie-break): cosine of quantized vectors is scale-invariant, so
    scoring is exact integer dot products over the 4×-smaller codes
    with one sqrt at the end. Approximation error vs float cosine is
    the quantization error only (recall@k measured in the
    ``--vectors`` probe). Zero vectors score NULL (undefined cosine)
    and are excluded, matching :func:`cosine_topk`'s domain.
    """
    q = quantize_int8(emb)
    qn = F.sqrt(_dot_codes("codes", "codes").cast("double"))
    # The zero/poison exclusion is phrased over the INPUT column, not
    # the derived norm (round 18): a filter on ``__n`` is pushed below
    # any upstream exchange with the whole interpreted quantize +
    # zip_with chain duplicated into it — the §4.4 pushdown-duplication
    # trap in pure-JVM form, which also serializes the filter onto the
    # pre-exchange task. Equivalent by construction: ``__n > 0`` ⟺
    # the vector is finite (codes non-NULL) AND absmax > 0 (its
    # largest element quantizes to ±127 ≠ 0).
    xd = F.transform(F.col("embedding"), lambda v: v.cast("double"))
    keep = _vector_ok(xd) & (F.array_max(F.transform(xd, F.abs)) > 0)
    base = q.where(keep).select("vec_id", "codes", qn.alias("__n"))
    queries = base.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("codes").alias("__qc"),
        F.col("__n").alias("__qn"),
    )
    joined = F.broadcast(queries).crossJoin(base).where(
        F.col("vec_id") != F.col("query_id")
    )
    cos = _cos(_dot_codes("__qc", "codes"), F.col("__qn"), F.col("__n"))
    scored = joined.select("query_id", "vec_id", cos.alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("int"))
        .where(F.col("rn") <= topk)
        .orderBy("query_id", "rn")
    )


_INT8_DUCK = (
    "list_transform(embedding, x -> cast(round(cast(x AS DOUBLE) / "
    "(list_max(list_transform(embedding, y -> abs(cast(y AS DOUBLE)))) / 127.0)"
    ") AS INT))"
)


def int8_cosine_topk_sql(
    n_queries: int = 5, topk: int = 10, dim: int = _DIM
) -> str:
    """DuckDB twin of :func:`int8_cosine_topk` (codes recomputed
    independently; round is half-away-from-zero in both engines)."""
    dot = _DOT_DUCK.format(a="q.__c", b="c.__c", n=dim)
    nq = _DOT_DUCK.format(a="q.__c", b="q.__c", n=dim)
    nc = _DOT_DUCK.format(a="c.__c", b="c.__c", n=dim)
    return f"""
WITH qz AS (
  SELECT vec_id, {_INT8_DUCK} AS __c FROM embeddings
  WHERE list_max(list_transform(embedding, y -> abs(cast(y AS DOUBLE)))) > 0
),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id,
         round(cast({dot} AS DOUBLE)
               / (sqrt(cast({nq} AS DOUBLE)) * sqrt(cast({nc} AS DOUBLE))), 9) AS cosine
  FROM qz q JOIN qz c ON c.vec_id <> q.vec_id
  WHERE q.vec_id < {n_queries}
)
SELECT query_id, vec_id, cosine, rn FROM (
  SELECT *, cast(row_number() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS INT) AS rn
  FROM scored
) r WHERE rn <= {topk}
ORDER BY query_id, rn
"""


def rp_project(
    emb: DataFrame,
    out_dim: int = 16,
    impl: str = "arrow",
    max_rows_per_task: int | None = None,
    dim: int | None = None,
    validate_dim: bool = True,
) -> DataFrame:
    """Johnson–Lindenstrauss SIGN random projection (Achlioptas 2003):
    each output coordinate is the dot product of the micro-unit
    quantized vector with a deterministic ±1 hyperplane — EXACT long
    integers end to end, so the projection itself is hash-checkable
    cross-engine (no float accumulation order to drift). The planes
    are the same md5-derived family :func:`hyperplanes` feeds LSH —
    LSH keeps only the SIGN of these dots; this keeps the values,
    which is why a 16-dim projection separates what 16 LSH bits can
    only bucket.

    (vec_id, rp array<long>): one scan-side projection, no shuffle —
    the cheap first stage of a project→shortlist→exact-rerank
    pipeline at 100 TB (per-row work drops by dim/out_dim for every
    downstream pairwise score). Cosine is approximately preserved in
    expectation; measured recall@10 vs brute force is the --rp
    probe's output, and the shortlist multiplier is the recall knob.

    TWO IMPLEMENTATIONS, identical output (parity-pinned):
    ``impl="arrow"`` (default) quantizes JVM-side, then runs the
    projection as ONE int64 matrix product per Arrow batch in numpy —
    higher-order folds are interpreted (never whole-stage-codegen'd),
    and 32 folds/row measured ~4s for just 2000×64 vectors, while the
    batched matmul is effectively free; integer matmul is exact, so
    nothing changes cross-engine. ``impl="fold"`` is the pure-JVM
    expression path — the witness that pins the arithmetic without
    Python in the loop.

    ``max_rows_per_task`` (round 15 — VERDICT r14 item 3) bounds the
    Arrow leg's per-task row count by construction: one count job,
    then ``repartition(ceil(n / bound))`` before the projection. On a
    cluster the scan splits already bound task size
    (``spark.sql.files.maxPartitionBytes``); the knob exists for
    single-node runs over persisted/unioned frames whose inherited
    partitioning can hand one Python worker a multi-million-row
    straggler (the 32M rerank boundary, PLAN_AUDIT r14). Leave None on
    gated paths — the count job is the only cost, but the default
    stays zero-overhead.
    """
    dim = _resolve_dim(emb, dim, "rp_project", validate_dim)
    planes = hyperplanes(out_dim, dim)
    q = quantized(emb)
    if max_rows_per_task:
        import math

        n_parts = max(1, math.ceil(emb.count() / max_rows_per_task))
        q = q.repartition(n_parts)
    return q.select("vec_id", _rp_expr(planes, impl).alias("rp"))


def _rp_expr(planes: list[list[int]], impl: str):
    if impl == "fold":
        # unrolled per output coordinate (same Spark 4.1 self-join
        # lambda bind rationale as lsh_buckets); poison embedding →
        # NULL projection (not an array of NULL coordinates), the
        # convention both impls share. Since r15 poison rows carry a
        # NULL-holding ``__q`` (not a whole-NULL one), the whole-array
        # NULL is keyed off the FIRST coordinate: a fold over any
        # NULL-holding or NULL array is NULL, and a clean integer
        # vector always yields a non-NULL dot — one duplicated fold
        # (out_dim+1 total) instead of re-evaluating the norm at every
        # reference like the v2 guard did.
        coords = []
        for plane in planes:
            plane_lit = f"array({', '.join(str(v) + 'L' for v in plane)})"
            coords.append(F.expr(_DOT.format(a="__q", b=plane_lit)))
        return F.when(coords[0].isNotNull(), F.array(*coords))
    if impl != "arrow":
        raise ValueError(f"unknown impl {impl!r} (arrow | fold)")
    import numpy as np
    import pandas as pd

    mat = np.array(planes, dtype=np.int64).T  # dim × out_dim

    def _proj(qcol):
        if qcol.empty:
            return pd.Series([], dtype=object)
        # Poison embeddings (whole-NULL ``__q`` OR NULL-holding since
        # r15's unconditional quantization) project to NULL, matching
        # the fold path (whose aggregate over a NULL-holding array is
        # NULL) — parity-pinned. Arrow surfaces NULL elements as None
        # in object lists or NaN in float64 arrays; both are caught.
        def _clean(a):
            if a is None:
                return None
            arr = np.asarray(a, dtype="float64")
            if arr.shape[0] != mat.shape[0]:
                # a RAGGED row past the plan-build peek degrades to
                # NULL (ADVICE r15 medium): the fold impl's zip_with
                # NULL padding + __pn>0 filter silently degrades the
                # same row, and _peek_dim's residual contract promises
                # the shared NULL-never-matches path — raising here
                # would let ONE corrupt row kill the whole job, the
                # poison-row class r14 removed. The loud caller-bug
                # case (whole-corpus width mismatch) is _peek_dim's.
                return None
            if np.isnan(arr).any():
                return None
            return arr.astype(np.int64)  # exact: |elem| <= ~1.9e8 << 2^53

        cleaned = [_clean(a) for a in qcol]
        mask = [a is not None for a in cleaned]
        out: list = [None] * len(mask)
        rows = [a for a in cleaned if a is not None]
        if rows:
            proj_rows = (np.vstack(rows) @ mat).tolist()  # exact int64
            it = iter(proj_rows)
            out = [next(it) if m else None for m in mask]
        return pd.Series(out)

    proj = F.pandas_udf(_proj, "array<long>")
    return proj(F.col("__q"))


def rp_index(
    emb: DataFrame,
    out_dim: int = 16,
    max_rows_per_task: int | None = None,
    dim: int | None = None,
    validate_dim: bool = True,
) -> DataFrame:
    """Materializable RP shortlist index: the projected corpus
    (vec_id, rp, __pn), eagerly localCheckpointed — the build-once /
    query-many split :func:`ann_index` documents, for the
    project→shortlist→rerank family (round 16 — VERDICT r15 item 8's
    pattern applied to the LAST per-invocation materialization):
    :func:`rp_cosine_topk` and :func:`shortlisted_cosine_topk` each
    used to build this frame themselves, so the composed gate
    (shortlist kind + rerank kind over the SAME corpus) paid the
    projection twice, and every repeat invocation paid it again.
    Build once per (corpus, out_dim), pass via their ``index=``;
    projection is deterministic, so results are identical.

    The resolved (out_dim, dim) are stamped into the ``rp`` column's
    schema metadata (round 17 — VERDICT r16 item 1);
    :func:`rp_cosine_topk` and :func:`shortlisted_cosine_topk`
    validate their own parameters against the stamp and raise on
    mismatch. The stamp survives the localCheckpoint and a parquet
    round-trip."""
    dim = _resolve_dim(emb, dim, "rp_index", validate_dim)
    built = (
        rp_project(
            emb,
            out_dim,
            max_rows_per_task=max_rows_per_task,
            dim=dim,
            validate_dim=False,
        )
        .withColumn("__pn", F.sqrt(_dot("rp", "rp").cast("double")))
        .where(F.col("__pn") > 0)
        .localCheckpoint(eager=True)
    )
    return _stamp_index(built, "rp", {"out_dim": out_dim, "dim": dim})


def rp_index_append(
    new_emb: DataFrame, path: str, max_rows_per_task: int | None = None
) -> None:
    """Grow a parquet-MATERIALIZED :func:`rp_index` in place (round
    17) — project only the new batch with the STAMPED (out_dim, dim)
    and upsert on ``vec_id``; same contract as
    :func:`ann_index_append` (stamp is the source of truth, batch
    width validated, replays are no-ops, grown index row-identical to
    a from-scratch rebuild because the projection is deterministic).
    The in-session localCheckpoint shape needs no append — this is
    for the cross-job parquet deployment of the shortlist index.
    """

    def rebuild(s: dict) -> DataFrame:
        batch = (
            rp_project(
                new_emb,
                s["out_dim"],
                max_rows_per_task=max_rows_per_task,
                dim=s["dim"],
                validate_dim=False,
            )
            .withColumn("__pn", F.sqrt(_dot("rp", "rp").cast("double")))
            .where(F.col("__pn") > 0)
        )
        return _stamp_index(
            batch, "rp", {"out_dim": s["out_dim"], "dim": s["dim"]}
        )

    _grow_index(
        new_emb, path, "rp", "rp_index_append", ("out_dim", "dim"), rebuild
    )


def rp_cosine_topk(
    emb: DataFrame,
    out_dim: int | None = None,
    n_queries: int = 5,
    topk: int = 10,
    max_rows_per_task: int | None = None,
    dim: int | None = None,
    validate_dim: bool = True,
    index: DataFrame | None = None,
) -> DataFrame:
    """:func:`cosine_topk` in the projected space: same query
    broadcast, same 9-dp rounding and tie-break, but every pairwise
    dot is ``out_dim`` wide instead of ``dim`` — the brute-force scan
    you can actually afford as a shortlist stage. Output shape matches
    cosine_topk (query_id, vec_id, cosine, rn); the cosine is the
    PROJECTED-space value (an estimate of the true cosine — rerank
    survivors with the exact scorer when the application needs truth).

    A prebuilt ``index`` (from :func:`rp_index`) carries its resolved
    (out_dim, dim) in the ``rp`` column's schema metadata; both are
    validated here against this call's values at plan build (round 17
    — VERDICT r16 item 1) and a mismatch raises loudly — a different
    ``out_dim`` would silently score in the wrong-width projected
    space, a different ``dim`` means the index was built over a
    different-width corpus than the caller believes.

    ``out_dim=None`` (the default) resolves FROM the stamp when an
    index is given (nothing for the caller to restate — r17 review:
    validating the bare default 16 against a stamp-8 index turned
    previously-correct `rp_cosine_topk(emb, index=idx)` calls into
    spurious raises) and falls back to 16 on the self-built path or
    an unstamped index; an EXPLICIT out_dim keeps the loud mismatch
    raise.
    """
    if index is not None:
        stamp = _read_stamp(index, "rp")
        if out_dim is None and stamp and "out_dim" in stamp:
            out_dim = stamp["out_dim"]
        _check_stamp(stamp, "rp_cosine_topk", out_dim=out_dim, dim=dim)
    if out_dim is None:
        out_dim = 16
    # the projected frame IS the shortlist index (out_dim longs/row —
    # 4× smaller than the input at 32-from-64): materialize it once so
    # the query and candidate branches of the self-join read it
    # instead of each re-running the 32-fold projection (measured 8.6s
    # → ~2s at 2000 vectors; at scale this is the build-once/query-
    # many split ann_index already documents)
    p = (
        index
        if index is not None
        else rp_index(
            emb,
            out_dim,
            max_rows_per_task=max_rows_per_task,
            dim=dim,
            validate_dim=validate_dim,
        )
    )
    queries = p.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("rp").alias("__qq"),
        F.col("__pn").alias("__qn"),
    )
    joined = F.broadcast(queries).crossJoin(p).where(
        F.col("vec_id") != F.col("query_id")
    )
    cos = _cos(_dot("__qq", "rp"), F.col("__qn"), F.col("__pn"))
    scored = joined.select("query_id", "vec_id", cos.alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("int"))
        .where(F.col("rn") <= topk)
        .orderBy("query_id", "rn")
    )


def rp_cosine_topk_sql(
    out_dim: int = 16, n_queries: int = 5, topk: int = 10, dim: int = _DIM
) -> str:
    """DuckDB twin of :func:`rp_cosine_topk`: the plane literals are
    regenerated from the same md5 family and the projection re-derived
    as list folds — integer-exact, so only the final cosine rounds."""
    proj_cols = []
    # declared-width plane literals (ADVICE r15 — same rationale as
    # ann_lsh_topk_sql)
    for j, plane in enumerate(hyperplanes(out_dim, dim)):
        lits = ", ".join(str(v) for v in plane)
        proj_cols.append(
            "list_sum(list_transform(range(1, {n} + 1), "
            "i -> __q[i] * ([{lits}])[i]))".format(n=dim, lits=lits)
        )
    rp = "[" + ", ".join(proj_cols) + "]"
    dot = _DOT_DUCK.format(a="q.rp", b="c.rp", n=out_dim)
    nq = _DOT_DUCK.format(a="q.rp", b="q.rp", n=out_dim)
    nc = _DOT_DUCK.format(a="c.rp", b="c.rp", n=out_dim)
    return f"""
WITH qz AS (SELECT vec_id, {_Q_DUCK} AS __q FROM embeddings),
pz AS (SELECT vec_id, {rp} AS rp FROM qz),
pn AS (SELECT vec_id, rp FROM pz
       WHERE list_sum(list_transform(rp, x -> x * x)) > 0),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id,
         round(cast({dot} AS DOUBLE)
               / (sqrt(cast({nq} AS DOUBLE)) * sqrt(cast({nc} AS DOUBLE))), 9) AS cosine
  FROM pn q JOIN pn c ON c.vec_id <> q.vec_id
  WHERE q.vec_id < {n_queries}
)
SELECT query_id, vec_id, cosine, rn FROM (
  SELECT *, cast(row_number() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS INT) AS rn
  FROM scored
) r WHERE rn <= {topk}
ORDER BY query_id, rn
"""
