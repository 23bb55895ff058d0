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
    "cosine_topk",
    "cosine_topk_sql",
    "lsh_buckets",
    "ann_lsh_topk",
    "ann_lsh_topk_sql",
    "hyperplanes",
]

_SCALE = 1_000_000
_N_PLANES = 4  # 16 buckets over 500-5M docs; raise for bigger corpora
_DIM = 64


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


def quantized(emb: DataFrame, col: str = "embedding") -> DataFrame:
    """Embeddings as integer micro-unit arrays (exact arithmetic).

    The L2 norm is precomputed per VECTOR (``__norm``) so pairwise
    scoring does one dot product per pair instead of three — the
    per-pair self-dots were ~2/3 of the similarity runtime.
    """
    q = F.transform(
        F.col(col), lambda x: F.round(x.cast("double") * _SCALE).cast("long")
    )
    out = emb.withColumn("__q", q)
    return out.withColumn(
        "__norm", F.sqrt(_dot("__q", "__q").cast("double"))
    )


_DOT = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), cast(0 as bigint), (acc, v) -> acc + v)"


def _dot(a: str, b: str) -> F.Column:
    return F.expr(_DOT.format(a=a, b=b))


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
    cos = F.round(
        _dot("__qq", "__q").cast("double") / (F.col("__qn") * F.col("__norm")),
        9,
    )
    scored = joined.select("query_id", "vec_id", cos.alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("int"))
        .where(F.col("rn") <= topk)
        .orderBy("query_id", "rn")
    )


_Q_DUCK = f"list_transform(embedding, x -> cast(round(cast(x AS DOUBLE) * {_SCALE}) AS BIGINT))"
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


def lsh_buckets(emb: DataFrame, n_planes: int = _N_PLANES) -> DataFrame:
    """Random-hyperplane bucket id per vector (sign-bit concatenation)."""
    planes = hyperplanes(n_planes)
    q = quantized(emb)
    bucket = None
    for j, plane in enumerate(planes):
        plane_lit = f"array({', '.join(str(v) + 'L' for v in plane)})"
        d = F.expr(_DOT.format(a="__q", b=plane_lit))
        bit = F.when(d >= 0, F.lit(2**j)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return q.withColumn("bucket", bucket.cast("int"))


def ann_lsh_topk(emb: DataFrame, n_queries: int = 5, topk: int = 5) -> DataFrame:
    """ANN top-k: candidates limited to the query's LSH bucket.

    The candidate join is an equi-join on ``bucket`` — with B buckets
    it touches ~1/B of the corpus per query instead of all of it;
    recall is traded for the usual LSH bound. Scale path: bucket count
    grows with corpus (n_planes ≈ log2(corpus / target_bucket_size)).
    """
    b = lsh_buckets(emb)
    queries = b.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("__q").alias("__qq"),
        F.col("__norm").alias("__qn"),
        F.col("bucket").alias("qbucket"),
    )
    cand = b.select("vec_id", "__q", "__norm", "bucket")
    joined = (
        F.broadcast(queries)
        .join(cand, F.col("bucket") == F.col("qbucket"))
        .where(F.col("vec_id") != F.col("query_id"))
    )
    cos = F.round(
        _dot("__qq", "__q").cast("double") / (F.col("__qn") * F.col("__norm")),
        9,
    )
    scored = joined.select("query_id", "vec_id", F.col("bucket"), cos.alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("int"))
        .where(F.col("rn") <= topk)
        .orderBy("query_id", "rn")
    )


def ann_lsh_topk_sql(n_queries: int = 5, topk: int = 5, dim: int = _DIM) -> str:
    planes = hyperplanes()
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


def embedding_neardup_pairs(emb: DataFrame, threshold: float = 0.9) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, LSH-bucket candidates only.

    The dedup-by-embedding variant (training-data pipelines): any pair
    with cosine ≥ threshold is a near-dup candidate for collapse. The
    candidate join is a *self* equi-join on the hyperplane bucket —
    O(sum of bucket² ) instead of all-pairs; at 100 TB, raise
    ``_N_PLANES`` so buckets stay executor-sized. The usual LSH recall
    trade-off (cross-bucket pairs missed) is the documented contract —
    the DuckDB twin replicates the bucketing exactly, so the oracle
    checks the implementation, not a stricter ideal.
    """
    b = lsh_buckets(emb)
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
    cos = F.round(
        _dot("__qa", "__qb").cast("double") / (F.col("__na") * F.col("__nb")),
        9,
    )
    return (
        joined.select("vec_a", "vec_b", cos.alias("cosine"))
        .where(F.col("cosine") >= threshold)
        .orderBy("vec_a", "vec_b")
    )


def embedding_neardup_pairs_sql(threshold: float = 0.9, dim: int = _DIM) -> str:
    planes = hyperplanes()
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


def ivf_index(emb: DataFrame, n_clusters: int = 16, seed: int = 42):
    """IVF coarse quantizer: KMeans centroids + per-vector assignment.

    The other standard ANN scale path (next to hyperplane LSH): train a
    small KMeans codebook, route every vector to its nearest centroid,
    search only the probed cells. Returns ``(assigned, centroids)``
    where ``assigned`` = emb + ``cell`` column and ``centroids`` is the
    local list of centroid vectors (k × dim floats — driver-sized by
    construction, like any IVF codebook).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    vecs = emb.withColumn("__v", array_to_vector(F.col("embedding").cast("array<double>")))
    model = KMeans(k=n_clusters, seed=seed, featuresCol="__v", predictionCol="cell").fit(vecs)
    assigned = model.transform(vecs).drop("__v")
    centroids = [list(map(float, c)) for c in model.clusterCenters()]
    return assigned, centroids


def _nearest_cells(vec: list[float], centroids: list[list[float]], nprobe: int) -> list[int]:
    def d2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    order = sorted(range(len(centroids)), key=lambda i: d2(vec, centroids[i]))
    return order[:nprobe]


def ann_ivf_topk(
    emb: DataFrame,
    n_queries: int = 5,
    topk: int = 5,
    n_clusters: int = 16,
    nprobe: int = 4,
    seed: int = 42,
) -> DataFrame:
    """IVF ANN top-k: search only the ``nprobe`` nearest cells per query.

    With k cells and nprobe probes, each query touches ~nprobe/k of the
    corpus. The query→cell routing happens on the driver against the
    k×dim codebook (IVF's standard shape); the candidate join is an
    equi-join on ``cell``. Scale: k grows with corpus
    (k ≈ sqrt(N) rule of thumb), codebook stays driver-sized.

    Not SQL-expressible (KMeans training) — registered with the
    rows-only oracle; recall vs brute force is pinned in
    tests/test_similarity.py.
    """
    from pyspark.storagelevel import StorageLevel

    assigned, centroids = ivf_index(emb, n_clusters, seed)
    # three consumers (query collect, candidate side, broadcast query
    # side) would each re-run KMeans assignment + quantization over the
    # whole corpus — persist one materialization
    q = quantized(assigned).persist(StorageLevel.MEMORY_AND_DISK)

    queries_local = (
        q.where(F.col("vec_id") < n_queries)
        .select("vec_id", "embedding")
        .collect()
    )  # n_queries rows — driver-side routing against the codebook only
    probe_rows = [
        (int(r.vec_id), cell)
        for r in queries_local
        for cell in _nearest_cells([float(x) for x in r.embedding], centroids, nprobe)
    ]
    spark = emb.sparkSession
    probes = spark.createDataFrame(probe_rows, "query_id long, cell int")

    queries = q.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("__q").alias("__qq"),
        F.col("__norm").alias("__qn"),
    )
    cand = (
        F.broadcast(probes)
        .join(q.select("vec_id", "cell", "__q", "__norm"), "cell")
        .join(F.broadcast(queries), "query_id")
        .where(F.col("vec_id") != F.col("query_id"))
    )
    cos = F.round(
        _dot("__qq", "__q").cast("double") / (F.col("__qn") * F.col("__norm")),
        9,
    )
    scored = cand.select("query_id", "vec_id", cos.alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("int"))
        .where(F.col("rn") <= topk)
        .orderBy("query_id", "rn")
    )
