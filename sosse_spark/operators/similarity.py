"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline; LSH-bucketed (random
hyperplane signs) and IVF-style (nearest-of-k-centroids partitioning)
variants as the scale path — candidate generation touches one bucket
instead of the full corpus, then exact re-scoring within the bucket.

All dot products are JVM-side (`aggregate`/`zip_with`); no Python UDFs.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "cosine_sim",
    "brute_force_topk",
    "hyperplane_signature",
    "lsh_topk",
    "embedding_near_dup_pairs",
]


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))


def cosine_sim(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k per query: cross-join (queries broadcast — the
    query set is the small side), score, per-query window rank.

    → (query_id, vec_id, cos_sim, rank), rank 1..k, ties broken by id.
    """
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("_qvec")
    )
    scored = corpus.select(F.col(id_col), F.col(vec_col)).crossJoin(F.broadcast(q)).select(
        query_id_col,
        id_col,
        F.round(cosine_sim(F.col(vec_col), F.col("_qvec")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes (LCG — stdlib only,
    reproducible across runs/executors)."""
    state = seed
    planes = []
    for _ in range(n_planes):
        v = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            v.append(((state >> 33) / float(1 << 31)) - 1.0)
        n = math.sqrt(sum(x * x for x in v)) or 1.0
        planes.append([x / n for x in v])
    return planes


def hyperplane_signature(vec_col: Column, planes: list[list[float]]) -> Column:
    """Sign-bit signature as an int: bit i = (vec · plane_i) > 0."""
    bits = [
        F.when(
            _dot(vec_col, F.array(*[F.lit(float(x)) for x in p])) > 0, F.lit(1 << i)
        ).otherwise(F.lit(0))
        for i, p in enumerate(planes)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("int")


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: random-hyperplane bucket join, exact rescoring
    within the matching bucket.  At scale the corpus is scanned once,
    shuffled on the (small-int) bucket key; each query probes one bucket."""
    planes = _hyperplanes(dim, n_planes, seed)
    c = corpus.withColumn("_sig", hyperplane_signature(F.col(vec_col), planes))
    q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("_qvec"),
        hyperplane_signature(F.col(vec_col), planes).alias("_sig"),
    )
    scored = c.join(F.broadcast(q), "_sig").select(
        query_id_col,
        id_col,
        F.round(cosine_sim(F.col(vec_col), F.col("_qvec")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 12,
    dim: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: same-LSH-bucket self-join
    then exact cosine ≥ threshold.  (id_a < id_b, cos_sim)."""
    planes = _hyperplanes(dim, n_planes, seed)
    sig = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        hyperplane_signature(F.col(vec_col), planes).alias("_sig"),
    )
    a, b = sig.alias("a"), sig.alias("b")
    pairs = a.join(
        b, (F.col("a._sig") == F.col("b._sig")) & (F.col("a._id") < F.col("b._id"))
    ).select(
        F.col("a._id").alias("id_a"),
        F.col("b._id").alias("id_b"),
        F.round(cosine_sim(F.col("a._v"), F.col("b._v")), 6).alias("cos_sim"),
    )
    return pairs.filter(F.col("cos_sim") >= threshold)
