"""Similarity search over embedding columns (training-data extension).

Brute-force cosine top-k as the exact baseline, and a random-hyperplane
LSH-bucketed variant as the scale path. Embeddings are plain
``array<float>`` columns; all arithmetic runs JVM-side via higher-order
functions (zip_with/aggregate) in double precision — no Python in the hot
path.

Scale shape: brute force is queries x corpus — fine when the query side is
small and broadcast (the common "probe a candidate set" case). The LSH
variant buckets both sides by hyperplane sign bits so each query only
scores its bucket's collisions; planes are derived deterministically from
(seed, plane, dim) hash arithmetic, so signatures are reproducible across
runs and engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot(a, b):
    """Exact-order double dot product of two array columns (JVM-side)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a):
    return F.sqrt(dot(a, a))


def cosine(a, b):
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    query_vec: str = "q_embedding",
    corpus_vec: str = "embedding",
    broadcast_queries: bool = True,
) -> DataFrame:
    """Exact brute-force cosine top-k: (query_id, vec_id, cos) per query.

    Query side broadcast (no shuffle of the corpus); per-query top-k via a
    window on the joined score — ties broken by corpus id for determinism.
    """
    q = F.broadcast(queries) if broadcast_queries else queries
    scored = q.crossJoin(corpus).select(
        query_id,
        corpus_id,
        cosine(F.col(query_vec), F.col(corpus_vec)).alias("cos"),
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("cos"), F.col(corpus_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .drop("rank")
    )


def _plane_component(seed: int, plane: int, dim_idx):
    """Deterministic pseudo-gaussian-ish plane component in [-1, 1)."""
    h = F.xxhash64(F.lit(seed), F.lit(plane), dim_idx)
    return (F.pmod(h, F.lit(2_000_001)).cast("double") - 1_000_000.0) / 1_000_000.0


def hyperplane_signature(
    vec, n_planes: int = 16, seed: int = 42
):
    """Sign-bit LSH signature (long) of an embedding column."""
    sig = F.lit(0).cast("long")
    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.transform(F.sequence(F.lit(0), F.size(vec) - 1),
                            lambda i: _plane_component(seed, p, i)),
                lambda x, c: x.cast("double") * c,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        sig = sig + F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return sig


def lsh_cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_planes: int = 12,
    seed: int = 42,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    query_vec: str = "q_embedding",
    corpus_vec: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only signature-bucket collisions.

    Recall is tunable via n_planes (fewer planes = bigger buckets = higher
    recall/cost). Use cosine_topk for exactness; this is the 100 TB path
    where the corpus cannot be brute-forced per query.
    """
    qb = queries.withColumn("_sig", hyperplane_signature(F.col(query_vec), n_planes, seed))
    cb = corpus.withColumn("_sig", hyperplane_signature(F.col(corpus_vec), n_planes, seed))
    scored = (
        F.broadcast(qb)
        .join(cb, on="_sig")
        .select(query_id, corpus_id, cosine(F.col(query_vec), F.col(corpus_vec)).alias("cos"))
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("cos"), F.col(corpus_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .drop("rank")
    )
