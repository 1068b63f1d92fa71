"""Similarity search over embedding columns: brute-force cosine top-k
(the exact baseline) and hyperplane-LSH-bucketed ANN (the scale path).

Scale design: brute force is a broadcast of the (small) query set against
the full embedding table — one scan, no shuffle of the big side, fully
JVM-side arithmetic. The LSH variant assigns every vector to a bucket via
fixed random-hyperplane sign bits (one scan, one narrow column added),
and queries probe only their own bucket: cost drops from O(N) per query
to O(N / 2^bits), the standard recall/cost dial. An IVF build would swap
the bucket assignment for nearest-centroid; the probe-side plumbing is
identical.
"""

from __future__ import annotations

import random
from typing import List, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from hindex_spark.operators.dedup import cosine_expr

N_PLANES = 8
_DIM = 64


def hyperplanes(dim: int = _DIM, n_planes: int = N_PLANES, seed: int = 42) -> List[List[float]]:
    """Deterministic 'random' hyperplanes (seeded, reproducible in the
    oracle as literal arrays)."""
    rng = random.Random(seed)
    return [
        [round(rng.uniform(-1.0, 1.0), 6) for _ in range(dim)] for _ in range(n_planes)
    ]


def _dot_literal(vec: Column, plane: Sequence[float]) -> Column:
    dv = F.transform(vec, lambda x: x.cast("double"))
    lit = F.array(*[F.lit(float(v)) for v in plane])
    return F.aggregate(F.zip_with(dv, lit, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x)


def lsh_bucket(vec: Column, planes: List[List[float]]) -> Column:
    """Sign-bit bucket id: bit j set iff dot(vec, plane_j) >= 0."""
    out = F.lit(0).cast("long")
    for j, p in enumerate(planes):
        out = out + F.when(_dot_literal(vec, p) >= 0, F.lit(2 ** j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return out


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
) -> DataFrame:
    """Exact cosine top-k: broadcast the query set, rank per query.
    Output: (q_id, vec_id, cosine, rank)."""
    joined = embeddings.crossJoin(F.broadcast(queries))
    scored = joined.select(
        F.col(q_id_col),
        F.col(id_col),
        F.round(cosine_expr(F.col(vec_col), F.col(q_vec_col)), 6).alias("cosine"),
    ).filter(F.col(q_id_col) != F.col(id_col))
    w = Window.partitionBy(q_id_col).orderBy(F.col("cosine").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id_col, id_col, "cosine", "rank")
    )


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
    dim: int = _DIM,
    seed: int = 42,
) -> DataFrame:
    """ANN: probe only the query's hyperplane bucket, exact rank inside.
    Same output shape as brute_force_topk (approximate contents)."""
    planes = hyperplanes(dim, N_PLANES, seed)
    emb_b = embeddings.withColumn("bucket", lsh_bucket(F.col(vec_col), planes))
    q_b = queries.withColumn("bucket", lsh_bucket(F.col(q_vec_col), planes))
    joined = emb_b.join(F.broadcast(q_b), "bucket")
    scored = joined.select(
        F.col(q_id_col),
        F.col(id_col),
        F.round(cosine_expr(F.col(vec_col), F.col(q_vec_col)), 6).alias("cosine"),
    ).filter(F.col(q_id_col) != F.col(id_col))
    w = Window.partitionBy(q_id_col).orderBy(F.col("cosine").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id_col, id_col, "cosine", "rank")
    )
