"""Similarity search over embedding columns: brute-force cosine top-k
(correctness baseline) and random-hyperplane LSH bucketing (scale path).

North-star extension (BASELINE.json). Design for 100 TB:

* brute-force — broadcast the (small) query set against the corpus; the
  corpus never shuffles, and per-query top-k is a TakeOrdered-style window
  that keeps k rows per partition before the final merge.
* LSH — 16 fixed random hyperplanes (seeded, deterministic) → one 16-bit
  bucket key per vector → candidates are bucket collisions (optionally
  multi-probe by flipping one bit). Corpus shuffles ONCE on the bucket key;
  recall/cost tuned by n_planes and n_probes.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions import vectors


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k for each query vector.

    Output: (query_id, rank, vec_id, cos). Self-matches excluded; ties
    broken by vec_id so results are deterministic."""
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
        )
    )
    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cv"))
    scored = (
        c.crossJoin(q)
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("cos", vectors.cosine("cv", "qv"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", F.round("cos", 6).alias("cos"))
    )


def hyperplanes(dim: int, n_planes: int = 16, seed: int = 42) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def bucket_key(vec_col: Column | str, planes: list[list[float]]) -> Column:
    """Sign-bit bucket key: bit i = 1 iff dot(vec, plane_i) >= 0."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    key = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(float(x)) for x in plane])
        d = F.aggregate(
            F.zip_with(v.cast("array<double>"), p, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        key = key + F.when(d >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return key


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: score only candidates in the query's hyperplane
    bucket. One shuffle of the corpus on the bucket key; at 100 TB the
    bucket count (2^n_planes) is sized so each bucket fits an executor."""
    planes = hyperplanes(dim, n_planes, seed)
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("cv"),
        bucket_key(vec_col, planes).alias("bk"),
    )
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qv"),
            bucket_key(vec_col, planes).alias("bk"),
        )
    )
    scored = (
        c.join(q, "bk")
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("cos", vectors.cosine("cv", "qv"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", F.round("cos", 6).alias("cos"))
    )
