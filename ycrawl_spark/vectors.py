"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline (JVM-side zip_with /
aggregate — no Python), plus an LSH-bucketed variant (random-
hyperplane signs) as the scale path: at 10^9 vectors the cross join is
infeasible; LSH buckets cut candidates by orders of magnitude and the
exact re-rank runs only within buckets.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window as W, functions as F


def _as_double(col: str):
    return F.transform(F.col(col), lambda x: x.cast("double"))


def with_norm(df: DataFrame, emb_col: str = "embedding") -> DataFrame:
    dot_self = F.aggregate(
        F.zip_with(_as_double(emb_col), _as_double(emb_col), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return df.withColumn("norm", F.sqrt(dot_self))


def cosine_topk(df: DataFrame, query_ids: list[int], k: int = 3,
                id_col: str = "vec_id", emb_col: str = "embedding") -> DataFrame:
    """Exact top-k cosine neighbors for each query id (excluding self).

    Plan shape: broadcast the tiny query side, JVM-side dot products,
    per-query window rank. No UDFs, no collect.
    """
    base = with_norm(df, emb_col).select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(emb_col).alias("emb_n"),
        F.col("norm").alias("norm_n"),
    )
    queries = with_norm(df.filter(F.col(id_col).isin(query_ids)), emb_col).select(
        F.col(id_col).alias("query_id"),
        _as_double(emb_col).alias("emb_q"),
        F.col("norm").alias("norm_q"),
    )
    dot = F.aggregate(
        F.zip_with("emb_q", "emb_n", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    scored = (
        base.join(F.broadcast(queries), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos_sim", dot / (F.col("norm_q") * F.col("norm_n")))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cos_sim", 4).alias("cos_sim"))
    )


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    return np.random.Generator(np.random.PCG64(seed)).standard_normal((n_planes, dim))


def lsh_bucket_col(emb_col: str, planes: np.ndarray):
    """Signed-random-projection bucket id, JVM-side: sign bits of the
    dot products with fixed hyperplanes (literal arrays → zip_with)."""
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(v)) for v in p])
        dot = F.aggregate(
            F.zip_with(_as_double(emb_col), plane, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(dot > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def ann_lsh_topk(df: DataFrame, query_ids: list[int], k: int = 3, n_planes: int = 6,
                 seed: int = 42, id_col: str = "vec_id",
                 emb_col: str = "embedding") -> DataFrame:
    """Approximate NN: candidates share an LSH bucket; exact cosine
    re-rank within bucket. Recall < 1 by design — the scale path."""
    dim = len(df.select(emb_col).first()[0])
    planes = hyperplanes(dim, n_planes, seed)
    bucketed = with_norm(df, emb_col).withColumn(
        "bucket", lsh_bucket_col(emb_col, planes)
    )
    base = bucketed.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(emb_col).alias("emb_n"),
        F.col("norm").alias("norm_n"),
        "bucket",
    )
    queries = bucketed.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        _as_double(emb_col).alias("emb_q"),
        F.col("norm").alias("norm_q"),
        F.col("bucket").alias("bucket_q"),
    )
    dot = F.aggregate(
        F.zip_with("emb_q", "emb_n", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    scored = (
        base.join(
            F.broadcast(queries),
            (F.col("bucket") == F.col("bucket_q"))
            & (F.col("query_id") != F.col("neighbor_id")),
        )
        .withColumn("cos_sim", dot / (F.col("norm_q") * F.col("norm_n")))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cos_sim", 4).alias("cos_sim"))
    )


def label_norm_stats(df: DataFrame, emb_col: str = "embedding") -> DataFrame:
    """Per-label mean vector norm — embedding-column sanity aggregate."""
    return (
        with_norm(df, emb_col)
        .groupBy("label")
        .agg(F.round(F.avg("norm"), 3).alias("avg_norm"), F.count("*").alias("n"))
    )
