"""Similarity search over embedding columns (extension surface required by
BASELINE.json: brute-force cosine top-k baseline + LSH-bucketed scale path).

Embeddings are array<float> columns; all arithmetic happens in Spark
higher-order functions (zip_with / aggregate — JVM codegen, no Python).
"""

from __future__ import annotations

from functools import reduce

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F



def _norm(v: Column) -> Column:
    d = F.transform(v, lambda x: x.cast("double"))
    return F.sqrt(F.aggregate(d, F.lit(0.0), lambda acc, x: acc + x * x))


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: broadcast queries × corpus, per-query heap.

    Returns (query_id, neighbor_id, rank, cosine) excluding self-matches;
    rank breaks score ties by neighbor id (deterministic across engines —
    scores themselves are float and not hash-compared).

    Scale: one pass over the corpus per batch of queries (the broadcast
    side); the window top-k is a per-query heap after a shuffle on
    query_id. For corpus×corpus all-pairs use `lsh_topk`.
    """
    # Hoist norms out of the pair loop: norm(q)/norm(c) are per-vector, so
    # computing them inside the N×M pair expression would triple the work.
    def with_norm(df, id_alias, vec_alias, norm_alias):
        v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
        return df.select(
            F.col(id_col).alias(id_alias), v.alias(vec_alias),
            F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))
            .alias(norm_alias))

    q = F.broadcast(with_norm(queries, "query_id", "q_vec", "q_norm"))
    c = with_norm(corpus, "neighbor_id", "c_vec", "c_norm")
    dot = F.aggregate(
        F.zip_with("q_vec", "c_vec", lambda x, y: x * y),
        F.lit(0.0), lambda acc, x: acc + x)
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", dot / (F.col("q_norm") * F.col("c_norm")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def _bucket_expr(vec_col: str, planes: "np.ndarray") -> Column:
    """Bucket id = sign pattern of dot products against `planes`."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    bits = []
    for i, row in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in row])
        dot = F.aggregate(
            F.zip_with(v, plane, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(
            F.when(dot >= 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
        )
    return reduce(lambda a, b: a + b, bits)


def hyperplane_buckets(
    df: DataFrame,
    vec_col: str,
    dim: int,
    n_planes: int = 12,
    seed: int = 42,
    out_col: str = "bucket",
) -> DataFrame:
    """Random-hyperplane LSH bucket id (sign pattern of `n_planes` dots).

    Hyperplanes come from a seeded RNG so bucketing is deterministic run to
    run. Cosine-similar vectors agree on most sign bits, so near neighbors
    land in the same bucket with high probability.
    """
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    return df.withColumn(out_col, _bucket_expr(vec_col, planes))


def lsh_topk(
    df: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 4,
    n_tables: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate all-pairs top-k: multi-table random-hyperplane LSH.

    Each of `n_tables` independent bucketings hashes a vector to a
    (table, bucket) key; candidate pairs are vectors sharing any table's
    bucket, scored with exact cosine, top-k per query. Recall for a pair
    at angle θ is 1−(1−(1−θ/π)^p)^L — tune p (planes) for bucket size and
    L (tables) for recall.

    Scale: comparisons drop from N² to Σ_tables Σ_buckets size² and the
    shuffle key is (table, bucket). On clustered real-world embeddings
    buckets capture the clusters; on uniformly random vectors (this
    synthetic corpus — top-5 cosine ≈0.32) ANN recall is inherently
    capped, which the recall test accounts for.
    """
    rng = np.random.default_rng(seed)
    per_table = [
        F.struct(
            F.lit(t).alias("tbl"),
            _bucket_expr(vec_col, rng.standard_normal((n_planes, dim))).alias("bkt"),
        )
        for t in range(n_tables)
    ]
    # Candidate generation carries ONLY ids: the bucket self-join and the
    # distinct would otherwise shuffle both 64-dim vectors per candidate
    # pair (measured 57 s vs ~6 s at bench). Vectors re-attach afterwards
    # from the narrow per-vector frame.
    buckets = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array(*per_table)).alias("tb"),
    ).select("id", F.col("tb.tbl").alias("tbl"), F.col("tb.bkt").alias("bkt"))
    candidates = (
        buckets.select("tbl", "bkt", F.col("id").alias("query_id"))
        .join(buckets.select("tbl", "bkt", F.col("id").alias("neighbor_id")),
              ["tbl", "bkt"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    vd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    vecs = df.select(
        F.col(id_col).alias("id"),
        vd.alias("vec"),
        F.sqrt(F.aggregate(vd, F.lit(0.0), lambda a, x: a + x * x)).alias("nrm"),
    )
    dot = F.aggregate(F.zip_with("q_vec", "c_vec", lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    pairs = (
        candidates
        .join(vecs.select(F.col("id").alias("query_id"),
                          F.col("vec").alias("q_vec"),
                          F.col("nrm").alias("q_norm")), "query_id")
        .join(vecs.select(F.col("id").alias("neighbor_id"),
                          F.col("vec").alias("c_vec"),
                          F.col("nrm").alias("c_norm")), "neighbor_id")
        .withColumn("cosine", dot / (F.col("q_norm") * F.col("c_norm")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )
