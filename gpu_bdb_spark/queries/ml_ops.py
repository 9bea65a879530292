"""ML workflow coverage (SURVEY.md §2.9) on the driver's embeddings/
documents tables.

No oracles: ML outputs are verified cost/metric-wise (the reference's own
policy — WSSSE within tolerance utils.py:517-539, metric floors
utils.py:548-581, never label-identity). The driver records rows-only
checks; thresholds are asserted in tests/test_ml.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gpu_bdb_spark.functions import tokenize
from gpu_bdb_spark.io import read_table
from gpu_bdb_spark.operators.ml import (
    embeddings_to_features,
    kmeans_fit,
    logistic_regression_fit,
    naive_bayes_text_fit,
)
from gpu_bdb_spark.queries.registry import register


@register("kmeans_embeddings", tags=("ml", "kmeans"))
def kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-Means (k=8, 20 iters, fixed seed) over the embeddings table:
    per-cluster sizes + global WSSSE (reference q20/q25/q26 shape,
    train_clustering_model utils.py:957-1018)."""
    e = read_table(spark, sf_dir, "embeddings", ["vec_id", "embedding"],
                   hint_broadcast=False)
    feats = embeddings_to_features(e)
    _, pred, wssse = kmeans_fit(feats, k=8, max_iter=20, seed=42)
    return (
        pred.groupBy(F.col("prediction").cast("long").alias("cluster"))
        .agg(F.count(F.lit(1)).alias("n_points"))
        .withColumn("wssse", F.round(F.lit(float(wssse)), 6))
    )


@register("lr_embeddings", tags=("ml", "logistic-regression"))
def lr_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial logistic regression embeddings→label: confusion-matrix
    counts + accuracy (reference q05_utils.py:35-123 build_and_predict)."""
    e = read_table(spark, sf_dir, "embeddings", hint_broadcast=False)
    feats = embeddings_to_features(e).withColumn(
        "label", F.col("label").cast("double"))
    train, test = feats.randomSplit([0.9, 0.1], seed=42)
    _, confusion, accuracy = logistic_regression_fit(train, test)
    return confusion.withColumn("accuracy", F.round(F.lit(float(accuracy)), 6))


@register("nb_text_lang", tags=("ml", "naive-bayes", "text"))
def nb_text_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HashingTF + multinomial Naive Bayes predicting the document `lang`
    label from token arrays (reference q28 sentiment classifier shape,
    q28_utils.py:260-301): per-(label, prediction) counts + accuracy."""
    d = read_table(spark, sf_dir, "documents", ["doc_id", "text", "lang"],
                   hint_broadcast=False).withColumn("tokens", tokenize("text"))
    _, pred, accuracy = naive_bayes_text_fit(d, "tokens", "lang")
    confusion = pred.groupBy(
        F.col("label_idx").cast("long").alias("label"),
        F.col("prediction").cast("long").alias("prediction"),
    ).agg(F.count(F.lit(1)).alias("n"))
    return confusion.withColumn("accuracy", F.round(F.lit(float(accuracy)), 6))
