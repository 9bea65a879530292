"""ML workflow operators — pyspark.ml wrappers mirroring the reference's
model steps (SURVEY.md §2.9).

Reference equivalents:
* K-Means (8 clusters, 20 iters) + WSSSE — utils.py:957-1018,
  q20_utils.py:64-89 (used by q20/q25/q26).
* Logistic regression + standardization + precision/AUC — q05_utils.py:35-123.
* Multinomial Naive Bayes on hashed text features — q28_utils.py:63-103,
  260-301 (HashingVectorizer 2^23; the reference notes "Spark is doing
  2^20" q28_utils.py:36 — we use 2^18 locally, a constructor arg).

All seeds are fixed: verification is cost/metric-based, matching the
reference's tolerance checks (utils.py:517-581), never label-identity.
"""

from __future__ import annotations

from pyspark.ml.classification import LogisticRegression, NaiveBayes
from pyspark.ml.clustering import KMeans
from pyspark.ml.evaluation import MulticlassClassificationEvaluator
from pyspark.ml.feature import HashingTF, StringIndexer
from pyspark.ml.functions import array_to_vector
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def embeddings_to_features(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """array<float> → ml Vector `features` column (no Python UDF —
    pyspark.ml.functions.array_to_vector is JVM-side)."""
    return df.withColumn(
        "features",
        array_to_vector(F.transform(F.col(vec_col), lambda x: x.cast("double"))),
    )


def kmeans_fit(
    df: DataFrame,
    k: int = 8,
    max_iter: int = 20,
    seed: int = 42,
    features_col: str = "features",
):
    """K-Means with the reference's hyperparameters (8 clusters, 20 iters,
    utils.py:970-979); returns (model, predictions, wssse)."""
    km = KMeans(k=k, maxIter=max_iter, seed=seed, featuresCol=features_col)
    model = km.fit(df)
    pred = model.transform(df)
    wssse = model.summary.trainingCost  # reference WSSSE (utils.py:1008-1012)
    return model, pred, wssse


def logistic_regression_fit(
    train: DataFrame,
    test: DataFrame,
    label_col: str = "label",
    features_col: str = "features",
    max_iter: int = 50,
):
    """LR classifier + per-(label, prediction) confusion counts and
    accuracy (reference q05_utils.py:75-123 precision/confusion outputs)."""
    lr = LogisticRegression(
        maxIter=max_iter, labelCol=label_col, featuresCol=features_col,
        family="multinomial",
    )
    model = lr.fit(train)
    pred = model.transform(test)
    confusion = (
        pred.groupBy(
            F.col(label_col).cast("long").alias("label"),
            F.col("prediction").cast("long").alias("prediction"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    evaluator = MulticlassClassificationEvaluator(
        labelCol=label_col, predictionCol="prediction", metricName="accuracy")
    accuracy = evaluator.evaluate(pred)
    return model, confusion, accuracy


def naive_bayes_text_fit(
    df: DataFrame,
    tokens_col: str,
    label_col: str,
    num_features: int = 2**18,
    smoothing: float = 0.001,
):
    """HashingTF + multinomial NaiveBayes over token arrays (reference
    q28_utils.py:63-103: HashingVectorizer n_features=2^23, alpha=.001).

    Returns (model, predictions, accuracy); label strings are indexed
    alphabetically for determinism.
    """
    indexer = StringIndexer(
        inputCol=label_col, outputCol="label_idx", stringOrderType="alphabetAsc")
    indexed = indexer.fit(df).transform(df)
    tf = HashingTF(inputCol=tokens_col, outputCol="features",
                   numFeatures=num_features)
    featured = tf.transform(indexed)
    nb = NaiveBayes(labelCol="label_idx", featuresCol="features",
                    smoothing=smoothing, modelType="multinomial")
    train, test = featured.randomSplit([0.9, 0.1], seed=42)  # q28:44
    model = nb.fit(train)
    pred = model.transform(test)
    evaluator = MulticlassClassificationEvaluator(
        labelCol="label_idx", predictionCol="prediction", metricName="accuracy")
    return model, pred, evaluator.evaluate(pred)
