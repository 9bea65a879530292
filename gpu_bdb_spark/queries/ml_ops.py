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


TARGET_ENCODE_ORACLE = """
WITH o AS (
  SELECT o_custkey,
         CAST(o_orderpriority = '1-URGENT' AS INT) AS y
  FROM orders
),
seg AS (
  SELECT c.c_mktsegment AS cat, o.y
  FROM o JOIN customer c ON o.o_custkey = c.c_custkey
),
prior AS (
  SELECT CAST(SUM(y) AS BIGINT) AS sy, CAST(COUNT(*) AS BIGINT) AS n
  FROM seg
),
enc AS (
  SELECT cat, CAST(COUNT(*) AS BIGINT) AS n_cat,
         CAST(SUM(y) AS BIGINT) AS sy_cat
  FROM seg GROUP BY cat
)
SELECT e.cat,
       e.n_cat,
       ROUND(CAST(e.sy_cat AS DOUBLE) / CAST(e.n_cat AS DOUBLE), 6)
         AS raw_rate,
       ROUND((CAST(e.sy_cat AS DOUBLE)
              + 20.0 * (CAST(p.sy AS DOUBLE) / CAST(p.n AS DOUBLE)))
             / (CAST(e.n_cat AS DOUBLE) + 20.0), 6) AS encoded
FROM enc e, prior p
"""


@register("target_encode", oracle=TARGET_ENCODE_ORACLE,
          tags=("ml", "feature-engineering", "encoding"))
def target_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed mean target encoding of the customer market segment
    against urgent-order propensity — the standard high-cardinality
    categorical feature transform: encoded = (Σy + m·prior)/(n + m),
    m = 20. Two aggregates (per-category + global prior), the prior
    rides a broadcast crossJoin; every number is an IEEE expression of
    exact integer counts rounded once — engine-exact. At 100 TB the
    encoding table is dimension-sized and broadcast-joins back to the
    fact for application."""
    o = read_table(spark, sf_dir, "orders",
                   ["o_custkey", "o_orderpriority"], hint_broadcast=False)
    c = read_table(spark, sf_dir, "customer",
                   ["c_custkey", "c_mktsegment"], hint_broadcast=False)
    seg = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("cat"),
        (F.col("o_orderpriority") == "1-URGENT").cast("int").alias("y"))
    prior = seg.agg(F.sum("y").cast("long").alias("sy"),
                    F.count(F.lit(1)).cast("long").alias("n"))
    enc = seg.groupBy("cat").agg(
        F.count(F.lit(1)).cast("long").alias("n_cat"),
        F.sum("y").cast("long").alias("sy_cat"))
    return enc.crossJoin(F.broadcast(prior)).select(
        "cat", "n_cat",
        F.round(F.col("sy_cat").cast("double")
                / F.col("n_cat").cast("double"), 6).alias("raw_rate"),
        F.round((F.col("sy_cat").cast("double")
                 + 20.0 * (F.col("sy").cast("double")
                           / F.col("n").cast("double")))
                / (F.col("n_cat").cast("double") + 20.0), 6)
        .alias("encoded"),
    )


CALIBRATION_ORACLE = """
WITH cust AS (
  SELECT c_custkey, c_acctbal FROM customer
),
scored AS (
  SELECT c.c_custkey,
         CAST(ntile(10) OVER (ORDER BY c.c_acctbal, c.c_custkey) AS INT)
           AS score_bin,
         CAST(EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT') AS INT) AS y
  FROM cust c
)
SELECT score_bin,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(AVG(CAST(y AS DOUBLE)), 6) AS outcome_rate
FROM scored GROUP BY score_bin
"""


@register("calibration_bins", oracle=CALIBRATION_ORACLE,
          tags=("ml", "evaluation", "calibration"))
def calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability-diagram bins: customers deciled by a score (account
    balance standing in for a model score; full (value, id) tie-break
    so the ntile is a total order), outcome = placed an urgent order —
    the calibration table every deployed scorer ships with. One
    left-semi-shaped existence join for the label, one total-order
    decile window over the dimension-sized customer frame, one
    aggregate. AVG of 0/1 ints rounds once — engine-exact."""
    from pyspark.sql import Window

    c = read_table(spark, sf_dir, "customer",
                   ["c_custkey", "c_acctbal"], hint_broadcast=False)
    o = read_table(spark, sf_dir, "orders",
                   ["o_custkey", "o_orderpriority"], hint_broadcast=False)
    urgent = (o.filter(F.col("o_orderpriority") == "1-URGENT")
              .select(F.col("o_custkey").alias("c_custkey")).distinct()
              .withColumn("y", F.lit(1)))
    w = Window.orderBy(F.col("c_acctbal"), F.col("c_custkey"))
    scored = (
        c.join(F.broadcast(urgent), "c_custkey", "left")
        .select("c_custkey", "c_acctbal",
                F.coalesce("y", F.lit(0)).alias("y"))
        .withColumn("score_bin", F.ntile(10).over(w).cast("int"))
    )
    return scored.groupBy("score_bin").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.avg(F.col("y").cast("double")), 6).alias("outcome_rate"))


AUC_ORACLE = """
WITH lab AS (
  SELECT c.c_custkey,
         CAST(c.c_acctbal AS DOUBLE) AS score,
         CAST(EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT') AS INT) AS y
  FROM customer c
),
rk AS (
  SELECT y,
         CAST(rank() OVER (ORDER BY score) AS BIGINT) AS r,
         CAST(COUNT(*) OVER (PARTITION BY score) AS BIGINT) AS tie_n
  FROM lab
),
mid AS (
  -- midrank = rank + (ties-1)/2, kept rational: 2*midrank is integer
  SELECT y, 2 * r + tie_n - 1 AS mr2 FROM rk
),
agg AS (
  SELECT CAST(SUM(CASE WHEN y = 1 THEN mr2 ELSE 0 END) AS BIGINT) AS s2,
         CAST(SUM(y) AS BIGINT) AS n1,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM mid
)
SELECT n1 AS n_pos, n - n1 AS n_neg,
       ROUND((CAST(s2 AS DOUBLE) / 2.0
              - CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) + 1.0) / 2.0)
             / (CAST(n1 AS DOUBLE) * CAST(n - n1 AS DOUBLE)), 6) AS auc
FROM agg
"""


@register("auc_exact", oracle=AUC_ORACLE,
          tags=("ml", "evaluation", "auc", "rank-sum"))
def auc_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT ROC AUC by the Mann–Whitney rank-sum identity with
    midranks for ties — AUC = (Σ midrank(pos) − n₁(n₁+1)/2)/(n₁n₀) —
    over the acctbal-score / urgent-order-label frame that
    `calibration_bins` bins. Tie midranks stay RATIONAL (2·midrank =
    2·rank + ties − 1 is an integer), so the whole statistic is exact
    integer arithmetic until one fixed-order IEEE finishing expression.
    One total-order rank window over the dimension-sized frame + one
    aggregate — no pairwise comparisons (the naive AUC is n₁·n₀
    pairs)."""
    from pyspark.sql import Window

    c = read_table(spark, sf_dir, "customer",
                   ["c_custkey", "c_acctbal"], hint_broadcast=False)
    o = read_table(spark, sf_dir, "orders",
                   ["o_custkey", "o_orderpriority"], hint_broadcast=False)
    urgent = (o.filter(F.col("o_orderpriority") == "1-URGENT")
              .select(F.col("o_custkey").alias("c_custkey")).distinct()
              .withColumn("y", F.lit(1)))
    lab = (c.join(F.broadcast(urgent), "c_custkey", "left")
           .select(F.col("c_acctbal").cast("double").alias("score"),
                   F.coalesce("y", F.lit(0)).alias("y")))
    rk = lab.select(
        "y",
        F.rank().over(Window.orderBy("score")).cast("long").alias("r"),
        F.count(F.lit(1)).over(Window.partitionBy("score"))
        .cast("long").alias("tie_n"))
    mid = rk.select("y", (2 * F.col("r") + F.col("tie_n") - 1).alias("mr2"))
    agg = mid.agg(
        F.sum(F.when(F.col("y") == 1, F.col("mr2")).otherwise(0))
        .cast("long").alias("s2"),
        F.sum("y").cast("long").alias("n1"),
        F.count(F.lit(1)).cast("long").alias("n"))
    n1d = F.col("n1").cast("double")
    n0d = (F.col("n") - F.col("n1")).cast("double")
    return agg.select(
        F.col("n1").alias("n_pos"),
        (F.col("n") - F.col("n1")).alias("n_neg"),
        F.round((F.col("s2").cast("double") / 2.0
                 - n1d * (n1d + 1.0) / 2.0) / (n1d * n0d), 6).alias("auc"))
