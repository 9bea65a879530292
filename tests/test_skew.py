"""Salting operators: equivalence to unsalted forms on skewed data, and
AQE skew-split engagement pinned by executed-plan inspection (SCALE.md's
skew claims as evidence, not prose)."""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import functions as F

from gpu_bdb_spark.io import read_table
from gpu_bdb_spark.operators.skew import salted_collect_set, salted_join


def skewed_events(spark, n_rows: int = 200_000, hot_share: float = 0.2,
                  n_users: int = 1000):
    """Deterministic skewed fact table: user 0 owns `hot_share` of all
    rows, the rest spread uniformly — the one-hot-user shape that breaks
    naive hash partitioning."""
    hot = F.pmod(F.xxhash64("id", F.lit("hot")), F.lit(1_000_000))
    return spark.range(n_rows).select(
        F.when(hot < int(hot_share * 1_000_000), F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id", F.lit("u")), F.lit(n_users)))
        .alias("user_id"),
        F.pmod(F.xxhash64("id", F.lit("v")), F.lit(50_000)).alias("value"),
        (F.col("id") % 97).alias("payload"),
    )


@contextmanager
def _confs(spark, **kv):
    old = {k: spark.conf.get(k, None) for k in kv}
    for k, v in kv.items():
        spark.conf.set(k, str(v))
    try:
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_aqe_skew_join_split_engages(spark):
    """A sort-merge join keyed on the hot user must be split by AQE
    (`isSkew=true` in the final plan). Thresholds are lowered to make the
    local 200k-row dataset look like a skewed 100 TB shuffle; the *plan
    reaction* is what transfers to cluster scale."""
    events = skewed_events(spark)
    users = spark.range(1000).select(
        F.col("id").alias("user_id"),
        F.concat(F.lit("name"), F.col("id")).alias("name"))
    with _confs(
        spark,
        **{
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes":
                "8KB",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
        },
    ):
        joined = events.join(users, "user_id").groupBy("name").agg(
            F.count(F.lit(1)).alias("n"))
        # collect() drives THIS DataFrame's QueryExecution, so the cached
        # executedPlan is the AQE-final one (a write would execute a fresh
        # QueryExecution and leave this plan isFinalPlan=false)
        assert len(joined.collect()) == 1000
        plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "isSkew=true" in plan or "skew=true" in plan, plan[:4000]


def test_salted_collect_set_on_hot_key(spark):
    """Equivalence under real 20%-hot-key skew: the salted two-phase
    collect_set returns exactly the naive operator's sets. (The perf side
    is recorded in SCALE.md: no reducer materializes the hot key's raw
    rows, only n_salts distinct-set shards.)"""
    events = skewed_events(spark, n_rows=100_000)
    naive = {
        r.user_id: frozenset(r.vals)
        for r in events.groupBy("user_id")
        .agg(F.collect_set("value").alias("vals")).collect()
    }
    salted = {
        r.user_id: frozenset(r["values"])
        for r in salted_collect_set(events, "user_id", "value", 8).collect()
    }
    assert naive == salted
    assert len(naive[0]) > 10_000  # the hot key really is hot


def test_salted_join_matches_plain_join(spark, sf_dir):
    l = read_table(spark, sf_dir, "lineitem",
                   ["l_orderkey", "l_partkey", "l_quantity"],
                   hint_broadcast=False)
    # skew: fold all orderkeys into 3 hot keys
    skewed = l.withColumn("hot_key", F.pmod("l_orderkey", F.lit(3)))
    dim = spark.createDataFrame(
        [(0, "zero"), (1, "one"), (2, "two")], ["hot_key", "label"])
    plain = (
        skewed.join(dim, "hot_key")
        .groupBy("label").agg(F.count(F.lit(1)).alias("n"),
                              F.sum("l_quantity").alias("q"))
    )
    salted = (
        salted_join(skewed, dim, ["hot_key"], n_salts=4)
        .groupBy("label").agg(F.count(F.lit(1)).alias("n"),
                              F.sum("l_quantity").alias("q"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect()))


def test_salted_collect_set_matches_plain(spark, sf_dir):
    l = read_table(spark, sf_dir, "lineitem", ["l_returnflag", "l_partkey"],
                   hint_broadcast=False)
    plain = {
        r.l_returnflag: frozenset(r.vals)
        for r in l.groupBy("l_returnflag")
        .agg(F.collect_set("l_partkey").alias("vals")).collect()
    }
    salted = {
        r.l_returnflag: frozenset(r["values"])
        for r in salted_collect_set(l, "l_returnflag", "l_partkey", 4).collect()
    }
    assert plain == salted
