"""Salting operators: equivalence to unsalted forms on skewed data."""

from __future__ import annotations

from pyspark.sql import functions as F

from gpu_bdb_spark.io import read_table
from gpu_bdb_spark.operators.skew import salted_collect_set, salted_join


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
