"""Distributed datagen: determinism across partitioning, FK consistency,
and scale linearity — the properties that make it usable at any SF."""

from __future__ import annotations

from pyspark.sql import functions as F

from gpu_bdb_spark.datagen import GENERATED_TABLES, generate_table


def test_deterministic_across_partitionings(spark):
    a = generate_table(spark, "store_sales", 0.01, partitions=2)
    b = generate_table(spark, "store_sales", 0.01, partitions=7)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_returns_are_subset_of_sales(spark):
    ss = generate_table(spark, "store_sales", 0.01).select(
        "ss_ticket_number", "ss_item_sk", "ss_customer_sk").distinct()
    sr = generate_table(spark, "store_returns", 0.01).select(
        F.col("sr_ticket_number").alias("ss_ticket_number"),
        F.col("sr_item_sk").alias("ss_item_sk"),
        F.col("sr_customer_sk").alias("ss_customer_sk")).distinct()
    missing = sr.join(ss, ["ss_ticket_number", "ss_item_sk",
                           "ss_customer_sk"], "left_anti")
    assert missing.count() == 0
    assert sr.count() > 0


def test_scale_linearity(spark):
    small = generate_table(spark, "web_sales", 0.05).count()
    big = generate_table(spark, "web_sales", 0.5).count()
    assert 5 <= big / small <= 15  # linear-ish with the fixed floor


def test_all_tables_generate(spark):
    for name in GENERATED_TABLES:
        df = generate_table(spark, name, 0.01)
        assert df.count() > 0, name


def test_generated_data_runs_queries(spark, tmp_path_factory):
    """End-to-end: write the generated dataset and run a few TPCx-BB
    queries over it (sessionization, pairs, returns join)."""
    from gpu_bdb_spark.datagen import write_dataset
    from gpu_bdb_spark.queries.tpcxbb import Tables, tpcxbb_query

    out = str(tmp_path_factory.mktemp("gen"))
    write_dataset(spark, out, sf=0.02)
    # Tables reads with the full schema_for() StructTypes; columns the
    # generator omits surface as nulls (parquet schema-on-read)
    tables = Tables(spark, data_dir=out)

    q2 = tpcxbb_query(2)(spark, tables)
    assert q2.count() >= 0
    q29 = tpcxbb_query(29)(spark, tables)
    assert q29.count() > 0
    q23 = tpcxbb_query(23)(spark, tables)
    assert q23.count() >= 0
