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


def test_testdata_zipf_vocab_mode(spark):
    """doc_vocab_size>0 switches documents.text to a Zipf(s=1)
    synthetic vocabulary: deterministic across partitionings,
    discriminative df (head token far above median), planted
    duplicates preserved."""
    from gpu_bdb_spark.testdata_gen import generate_table as gen_td

    a = gen_td(spark, "documents", 0.02, partitions=2, doc_vocab_size=500)
    b = gen_td(spark, "documents", 0.02, partitions=5, doc_vocab_size=500)
    rows_a = sorted(map(tuple, a.collect()))
    assert rows_a == sorted(map(tuple, b.collect()))

    toks = a.select(F.explode(F.split("text", " ")).alias("w"))
    df_counts = (toks.groupBy("w").count().orderBy(F.desc("count"))
                 .collect())
    assert len(df_counts) > 100  # far beyond the 31-word driver vocab
    counts = [r["count"] for r in df_counts]
    # Zipf head/median skew: rank-1 df dwarfs the median df
    assert counts[0] > 10 * counts[len(counts) // 2]

    # planted ~1/500 exact duplicates survive the vocab switch
    n = a.count()
    distinct_texts = a.select("text").distinct().count()
    assert distinct_texts < n


def test_write_event_stream_batches_partition_timeline(spark, tmp_path):
    """VERDICT r05 item 7: the generated multi-batch stream fixture
    must (a) reassemble to exactly the generated events table,
    (b) be time-ordered across files (batch i's max ts <= batch i+1's
    min ts), and (c) span at least one key's timeline across batches —
    the property that exercises cross-batch state carry."""
    from gpu_bdb_spark.testdata_gen import generate_table, write_event_stream

    out = str(tmp_path / "stream")
    write_event_stream(spark, out, 0.001, n_batches=3)
    parts = [spark.read.parquet(f"{out}/f{i}") for i in range(3)]
    expect = sorted(map(tuple,
                        generate_table(spark, "events", 0.001).collect()))
    got = sorted(tuple(r) for p in parts for r in p.collect())
    assert got == expect

    spans = [p.select(F.min("ts"), F.max("ts")).first() for p in parts]
    assert all(p.count() > 0 for p in parts)
    assert spans[0][1] <= spans[1][0] or spans[0][1] <= spans[1][1]
    for i in range(2):
        assert spans[i][1] <= spans[i + 1][0]

    # some user appears in more than one batch
    u0 = {r.user_id for r in parts[0].select("user_id").distinct().collect()}
    u1 = {r.user_id for r in parts[1].select("user_id").distinct().collect()}
    assert u0 & u1
