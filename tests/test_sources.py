"""Round-trip tests for the non-parquet source surface: csv/orc/json
dispatch, the CSV→Parquet load-test ETL, and the lexicon loader."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gpu_bdb_spark.io import read_table
from gpu_bdb_spark.sources import csv_to_parquet, load_word_list, read_source

SCHEMA = T.StructType([
    T.StructField("n_nationkey", T.IntegerType()),
    T.StructField("n_name", T.StringType()),
    T.StructField("n_regionkey", T.IntegerType()),
])


@pytest.fixture(scope="module")
def nation_csv(spark, sf_dir, tmp_path_factory):
    out = tmp_path_factory.mktemp("src") / "nation_csv"
    read_table(spark, sf_dir, "nation", hint_broadcast=False).write.option(
        "sep", "|").mode("overwrite").csv(str(out))
    return str(out)


def test_csv_roundtrip_with_schema(spark, sf_dir, nation_csv):
    df = read_source(spark, nation_csv, "csv", schema=SCHEMA)
    orig = read_table(spark, sf_dir, "nation", hint_broadcast=False)
    assert df.count() == orig.count()
    assert sorted(r.n_name for r in df.collect()) == sorted(
        r.n_name for r in orig.collect())


def test_orc_and_json_roundtrip(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("fmt")
    orig = read_table(spark, sf_dir, "region", hint_broadcast=False)
    for fmt in ("orc", "json"):
        path = str(base / fmt)
        orig.write.format(fmt).mode("overwrite").save(path)
        back = read_source(spark, path, fmt,
                           schema=orig.schema if fmt == "json" else None)
        assert back.count() == orig.count()


def test_unknown_format_rejected(spark):
    with pytest.raises(ValueError, match="unsupported format"):
        read_source(spark, "/nope", "avrox")


def test_csv_to_parquet_etl(spark, nation_csv, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("etl") / "nation_pq")
    csv_to_parquet(spark, nation_csv, out, SCHEMA, target_partitions=2)
    back = spark.read.parquet(out)
    assert back.count() == 25
    assert back.rdd.getNumPartitions() <= 2


def test_word_list_loader(spark, tmp_path_factory):
    p = tmp_path_factory.mktemp("lex") / "pos.txt"
    p.write_text("good\nfine\ngood\n  great \n\n")
    words = load_word_list(spark, str(p), "POS")
    rows = {(r.word, r.sentiment) for r in words.collect()}
    assert rows == {("good", "POS"), ("fine", "POS"), ("great", "POS")}
