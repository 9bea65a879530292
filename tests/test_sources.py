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


def test_write_sharded_corpus_ordered_and_complete(spark, sf_dir, tmp_path):
    """The sharded export writes every row exactly once, each shard dir
    holds rows in position order (file order = read order for a single
    parquet file per shard), and a re-export is identical."""
    from gpu_bdb_spark.io import read_table
    from gpu_bdb_spark.operators.sampling import shard_assignments
    from gpu_bdb_spark.sources import write_sharded_corpus

    d = read_table(spark, sf_dir, "documents", ["doc_id", "text"],
                   hint_broadcast=False)
    out = str(tmp_path / "export")
    write_sharded_corpus(d, out, "doc_id", n_shards=4)

    back = spark.read.parquet(out)
    assert back.count() == d.count()
    assert set(r.doc_id for r in back.select("doc_id").collect()) \
        == set(r.doc_id for r in d.select("doc_id").collect())

    expect = {
        (r.doc_id, r.shard, r.position)
        for r in shard_assignments(d, "doc_id", 4).collect()
    }
    got = {(r.doc_id, int(r.shard), r.position)
           for r in back.select("doc_id", "shard", "position").collect()}
    assert got == expect

    # in-file order: positions must be ascending within each shard file
    import glob

    import pyarrow.parquet as pq
    for shard_dir in sorted(glob.glob(f"{out}/shard=*")):
        files = [f for f in glob.glob(f"{shard_dir}/*.parquet")]
        assert len(files) == 1, f"expected one file per shard: {files}"
        pos = pq.read_table(files[0], columns=["position"])["position"]
        vals = pos.to_pylist()
        assert vals == sorted(vals) and vals[0] == 1


def test_compact_parquet_reduces_files(spark, sf_dir, tmp_path):
    """Many tiny files in, ceil(bytes/target) files out, same rows."""
    from gpu_bdb_spark.io import read_table
    from gpu_bdb_spark.sources import compact_parquet

    src = str(tmp_path / "fragmented")
    d = read_table(spark, sf_dir, "lineitem", hint_broadcast=False)
    d.repartition(64).write.parquet(src)
    import glob
    assert len(glob.glob(f"{src}/*.parquet")) == 64

    out = str(tmp_path / "compacted")
    n = compact_parquet(spark, src, out, target_bytes=1 << 30)
    files = glob.glob(f"{out}/*.parquet")
    assert len(files) == n == 1
    assert spark.read.parquet(out).count() == d.count()


def test_sorted_layout_enables_row_group_skipping(spark, sf_dir, tmp_path):
    """After write_sorted_for_skipping on o_orderkey, parquet footer
    min/max ranges are disjoint across files, so a narrow key-range
    predicate could skip all but ~one file; an unsorted write cannot
    skip anything (every file spans the whole range)."""
    import glob

    import pyarrow.parquet as pq

    from gpu_bdb_spark.io import read_table
    from gpu_bdb_spark.sources import write_sorted_for_skipping

    d = read_table(spark, sf_dir, "orders",
                   ["o_orderkey", "o_orderdate"], hint_broadcast=False)

    def file_ranges(path):
        rng = []
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            names = [md.schema.column(j).name
                     for j in range(md.num_columns)]
            col = [md.row_group(i).column(names.index("o_orderkey"))
                   for i in range(md.num_row_groups)]
            stats = [c.statistics for c in col]
            rng.append((min(s.min for s in stats),
                        max(s.max for s in stats)))
        return sorted(rng)

    unsorted = str(tmp_path / "unsorted")
    d.repartition(6).write.parquet(unsorted)
    sorted_p = str(tmp_path / "sorted")
    write_sorted_for_skipping(d, sorted_p, ["o_orderkey"], n_files=6)

    overlaps = lambda r: sum(  # noqa: E731
        1 for a, b in zip(r, r[1:]) if a[1] > b[0])
    r_sorted, r_unsorted = file_ranges(sorted_p), file_ranges(unsorted)
    assert len(r_sorted) >= 4
    assert overlaps(r_sorted) == 0, r_sorted     # disjoint ranges
    assert overlaps(r_unsorted) >= len(r_unsorted) - 1  # all overlap


class TestShardedCorpusDataSource:
    """Custom Python Data Source (Spark 4 API): partition-per-shard
    reads, shard-filter partition pruning, order preservation."""

    @staticmethod
    def _write(spark, sf_dir, tmp):
        from gpu_bdb_spark.io import read_table
        from gpu_bdb_spark.sources import write_sharded_corpus

        d = read_table(spark, sf_dir, "documents", ["doc_id"],
                       hint_broadcast=False)
        out = str(tmp / "shards")
        write_sharded_corpus(d, out, "doc_id", n_shards=8)
        return d, out

    def test_roundtrip_rows_and_order(self, spark, sf_dir, tmp_path):
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        from gpu_bdb_spark.sources.corpus_source import \
            sharded_corpus_datasource

        d, out = self._write(spark, sf_dir, tmp_path)
        spark.dataSource.register(sharded_corpus_datasource())
        r = spark.read.format("sharded_corpus").load(out)
        assert r.count() == d.count()
        assert {f.name for f in r.schema} == {"doc_id", "position", "shard"}
        # read order within each shard partition == stored position
        mid = r.withColumn("_mid", F.monotonically_increasing_id())
        w = Window.partitionBy("shard").orderBy("_mid")
        bad = (mid.withColumn("rp", F.row_number().over(w))
               .filter(F.col("rp") != F.col("position")).count())
        assert bad == 0

    def test_shard_filter_prunes_partitions(self, spark, sf_dir, tmp_path):
        from pyspark.sql import functions as F

        from gpu_bdb_spark.sources.corpus_source import \
            sharded_corpus_datasource

        _, out = self._write(spark, sf_dir, tmp_path)
        spark.dataSource.register(sharded_corpus_datasource())
        # one reader instance per load(): filtered and full scans must
        # come from separate loads (pushdown state lives on the reader)
        full = spark.read.format("sharded_corpus").load(out)
        one = (spark.read.format("sharded_corpus").load(out)
               .filter(F.col("shard") == 3))
        # pushFilters consumed the equality: ONE input partition scanned
        assert one.rdd.getNumPartitions() == 1
        assert full.rdd.getNumPartitions() == 8
        # and the filter is still correct (no rows lost to pruning)
        want = full.collect()
        got = one.collect()
        assert {r["doc_id"] for r in got} == {
            r["doc_id"] for r in want if r["shard"] == 3}

    def test_unsupported_filters_still_applied(self, spark, sf_dir,
                                               tmp_path):
        from pyspark.sql import functions as F

        from gpu_bdb_spark.sources.corpus_source import \
            sharded_corpus_datasource

        _, out = self._write(spark, sf_dir, tmp_path)
        spark.dataSource.register(sharded_corpus_datasource())
        r = spark.read.format("sharded_corpus").load(out)
        # range predicate is NOT consumed by pushFilters → Spark must
        # evaluate it post-scan; result stays correct
        lo = r.filter(F.col("doc_id") < 50)
        assert lo.count() == r.filter("doc_id < 50").count()
        assert all(row["doc_id"] < 50 for row in lo.collect())


def test_zorder_layout_narrows_both_columns(spark, sf_dir, tmp_path):
    """Z-ordered layout: per-file footer ranges shrink on BOTH
    dimensions, where a 1-D sort on col1 leaves col2's per-file ranges
    as wide as the table. Measured as the mean per-file range fraction
    of the table range."""
    import glob

    import pyarrow.parquet as pq

    from gpu_bdb_spark.io import read_table
    from gpu_bdb_spark.sources import (write_sorted_for_skipping,
                                       write_zordered)

    d = read_table(spark, sf_dir, "orders",
                   ["o_orderkey", "o_custkey"], hint_broadcast=False)

    def mean_range_frac(path, col):
        lo_all, hi_all = None, None
        spans = []
        per_file = []
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            names = [md.schema.column(j).name
                     for j in range(md.num_columns)]
            stats = [md.row_group(i).column(names.index(col)).statistics
                     for i in range(md.num_row_groups)]
            lo = min(s.min for s in stats)
            hi = max(s.max for s in stats)
            per_file.append((lo, hi))
            lo_all = lo if lo_all is None else min(lo_all, lo)
            hi_all = hi if hi_all is None else max(hi_all, hi)
        width = hi_all - lo_all
        return sum((h - l) / width for l, h in per_file) / len(per_file)

    one_d = str(tmp_path / "one_d")
    write_sorted_for_skipping(d, one_d, ["o_orderkey"], n_files=8)
    z = str(tmp_path / "zord")
    write_zordered(d, z, "o_orderkey", "o_custkey", n_files=8)

    # 1-D sort: orderkey tight, custkey useless (files span everything)
    assert mean_range_frac(one_d, "o_orderkey") < 0.25
    assert mean_range_frac(one_d, "o_custkey") > 0.8
    # z-order: BOTH columns materially narrowed per file
    assert mean_range_frac(z, "o_orderkey") < 0.65
    assert mean_range_frac(z, "o_custkey") < 0.65
