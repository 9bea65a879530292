"""Source/sink surface beyond plain parquet (SURVEY.md §2.1).

Reference equivalents:
* build_reader format dispatch (readers.py:154-164; csv/orc declared but
  unimplemented there — implemented here, Spark gives them for free).
* CSV→Parquet load test ETL (load_test/gpu_bdb_load_test.py:48-147:
  pipe-delimited CSV + external schema → sized parquet partitions).
* Sentiment word-list source (q10:35-44, q18:176-187: 1-partition word
  frame → here a broadcast DataFrame).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

SUPPORTED_FORMATS = ("parquet", "csv", "orc", "json")


def read_source(
    spark: SparkSession,
    path: str,
    data_format: str = "parquet",
    schema: T.StructType | None = None,
    **options,
) -> DataFrame:
    """Format-dispatching reader (reference build_reader, readers.py:154-164).

    CSV defaults to the TPC pipe-delimited convention when no options are
    given. An explicit schema skips inference — mandatory at scale (schema
    inference is a full extra pass over the data).
    """
    if data_format not in SUPPORTED_FORMATS:
        raise ValueError(
            f"unsupported format {data_format!r}; one of {SUPPORTED_FORMATS}")
    reader = spark.read.format(data_format)
    if schema is not None:
        reader = reader.schema(schema)
    if data_format == "csv":
        opts = {"sep": "|", "header": "false"}
        opts.update(options)
        reader = reader.options(**opts)
    elif options:
        reader = reader.options(**options)
    return reader.load(path)


def csv_to_parquet(
    spark: SparkSession,
    csv_path: str,
    out_path: str,
    schema: T.StructType,
    sep: str = "|",
    target_partitions: int | None = None,
    compression: str = "snappy",
) -> None:
    """Load-test ETL (reference gpu_bdb_load_test.py:48-147): schema-applied
    delimited CSV → snappy parquet, optionally re-sized.

    The reference targets ~2 GB partitions by row-count arithmetic; Spark's
    equivalent policy is `spark.sql.files.maxPartitionBytes` at read time
    plus an optional repartition before write.
    """
    df = read_source(spark, csv_path, "csv", schema=schema, sep=sep)
    if target_partitions:
        df = df.repartition(target_partitions)
    df.write.mode("overwrite").option("compression", compression).parquet(out_path)


def load_word_list(
    spark: SparkSession, path: str, sentiment: str
) -> DataFrame:
    """Sentiment lexicon source (reference q10:35-44): one word per line →
    broadcast (word, sentiment) frame, deduped (q10:38-40 drops dups)."""
    words = (
        spark.read.text(path)
        .select(F.trim(F.col("value")).alias("word"))
        .filter(F.col("word") != "")
        .distinct()
        .withColumn("sentiment", F.lit(sentiment))
    )
    return F.broadcast(words)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 8,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist as a bucketed (+optionally sorted) catalog table.

    Bucketing pre-shuffles the data ONCE at write time; subsequent joins
    and aggregations on the bucket columns read co-located partitions and
    skip their Exchange entirely — the durable version of the reference's
    hand-placed `shuffle(on=[...])` (q02:104, q29:85). At 100 TB, bucket
    the fact tables on their dominant join key and every downstream query
    saves that shuffle. Verified by plan in tests/test_plans.py.
    """
    writer = df.write.mode("overwrite").format("parquet").bucketBy(
        num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def write_sharded_corpus(
    df: DataFrame,
    out_dir: str,
    key_col: str = "doc_id",
    n_shards: int = 8,
) -> None:
    """Training-data export sink: the corpus written as `n_shards`
    hash-sharded parquet directories (shard=K/), each shard's rows in
    its deterministic `position` order (see
    operators.sampling.shard_assignments — content-hash shard + in-shard
    hash rank, the reproducible global shuffle).

    Layout discipline: repartition ON THE SHARD KEY (one task per shard
    → one ordered file per directory) + sortWithinPartitions(position);
    never a global orderBy (a range exchange would serialize the
    export). A trainer streams shard K in order by reading
    `out_dir/shard=K/`; re-running the export reproduces byte-identical
    row order on any cluster/partitioning.
    """
    from gpu_bdb_spark.operators.sampling import shard_assignments

    assign = shard_assignments(df, key_col, n_shards)
    (
        df.join(assign, key_col)
        .repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "position")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(out_dir)
    )


def compact_parquet(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_bytes: int = 512 * 1024 * 1024,
) -> int:
    """Small-file compaction (table maintenance): rewrite a parquet
    directory into ⌈total_bytes / target_bytes⌉ files.

    Streaming sinks and per-batch ingest leave thousands of KB-sized
    files; at 100 TB the scan's task-scheduling and footer-reading
    overhead then dominates I/O. Sizing from the FILESYSTEM byte total
    (not a count() — no data pass) and coalescing to the target keeps
    the rewrite one shuffle-free job. Returns the output file count.
    """
    import glob as _glob
    import os as _os

    total = sum(
        _os.path.getsize(f)
        for f in _glob.glob(f"{path.rstrip('/')}/**/*.parquet",
                            recursive=True))
    n_files = max(1, -(-total // target_bytes))
    spark.read.parquet(path).coalesce(n_files).write.mode(
        "overwrite").parquet(out_path)
    return n_files


def write_sorted_for_skipping(
    df: DataFrame,
    out_path: str,
    sort_cols: list[str],
    n_files: int | None = None,
) -> None:
    """Write parquet laid out for min/max data skipping: range-partition
    and sort by `sort_cols` so each file (and row group) covers a
    NARROW value range — a predicate on those columns then prunes most
    files from the scan via footer statistics alone, before any I/O.

    This is the write-side half of predicate pushdown: pushdown can
    only skip a row group whose stats exclude the predicate, and stats
    only exclude anything when the layout clusters values. The one-time
    repartitionByRange is the price; every later time-range or key-range
    scan pays proportionally to its selectivity instead of the table
    size. (Row-group pruning asserted from parquet footers in
    tests/test_sources.py.)
    """
    part = (df.repartitionByRange(n_files, *sort_cols)
            if n_files else df.repartitionByRange(*sort_cols))
    (
        part.sortWithinPartitions(*sort_cols)
        .write.mode("overwrite").parquet(out_path)
    )
