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

from pyspark.sql import Column, DataFrame, SparkSession
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


def zorder_key(c1, c2, bits: int = 21):
    """Z-order (Morton) key: interleave the low `bits` bits of two
    non-negative integer columns — rows close on the space-filling
    curve are close in BOTH dimensions, so sorting by this one key
    clusters files/row groups for min/max skipping on either column
    (the layout trick behind Delta's OPTIMIZE ZORDER, as a plain
    column expression).

    Built-ins only (shiftleft/shiftright/bit and/or), codegen'd, and
    engine-portable: the identical expression exists in DuckDB SQL, so
    the key itself is exactly oracle-able. 2·bits ≤ 63 keeps the result
    in a signed long.
    """
    from pyspark.sql import functions as F

    a = F.col(c1) if isinstance(c1, str) else c1
    b = F.col(c2) if isinstance(c2, str) else c2
    key = F.lit(0).cast("long")
    for i in range(bits):
        abit = F.shiftright(a.cast("long"), i).bitwiseAND(F.lit(1))
        bbit = F.shiftright(b.cast("long"), i).bitwiseAND(F.lit(1))
        key = key.bitwiseOR(F.shiftleft(abit, 2 * i)) \
                 .bitwiseOR(F.shiftleft(bbit, 2 * i + 1))
    return key


def zorder_key_normalized(c1, c2, lo1, hi1, lo2, hi2, bits: int = 10):
    """Z-order key over MIN-MAX-NORMALIZED columns: each value is
    scaled to [0, 2^bits) with pure integer arithmetic
    ((v−lo)·(2^bits−1)) div (hi−lo) before interleaving. Normalization
    is what makes the curve work on real columns — raw-bit interleave
    degrades to a 1-D sort whenever one column spans more bits than
    the other (the high bits of the wider column dominate the key).
    Exact BIGINT ops throughout → engine-portable and oracle-able."""
    from pyspark.sql import functions as F

    top = F.lit((1 << bits) - 1).cast("long")

    def norm(c, lo, hi):
        c = (F.col(c) if isinstance(c, str) else c).cast("long")
        lo = lo if isinstance(lo, Column) else F.lit(int(lo)).cast("long")
        hi = hi if isinstance(hi, Column) else F.lit(int(hi)).cast("long")
        span = F.greatest(hi - lo, F.lit(1).cast("long"))
        scaled = (c - lo) * top
        return (scaled - F.pmod(scaled, span)) / span

    return zorder_key(norm(c1, lo1, hi1).cast("long"),
                      norm(c2, lo2, hi2).cast("long"), bits)


def write_zordered(
    df: DataFrame,
    out_path: str,
    col1: str,
    col2: str,
    n_files: int | None = None,
    bits: int = 10,
) -> None:
    """Two-dimensional data-skipping layout: range-partition + sort by
    the normalized Z-order key of (col1, col2). Unlike
    `write_sorted_for_skipping` on col1 alone — which leaves col2's
    per-file ranges as wide as the table — the curve bounds BOTH
    columns' footer ranges per file, so predicates on either column
    prune (asserted from parquet footers in tests/test_sources.py).
    Bounds come from one tiny min/max aggregate broadcast back."""
    from pyspark.sql import functions as F

    bounds = df.agg(
        F.min(col1).cast("long").alias("_lo1"),
        F.max(col1).cast("long").alias("_hi1"),
        F.min(col2).cast("long").alias("_lo2"),
        F.max(col2).cast("long").alias("_hi2"))
    z = df.crossJoin(F.broadcast(bounds)).withColumn(
        "_zkey",
        zorder_key_normalized(col1, col2,
                              F.col("_lo1"), F.col("_hi1"),
                              F.col("_lo2"), F.col("_hi2"), bits),
    ).drop("_lo1", "_hi1", "_lo2", "_hi2")
    part = (z.repartitionByRange(n_files, "_zkey")
            if n_files else z.repartitionByRange("_zkey"))
    (
        part.sortWithinPartitions("_zkey").drop("_zkey")
        .write.mode("overwrite").parquet(out_path)
    )


def upsert_parquet(
    spark: SparkSession,
    base_path: str,
    updates: DataFrame,
    key_col: str,
    out_path: str,
) -> DataFrame:
    """MERGE-style upsert for plain parquet tables (the maintenance op
    lakehouse formats provide as MERGE INTO, on the format this engine
    actually ships): rows whose key appears in `updates` are replaced,
    new keys are appended, everything else is carried over unchanged.

    One LEFT ANTI join (base minus updated keys — broadcast when the
    update batch is small, which is the normal ingest shape) + UNION +
    write. The rewrite cost is proportional to the BASE table — that is
    inherent to copy-on-write parquet; at 100 TB the same operator runs
    per partition-directory so only touched partitions rewrite (pair it
    with `write_sharded_corpus`/partitionBy layouts).

    Returns the merged DataFrame as re-read from `out_path`.
    """
    base = spark.read.parquet(base_path)
    cols = base.columns
    keep = base.join(
        F.broadcast(updates.select(key_col)), key_col, "left_anti")
    merged = keep.select(*cols).unionByName(updates.select(*cols))
    merged.write.mode("overwrite").parquet(out_path)
    return spark.read.parquet(out_path)


def delete_keys_parquet(
    spark: SparkSession,
    base_path: str,
    delete_keys: DataFrame,
    key_col: str,
    out_path: str,
) -> DataFrame:
    """Copy-on-write DELETE for plain parquet tables — the
    right-to-erasure / retention-policy maintenance op (lakehouse
    DELETE FROM, on the format this engine ships): rows whose key
    appears in `delete_keys` are dropped, everything else is rewritten
    verbatim.

    One LEFT ANTI join (broadcast — a deletion batch is dimension-sized
    by nature) + write. Copy-on-write cost is proportional to the BASE
    table; at 100 TB run it per partition-directory so only partitions
    containing deleted keys rewrite, and pair with a key→partition
    index (e.g. the zorder layout) to find them without a full scan.

    Returns the surviving table as re-read from `out_path`.
    """
    base = spark.read.parquet(base_path)
    kept = base.join(
        F.broadcast(delete_keys.select(key_col).distinct()),
        key_col, "left_anti")
    kept.write.mode("overwrite").parquet(out_path)
    return spark.read.parquet(out_path)
