"""Driver-testdata-shaped deterministic generator (TPC-H-ish star
schema + events/documents/embeddings), for scale sweeps ABOVE the
driver-provided sf0.1.

The driver ships read-only sf0.001/0.01/0.1 under /root/testdata; the
correctness harness compares Spark vs DuckDB on the SAME parquet, so a
sweep at a larger SF only needs schema- and domain-faithful data, not
the driver's exact seed. Every column derives from xxhash64 of the row
id (datagen.py's discipline): embarrassingly parallel, repeatable,
partitioning-independent.

Faithfulness notes (measured against the sf0.01/0.1 driver tables):
key ranges (custkey/partkey/suppkey 0-based dense), value windows
(orders 1995-01-01..2001-08-01, totalprice ≤ 5e5, lineitem shipdate ≤
orderdate+95d, events confined to Jan 2024 with '{"k": n}' props), the
64-name part vocabulary (8 adjectives × 8 nouns — `frequent_triples`'
dense regime), Customer#%09d names (SymSpell linkage neighbors), the
31-word document vocabulary with ~1/500 planted duplicate texts, and
the 5-way lang split with 'en' at ~42%.

Usage: python -m gpu_bdb_spark.testdata_gen <out_dir> <sf> [doc_vocab]
(doc_vocab=0 -> driver-faithful 31-word vocabulary; >0 -> Zipf(s=1)
synthetic vocabulary of that size for similarity-join certification).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

US_DAY = 86_400_000_000
ORDER_DAY0 = (dt.date(1995, 1, 1) - dt.date(1970, 1, 1)).days
ORDER_DAYS = 2404  # .. 2001-08-01
EVENT_US0 = (dt.date(2024, 1, 1) - dt.date(1970, 1, 1)).days * US_DAY
EVENT_SPAN_US = 30 * US_DAY  # Jan 2024

REGIONS = ("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST")
SEGMENTS = ("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
            "MACHINERY")
PRIORITIES = ("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
              "5-LOW")
P_ADJ = ("blue", "cold", "hot", "large", "new", "old", "red", "small")
P_NOUN = ("anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod",
          "widget")
P_TYPES = ("ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD")
EVENT_TYPES = ("click", "view", "purchase", "signup", "error")
LANGS = ("de", "es", "fr", "zh")
DOC_VOCAB = (
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
)


def _h(*cols) -> Column:
    return F.xxhash64(*cols)


def _mod(col: Column, n: int) -> Column:
    return F.pmod(col, F.lit(int(n)))


def _u(seed: Column, salt: str) -> Column:
    """Deterministic uniform [0,1)."""
    return (_mod(_h(seed, F.lit(salt)), 1_000_000).cast("double")
            / 1_000_000.0)


def _pick(seed: Column, salt: str, values: tuple) -> Column:
    arr = F.array(*[F.lit(v) for v in values])
    return F.element_at(
        arr, (_mod(_h(seed, F.lit(salt)), len(values)) + 1).cast("int"))


def sizes(sf: float) -> dict[str, int]:
    return {
        "customer": max(100, int(150_000 * sf)),
        "supplier": max(20, int(10_000 * sf)),
        "part": max(100, int(200_000 * sf)),
        "orders": max(1000, int(1_500_000 * sf)),
        "events": max(1000, int(1_000_000 * sf)),
        "documents": max(100, int(50_000 * sf)),
        # driver counts are sublinear (500 @0.01 → 2000 @0.1): ~x^0.6
        "embeddings": max(100, int(500 * (sf / 0.01) ** 0.602)),
        "users": max(10, int(15_000 * sf)),
    }


def generate_table(spark: SparkSession, name: str, sf: float,
                   partitions: int | None = None,
                   doc_vocab_size: int = 0) -> DataFrame:
    """doc_vocab_size=0 reproduces the driver's 31-word document
    vocabulary; >0 switches documents.text to a Zipf(s=1) synthetic
    vocabulary of that size (realistic skewed df for similarity-join
    certification at large SF)."""
    n = sizes(sf)
    parts = partitions or max(4, spark.sparkContext.defaultParallelism)

    def ranged(count: int) -> DataFrame:
        return spark.range(0, count, 1, min(parts, max(1, count // 1000)))

    i = F.col("id")
    if name == "region":
        return spark.createDataFrame(
            [(k, r) for k, r in enumerate(REGIONS)],
            "r_regionkey INT, r_name STRING")
    if name == "nation":
        return ranged(25).select(
            i.cast("int").alias("n_nationkey"),
            F.concat(F.lit("NATION_"), i).alias("n_name"),
            _mod(i, 5).cast("int").alias("n_regionkey"))
    if name == "customer":
        return ranged(n["customer"]).select(
            i.alias("c_custkey"),
            F.format_string("Customer#%09d", i).alias("c_name"),
            _mod(_h(i, F.lit("cnat")), 25).cast("int").alias("c_nationkey"),
            F.round(-1000.0 + _u(i, "cbal") * 11_000.0, 2)
            .alias("c_acctbal"),
            _pick(i, "cseg", SEGMENTS).alias("c_mktsegment"))
    if name == "supplier":
        return ranged(n["supplier"]).select(
            i.alias("s_suppkey"),
            F.format_string("Supplier#%09d", i).alias("s_name"),
            _mod(_h(i, F.lit("snat")), 25).cast("int").alias("s_nationkey"),
            F.round(_u(i, "sbal") * 10_000.0, 2).alias("s_acctbal"))
    if name == "part":
        return ranged(n["part"]).select(
            i.alias("p_partkey"),
            F.concat(_pick(i, "padj", P_ADJ), F.lit(" "),
                     _pick(i, "pnoun", P_NOUN)).alias("p_name"),
            F.concat(F.lit("Brand#"),
                     (_mod(_h(i, F.lit("pbr")), 25) + 1)).alias("p_brand"),
            _pick(i, "ptyp", P_TYPES).alias("p_type"),
            (_mod(_h(i, F.lit("psz")), 50) + 1).cast("int").alias("p_size"),
            F.round(900.0 + _mod(i, 1000).cast("double") / 10.0, 1)
            .alias("p_retailprice"))
    if name == "orders":
        day = _mod(_h(i, F.lit("oday")), ORDER_DAYS) + F.lit(ORDER_DAY0)
        return ranged(n["orders"]).select(
            i.alias("o_orderkey"),
            _mod(_h(i, F.lit("ocust")), n["customer"]).alias("o_custkey"),
            _pick(i, "ostat", ("P", "O", "F")).alias("o_orderstatus"),
            F.round(1000.0 + _u(i, "oprice") * 499_000.0, 2)
            .alias("o_totalprice"),
            F.timestamp_micros(day * US_DAY).alias("o_orderdate"),
            _pick(i, "oprio", PRIORITIES).alias("o_orderpriority"))
    if name == "lineitem":
        ok = (i / 7).cast("long")
        ln = _mod(i, 7) + 1
        n_lines = _mod(_h(ok, F.lit("lcnt")), 7) + 1
        oday = _mod(_h(ok, F.lit("oday")), ORDER_DAYS) + F.lit(ORDER_DAY0)
        sday = oday + 1 + _mod(_h(i, F.lit("lship")), 95)
        return (
            ranged(n["orders"] * 7)
            .filter(ln <= n_lines)
            .select(
                ok.alias("l_orderkey"),
                _mod(_h(i, F.lit("lpart")), n["part"]).alias("l_partkey"),
                _mod(_h(i, F.lit("lsupp")), n["supplier"])
                .alias("l_suppkey"),
                ln.cast("int").alias("l_linenumber"),
                (_mod(_h(i, F.lit("lqty")), 50) + 1).cast("double")
                .alias("l_quantity"),
                F.round(900.0 + _u(i, "lprice") * 104_100.0, 2)
                .alias("l_extendedprice"),
                (_mod(_h(i, F.lit("ldisc")), 11).cast("double") / 100.0)
                .alias("l_discount"),
                (_mod(_h(i, F.lit("ltax")), 9).cast("double") / 100.0)
                .alias("l_tax"),
                _pick(i, "lret", ("A", "N", "R")).alias("l_returnflag"),
                _pick(i, "lst", ("F", "O")).alias("l_linestatus"),
                F.timestamp_micros(sday * US_DAY).alias("l_shipdate"))
        )
    if name == "events":
        return ranged(n["events"]).select(
            i.alias("event_id"),
            F.timestamp_micros(
                F.lit(EVENT_US0) + _mod(_h(i, F.lit("ets")),
                                        EVENT_SPAN_US)).alias("ts"),
            _mod(_h(i, F.lit("euser")), n["users"]).alias("user_id"),
            _pick(i, "etyp", EVENT_TYPES).alias("event_type"),
            F.round(0.01 + _u(i, "eval") * 490.0, 2).alias("value"),
            F.format_string(
                '{"k": %d}', _mod(_h(i, F.lit("ek")), 100)).alias("props"))
    if name == "documents":
        # ~1/500 documents reuse the previous id's text (planted
        # exact duplicates, as in the driver tables)
        seed = F.when((_mod(_h(i, F.lit("ddup")), 500) == 0)
                      & (i > 0), i - 1).otherwise(i)
        length = _mod(_h(seed, F.lit("dlen")), 91) + 10
        if doc_vocab_size > 0:
            # Zipf(s=1) over a synthetic vocabulary w1..wV via the
            # log-uniform inverse CDF: u~U[0,1) -> rank=floor(V^u) has
            # density ~1/rank. Gives the skewed df a REAL corpus has,
            # so posting lists / prefix filters / LSH buckets
            # discriminate (the 31-word driver vocab is degenerate at
            # sf>=1 - see SCALE.md round-9 sweep exclusions).
            words = F.transform(
                F.sequence(F.lit(1), length),
                lambda j: F.concat(F.lit("w"), F.floor(F.pow(
                    F.lit(float(doc_vocab_size)),
                    F.pmod(F.xxhash64(seed, j, F.lit("dw")),
                           F.lit(1_000_000)).cast("double")
                    / 1_000_000.0)).cast("long")))
        else:
            vocab = F.array(*[F.lit(w) for w in DOC_VOCAB])
            words = F.transform(
                F.sequence(F.lit(1), length),
                lambda j: F.element_at(
                    vocab, (F.pmod(F.xxhash64(seed, j, F.lit("dw")),
                                   F.lit(len(DOC_VOCAB))) + 1).cast("int")))
        text = F.array_join(words, " ")
        return ranged(n["documents"]).select(
            i.alias("doc_id"),
            text.alias("text"),
            F.when(_u(i, "dlang") < 0.42, F.lit("en"))
            .otherwise(_pick(i, "dl2", LANGS)).alias("lang"),
            F.concat(F.lit("src"),
                     _mod(_h(i, F.lit("dsrc")), 20)).alias("source"),
            F.length(text).cast("long").alias("n_chars"))
    if name == "embeddings":
        vec = F.transform(
            F.sequence(F.lit(0), F.lit(63)),
            lambda j: (F.pmod(F.xxhash64(i, j, F.lit("emb")),
                              F.lit(1_000_000)).cast("double")
                       / 1_000_000.0 - 0.5).cast("float"))
        return ranged(n["embeddings"]).select(
            i.alias("vec_id"),
            vec.alias("embedding"),
            _mod(_h(i, F.lit("elab")), 10).cast("int").alias("label"))
    raise ValueError(f"unknown table {name}")


TESTDATA_TABLES = ("region", "nation", "customer", "supplier", "part",
                   "orders", "lineitem", "events", "documents",
                   "embeddings")


def write_testdata(spark: SparkSession, out_dir: str, sf: float,
                   partitions: int | None = None,
                   doc_vocab_size: int = 0) -> None:
    """Write all driver-shaped tables in the driver layout: ONE
    parquet FILE per table at {out}/{table}.parquet (DuckDB's scan
    takes file paths, not directories — single-file is the shared
    denominator of both engines' readers).

    Row groups are pinned to 32MB (production distributed-writer
    layout). A coalesce(1) write under the default block size produced
    ONE row group per table (177MB decompressed for sf1 lineitem),
    which (a) serializes every scan — a row group is read by exactly
    one task, so a 32-core scan ran 1 real + 25 empty tasks, measured
    2.1× slower than the 32MB layout on a 3-column aggregate — and
    (b) OOMs a default 1g heap in reader column-chunk buffers alone
    when a plan scans the same file twice concurrently (SCALE.md
    round 16, the reader-buffer class). Content is unaffected: the
    generator is hash-based and bit-stable, so oracle hashes are
    identical across layouts."""
    import glob
    import os
    import shutil

    out = out_dir.rstrip("/")
    os.makedirs(out, exist_ok=True)
    for name in TESTDATA_TABLES:
        df = generate_table(spark, name, sf, partitions, doc_vocab_size)
        tmp = f"{out}/_tmp_{name}"
        (df.coalesce(1).write.mode("overwrite")
         .option("parquet.block.size", 32 * 1024 * 1024).parquet(tmp))
        part = glob.glob(f"{tmp}/part-*.parquet")[0]
        final = f"{out}/{name}.parquet"
        if os.path.exists(final):
            os.unlink(final)
        os.rename(part, final)
        shutil.rmtree(tmp)


def write_event_stream(spark: SparkSession, out_dir: str, sf: float,
                       n_batches: int = 3,
                       doc_vocab_size: int = 0) -> None:
    """Write the generated `events` table as `n_batches` TIME-ORDERED
    single-file parquet directories f0..f{n-1} under `out_dir` — the
    canonical multi-batch streaming fixture (VERDICT r05 item 7):
    `spark.readStream.option("maxFilesPerTrigger", 1).parquet(out/"f*")`
    replays them one micro-batch each, in event-time order, with every
    key's timeline spanning batch boundaries (global event-time cuts at
    1/n quantiles of the range) — the shape that exercises cross-batch
    state carry in the stateful twins. The suite's own fixtures derive
    the same split from sf_dir at test time; this writer exists so a
    generated-data streaming certification is one command:

        SPARK_GRAFT_TEST_SF_DIR=<gen dir> pytest tests/test_streaming.py
    """
    import os

    from pyspark.sql import functions as F

    out = out_dir.rstrip("/")
    os.makedirs(out, exist_ok=True)
    e = generate_table(spark, "events", sf, None, doc_vocab_size)
    lo, hi = e.select(F.min("ts"), F.max("ts")).first()
    span = hi - lo
    cuts = [lo + span * (i + 1) / n_batches for i in range(n_batches - 1)]
    bounds = [None, *cuts, None]
    for i in range(n_batches):
        part = e
        if bounds[i] is not None:
            part = part.filter(F.col("ts") > F.lit(bounds[i]))
        if bounds[i + 1] is not None:
            part = part.filter(F.col("ts") <= F.lit(bounds[i + 1]))
        part.coalesce(1).write.mode("overwrite").parquet(f"{out}/f{i}")


def main() -> None:
    import sys

    out_dir = sys.argv[1]
    sf = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    vocab = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    from gpu_bdb_spark.session import get_spark

    spark = get_spark(app_name="testdata-gen")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    write_testdata(spark, out_dir, sf, doc_vocab_size=vocab)
    for t in TESTDATA_TABLES:
        print(t, spark.read.parquet(f"{out_dir.rstrip('/')}/{t}.parquet")
              .count())


if __name__ == "__main__":
    main()
