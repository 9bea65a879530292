"""gpu_bdb_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of rapidsai/gpu-bdb (TPCx-BB "BigBench").

The reference (/root/reference) is a Dask-cuDF engine: hand-optimized
dataframe scripts per query, explicit shuffles/broadcasts, CUDA kernels for
window logic. This engine re-expresses the same capability surface
Spark-first: DataFrame/SQL logical plans optimized by Catalyst, window
functions instead of per-partition kernels, built-in broadcast/semi joins
instead of hand-rolled single-partition merges (reference
bdb_tools/readers.py:129-134, bdb_tools/utils.py:929-940).

Layout (SURVEY.md §7.1):
    session.py    SparkSession builder tuned for the benchmark
    io.py         table catalog + parquet readers/writers
    operators/    reusable workflow operators (sessionize, pairs, text,
                  stats, dedup, similarity, topk)
    functions/    column-expression helpers (exact decimal aggs, time)
    sources/      format dispatch readers, lexicon loader
    plans/        plan-introspection utilities (broadcast/pushdown asserts)
    streaming/    Structured Streaming variants of batch operators
    queries/      the runnable query registry (driver contract) and the
                  30 TPCx-BB workflow queries
"""

__version__ = "0.1.0"
