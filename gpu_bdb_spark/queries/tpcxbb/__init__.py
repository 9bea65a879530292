"""The 30 TPCx-BB workflow queries, Spark-first.

Each query module exports `qNN(spark, tables, **params) -> DataFrame`
(ML queries return a dict payload with DataFrames + metrics). `tables` is a
`Tables` accessor (base.py) bound either to a parquet data_dir laid out as
`{data_dir}/{table_name}/` (the reference layout, readers.py:100-102) or to
injected DataFrames for tests.

Implementations follow the semantics in SURVEY.md §2.11; every hand-rolled
reference mechanism (per-partition sessionization kernels, manual broadcast
merges, cumsum join keys) is replaced by the idiomatic Spark construct.
"""

from __future__ import annotations

from gpu_bdb_spark.queries.tpcxbb.base import Tables
from gpu_bdb_spark.queries.tpcxbb.registry import TPCXBB_QUERIES, tpcxbb_query

__all__ = ["Tables", "TPCXBB_QUERIES", "tpcxbb_query"]
