"""Driver-contract entry for the record-linkage operator. The DuckDB
oracle is the EXHAUSTIVE quadratic levenshtein self-join — an
independent statement of the semantics — so the driver hash proves the
deletion-neighborhood blocking loses no pairs (recall is provably 1.0,
see operators/linkage docstring)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from gpu_bdb_spark.io import read_table
from gpu_bdb_spark.operators.linkage import fuzzy_pairs
from gpu_bdb_spark.queries.registry import register

FUZZY_ORACLE = """
SELECT a.c_name AS name_1, b.c_name AS name_2,
       CAST(levenshtein(a.c_name, b.c_name) AS INT) AS dist
FROM customer a JOIN customer b ON a.c_name < b.c_name
WHERE levenshtein(a.c_name, b.c_name) <= 1
"""


@register("fuzzy_name_pairs", oracle=FUZZY_ORACLE,
          tags=("linkage", "fuzzy", "blocking"))
def fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All customer-name pairs within edit distance 1, found by
    deletion-neighborhood (SymSpell) blocking + codegen'd levenshtein
    verify — linear candidate generation vs the oracle's quadratic
    scan, with identical (provably lossless) output."""
    c = read_table(spark, sf_dir, "customer", ["c_name"],
                   hint_broadcast=False)
    return fuzzy_pairs(c, "c_name", max_dist=1)
