"""Driver-contract entry for the record-linkage operator. The DuckDB
oracle is the EXHAUSTIVE quadratic levenshtein self-join — an
independent statement of the semantics — so the driver hash proves the
deletion-neighborhood blocking loses no pairs (recall is provably 1.0,
see operators/linkage docstring)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gpu_bdb_spark.io import read_table
from gpu_bdb_spark.operators.linkage import fuzzy_pairs
from gpu_bdb_spark.queries.registry import register

FUZZY_ORACLE = """
WITH names AS (SELECT DISTINCT c_name FROM customer)
SELECT a.c_name AS name_1, b.c_name AS name_2,
       CAST(levenshtein(a.c_name, b.c_name) AS INT) AS dist
FROM names a JOIN names b ON a.c_name < b.c_name
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


JACCARD_JOIN_ORACLE = """
WITH s AS (
  SELECT doc_id,
         list_distinct(list_filter(string_split_regex(lower(text), '\\s+'),
                                   x -> x <> '')) AS toks
  FROM documents
),
s2 AS (SELECT doc_id, toks, len(toks) AS sz FROM s WHERE len(toks) > 0),
p AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         len(list_intersect(a.toks, b.toks)) AS inter,
         a.sz + b.sz - len(list_intersect(a.toks, b.toks)) AS un
  FROM s2 a JOIN s2 b ON a.doc_id < b.doc_id
)
SELECT id_a, id_b, CAST(inter AS BIGINT) AS inter_n,
       CAST(un AS BIGINT) AS union_n
FROM p WHERE inter * 20 >= un * 19
"""


@register("jaccard_join_prefix", oracle=JACCARD_JOIN_ORACLE,
          tags=("linkage", "set-similarity", "prefix-filter"))
def jaccard_join_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document pairs with token-set Jaccard ≥ 0.95 via AllPairs prefix
    filtering (rarest-tokens-first prefixes → equi-join candidates →
    exact integer verify) — the oracle is the EXHAUSTIVE quadratic
    list_intersect self-join, so the driver hash proves the prefix
    blocking loses no pairs."""
    from gpu_bdb_spark.functions import tokenize
    from gpu_bdb_spark.operators.linkage import jaccard_set_join

    d = read_table(spark, sf_dir, "documents", ["doc_id", "text"],
                   hint_broadcast=False)
    toks = d.select(
        "doc_id",
        tokenize(F.lower(F.col("text"))).alias("toks"))
    return jaccard_set_join(toks, "doc_id", "toks",
                            threshold_num=19, threshold_den=20)
