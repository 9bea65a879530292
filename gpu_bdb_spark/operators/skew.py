"""Skew mitigation — salting for hot keys.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime; explicit salting remains the tool when a single key dominates a
*non-join* shuffle (e.g. a grouped collect) or when AQE is unavailable
(streaming state, static plans). Salt values are deterministic (hash-based,
no RNG) so results are reproducible run to run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the left side salted and the right side replicated.

    Rows of a hot left key spread across `n_salts` reducers (salt =
    deterministic hash of the full left row); the right side is exploded
    ×n_salts so every salted partition finds its match. Use when the
    LEFT side is large and skewed on `on` and the right side is small
    enough to replicate but too big to broadcast.

    Cost: right side shuffle volume ×n_salts — the classic trade.
    """
    left_cols = [F.col(c) for c in left.columns]
    salted_left = left.withColumn(
        "_salt", F.pmod(F.xxhash64(*left_cols), F.lit(n_salts)).cast("int"))
    salts = F.array(*[F.lit(i) for i in range(n_salts)])
    salted_right = right.withColumn("_salt", F.explode(salts))
    return salted_left.join(salted_right, [*on, "_salt"], how).drop("_salt")


def salted_collect_set(
    df: DataFrame,
    key_col: str,
    value_col: str,
    n_salts: int = 8,
) -> DataFrame:
    """Two-phase collect_set for skewed keys: partial sets per (key, salt)
    shard, then a union-merge per key — no single reducer ever holds a hot
    key's full input, only its (much smaller) distinct set shards.

    Output: (key, values array<…> distinct, unsorted).
    """
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(value_col)), F.lit(n_salts)).cast("int"))
    partial = salted.groupBy(key_col, "_salt").agg(
        F.collect_set(value_col).alias("_part"))
    return partial.groupBy(key_col).agg(
        F.array_distinct(F.flatten(F.collect_list("_part"))).alias("values"))
