"""Pair generation (basket analysis) — reference q01:49-65, q29:58-74,
sessionization.py:112-128.

The reference self-merges a deduped (group, item) frame on the group key and
keeps `item_1 < item_2`. Identical logical shape here; Spark shuffles both
sides once on the group key (or broadcasts if one side is small under AQE).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pair_counts(
    df: DataFrame,
    group_col: str,
    item_col: str,
    out_prefix: str = "item",
) -> DataFrame:
    """Count co-occurrences of distinct item pairs within a group.

    Returns columns (`{out_prefix}_1`, `{out_prefix}_2`, `cnt`) with
    `_1 < _2`. Null groups/items are dropped (reference filters nulls
    before pairing, q29:94).

    Scale: dedup is a partial-aggregated shuffle on (group, item); the
    self-join reuses the group-key partitioning. Pair count is bounded by
    Σ k_g² over group sizes k_g — same bound the reference accepts. For
    skewed groups AQE's skew-join splitting applies.
    """
    c1, c2 = f"{out_prefix}_1", f"{out_prefix}_2"
    base = (
        df.select(group_col, item_col)
        .filter(F.col(group_col).isNotNull() & F.col(item_col).isNotNull())
        .distinct()
    )
    a = base.select(F.col(group_col).alias("_g"), F.col(item_col).alias(c1))
    b = base.select(F.col(group_col).alias("_g2"), F.col(item_col).alias(c2))
    return (
        a.join(b, (a._g == b._g2) & (F.col(c1) < F.col(c2)))
        .groupBy(c1, c2)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
