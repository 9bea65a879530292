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

    Shape: distinct on (group, item) then self-join on the group key —
    the reference's formulation (q01:49-65) kept because both stages are
    whole-stage-codegen'd; the shuffle-leaner in-array variant
    (`pair_counts_compact`) measured 2× slower at bench (interpreted
    higher-order functions) for typical basket sizes. Skewed groups are
    handled by AQE's skew-join splitting.
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


def pair_counts_compact(
    df: DataFrame,
    group_col: str,
    item_col: str,
    out_prefix: str = "item",
    max_basket: int | None = None,
) -> DataFrame:
    """Shuffle-lean pair counting: collect_set per group, expand pairs
    in-array, explode, count — two shuffles versus three for the
    self-join form. Use when shuffle volume dominates (very wide
    clusters, network-bound) and baskets are bounded; `max_basket` caps
    pathological groups (the reference's MAX_ITEMS_PER_BASKET guard,
    q02). Locally the self-join form is faster (codegen beats the
    interpreted higher-order expansion).
    """
    c1, c2 = f"{out_prefix}_1", f"{out_prefix}_2"
    baskets = (
        df.select(group_col, item_col)
        .filter(F.col(group_col).isNotNull() & F.col(item_col).isNotNull())
        .groupBy(group_col)
        .agg(F.array_sort(F.collect_set(item_col)).alias("_items"))
    )
    if max_basket is not None:
        baskets = baskets.filter(F.size("_items") <= max_basket)
    # all ordered pairs (i < j) from the sorted distinct array
    pairs = F.flatten(
        F.transform(
            F.col("_items"),
            lambda x, i: F.transform(
                F.slice(F.col("_items"), i + 2,
                        F.greatest(F.size(F.col("_items")) - i - 1, F.lit(0))),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    return (
        baskets.select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.a").alias(c1), F.col("p.b").alias(c2))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
