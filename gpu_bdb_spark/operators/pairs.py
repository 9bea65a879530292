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
    parts: int | None = None,
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

    The pair COUNT runs behind an explicit AQE-exempt repartition on
    the pair key: at fact scale most pairs occur once (sf1: 12.0M
    distinct pairs from 12M pair rows), so the aggregate's group state
    ≈ its input; AQE coalesces the self-join output by BYTES and the
    coalesced partial aggregate heap-OOMs a default-memory session —
    marginally: part_pairs passed four sf1zipf sweeps then died in the
    fifth on unlucky task co-residency (round-13; the round-12-lesson-3
    class). `parts` (round 10) lets a caller that knows the input size
    pass a data-derived width (e.g. clamp(input_bytes/1MB, 8, 4096) —
    part_pairs does this from the fact file size, no extra job); None
    keeps the deterministic 256 bound.
    """
    if parts is None:
        parts = 256
    c1, c2 = f"{out_prefix}_1", f"{out_prefix}_2"
    base = (
        df.select(group_col, item_col)
        .filter(F.col(group_col).isNotNull() & F.col(item_col).isNotNull())
        .distinct()
    )
    # Both self-join sides come from ONE plan (alias, no renames) so the
    # distinct's exchange is planned once and stage-level reuse serves
    # the second side — the rename formulation computed the scan +
    # distinct twice (renames defeat plan canonicalization, the round-6
    # frequent_triples lesson; measured in the round-10 plan audit:
    # part_pairs ran 2 scans + 2 distinct aggregates for one input).
    bl = base.alias("_pcl")
    br = base.alias("_pcr")
    gl, gr = F.col(f"_pcl.{group_col}"), F.col(f"_pcr.{group_col}")
    il, ir = F.col(f"_pcl.{item_col}"), F.col(f"_pcr.{item_col}")
    return (
        bl.join(br, (gl == gr) & (il < ir))
        .select(il.alias(c1), ir.alias(c2))
        .repartition(parts, c1, c2)
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


def _basket_base(df: DataFrame, group_col: str, item_col: str) -> DataFrame:
    """Distinct non-null (basket, item) membership frame."""
    return (
        df.select(F.col(group_col).alias("_g"),
                  F.col(item_col).alias("_i"))
        .filter(F.col("_g").isNotNull() & F.col("_i").isNotNull())
        .distinct()
    )


def _support_filter(base: DataFrame, min_support: int,
                    min_support_frac: float | None):
    """Support-threshold filter factory. With `min_support_frac`, the
    threshold is RELATIVE (classical relative minsup): max(min_support,
    ceil(frac · n_baskets)), computed in-plan from a broadcast 1-row
    basket count — no driver action — so the same parameters stay
    non-vacuous at every scale factor (an absolute threshold goes
    vacuous once baskets grow sparser than the item vocabulary)."""
    if min_support_frac is None:
        def support_filter(frame, support_col):
            return frame.filter(
                F.col(support_col) >= F.lit(int(min_support)))
        return support_filter

    nb = base.agg(F.countDistinct("_g").alias("_nb"))
    thr = F.greatest(
        F.lit(int(min_support)).cast("long"),
        F.ceil(F.lit(float(min_support_frac)) * F.col("_nb"))
        .cast("long"))

    def support_filter(frame, support_col):
        return (frame.crossJoin(F.broadcast(nb))
                .filter(F.col(support_col) >= thr)
                .drop("_nb"))
    return support_filter


def basket_triples(
    df: DataFrame,
    group_col: str,
    item_col: str,
    min_support: int = 2,
    out_prefix: str = "item",
    min_support_frac: float | None = None,
) -> DataFrame:
    """Frequent 3-itemsets by DIRECT per-basket expansion: the basket
    frame self-joins twice on the basket key with `_i` strictly
    ordered, so each basket of k items emits exactly C(k,3) triple
    occurrences, then one hash aggregate counts support. This is the
    right REGIME COMPLEMENT to `frequent_triples`' A-priori shape:

    * DENSE small vocabulary (items ≪ baskets, most pairs frequent):
      A-priori prunes nothing and its (triple, item) membership join
      fans every basket row out by candidates/vocab — measured heap
      blow-up at 41k candidates over a 64-name vocabulary. Here the
      work is Σ C(k,3), LINEAR in baskets for bounded basket size k,
      and the three join legs are identical subtrees sharing one
      exchange (ReusedExchange).
    * SPARSE large vocabulary (items ≳ baskets): use `frequent_triples`
      — per-basket expansion is fine there too, but A-priori's pruned
      lattice is what keeps the CANDIDATE side broadcastable.

    Same contract as `frequent_triples`: relative minsup via
    `min_support_frac` (see `_support_filter`), output
    (`{out_prefix}_1..3`, support) with _1 < _2 < _3, equal to the
    unpruned count-all-triples semantics by construction.
    """
    c1, c2, c3 = (f"{out_prefix}_{k}" for k in (1, 2, 3))
    base = _basket_base(df, group_col, item_col)
    support_filter = _support_filter(base, min_support, min_support_frac)
    t = (
        base.alias("x")
        .join(base.alias("y"),
              (F.col("x._g") == F.col("y._g"))
              & (F.col("x._i") < F.col("y._i")))
        .join(base.alias("z"),
              (F.col("x._g") == F.col("z._g"))
              & (F.col("y._i") < F.col("z._i")))
        .groupBy(F.col("x._i").alias("a"), F.col("y._i").alias("b"),
                 F.col("z._i").alias("c"))
        .agg(F.count(F.lit(1)).alias("support"))
    )
    return (
        support_filter(t, "support")
        .select(F.col("a").alias(c1), F.col("b").alias(c2),
                F.col("c").alias(c3), "support")
    )


def frequent_triples(
    df: DataFrame,
    group_col: str,
    item_col: str,
    min_support: int = 2,
    out_prefix: str = "item",
    min_support_frac: float | None = None,
) -> DataFrame:
    """Frequent 3-itemsets with A-priori candidate pruning (Agrawal &
    Srikant '94): candidate triples are generated ONLY from frequent
    pairs — (a,b,c) is a candidate iff (a,b), (b,c) AND (a,c) are all
    min_support-frequent — then counted against the baskets.

    The pruning is the scale story: the naive 3-way basket self-join
    touches Σ basket³ rows; here the cubic work happens only on the
    (tiny, downward-closed) frequent-pair lattice. Support counting
    (round-15 rework) is candidate-TRIMMED per-basket expansion — the
    classical transaction trimming: basket rows survive only if their
    item appears in some candidate (broadcast left-semi on the distinct
    candidate-item set), the trimmed baskets expand their ordered
    triples through the `basket_triples` self-join shape (work per
    basket ≤ C(k_trimmed, 3), bounded by BASKET SIZE and independent of
    item frequency), and a broadcast semi-join on the candidate set
    drops non-candidates before the support aggregate. The previous
    (triple, item)-membership broadcast join fanned out by
    Σ_i freq(i)·|cand ∋ i| — measured pathological on a Zipf-head
    corpus at 20M rows (hub-item rows × thousands of candidate triples
    ≈ 1e10 join rows, zero tasks finishing; probe_heavy_batch.py) —
    frequency-skew in the basket stream must never multiply into the
    candidate side. Output equals the unpruned count-all-triples
    semantics exactly: trimming only removes items no candidate
    contains, so every candidate triple's per-basket occurrence count
    is unchanged, and downward closure guarantees no frequent triple
    is pruned.

    `min_support_frac` switches to RELATIVE support (the classical
    relative minsup): threshold = max(min_support,
    ceil(frac · n_baskets)), computed in-plan from a broadcast 1-row
    basket count — no driver action — so the same parameters stay
    non-vacuous at every scale factor (an absolute threshold of 2
    returns 0 rows once baskets grow sparser than the item vocabulary).

    Returns (`{out_prefix}_1..3`, support) with _1 < _2 < _3.
    """
    c1, c2, c3 = (f"{out_prefix}_{k}" for k in (1, 2, 3))
    base = _basket_base(df, group_col, item_col)
    support_filter = _support_filter(base, min_support, min_support_frac)
    # persist: the lattice is SMALL (frequent pairs only) but expensive
    # (basket self-join), and its three consumers below hash on three
    # different keys — no exchange reuse is possible, so without the
    # cache the self-join would run three times. (Contrast with the
    # measured don't-persist rule for identically-keyed consumers,
    # SCALE.md round 6: here the subtrees are NOT identical.)
    l2 = (
        base.alias("x")
        .join(base.alias("y"),
              (F.col("x._g") == F.col("y._g"))
              & (F.col("x._i") < F.col("y._i")))
        .groupBy(F.col("x._i").alias("a"), F.col("y._i").alias("b"))
        .agg(F.count(F.lit(1)).alias("s"))
    )
    l2 = support_filter(l2, "s").select("a", "b").persist()
    # extend (a,b)×(b,c) and prune by the third edge (a,c) ∈ L2
    cand = (
        l2.alias("p")
        .join(l2.alias("q"), F.col("p.b") == F.col("q.a"))
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"),
                F.col("q.b").alias("c"))
        .join(l2.withColumnsRenamed({"b": "c"}), ["a", "c"], "left_semi")
    )
    # support counting: trim the basket stream to candidate items
    # (broadcast semi — the only touch of the fact-sized frame), expand
    # the trimmed baskets' ordered triples (three identical subtrees,
    # one reused exchange on the basket key), keep candidates only,
    # then one hash aggregate
    cand_items = cand.select(
        F.explode(F.array("a", "b", "c")).alias("_i")).distinct()
    trimmed = base.join(F.broadcast(cand_items), "_i", "left_semi")
    expanded = (
        trimmed.alias("x")
        .join(trimmed.alias("y"),
              (F.col("x._g") == F.col("y._g"))
              & (F.col("x._i") < F.col("y._i")))
        .join(trimmed.alias("z"),
              (F.col("x._g") == F.col("z._g"))
              & (F.col("y._i") < F.col("z._i")))
        .select(F.col("x._i").alias("a"), F.col("y._i").alias("b"),
                F.col("z._i").alias("c"))
    )
    sup = (
        expanded.join(F.broadcast(cand), ["a", "b", "c"], "left_semi")
        .groupBy("a", "b", "c")
        .agg(F.count(F.lit(1)).alias("support"))
    )
    return (
        support_filter(sup, "support")
        .select(F.col("a").alias(c1), F.col("b").alias(c2),
                F.col("c").alias(c3), "support")
    )
