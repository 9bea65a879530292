"""Relational operator coverage (SURVEY.md §2.1–§2.4, §2.6–§2.8).

Each query exercises one operator family from the reference inventory on the
driver's synthetic star schema, with an exact DuckDB oracle. Reference
citations point at the gpu-bdb site whose *shape* the query reproduces.

Exactness: see gpu_bdb_spark.functions — decimal sums, integer time math,
round(…,6) for floating statistics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gpu_bdb_spark.functions import DEC, davg, dec, dsum, revenue
from gpu_bdb_spark.io import read_table, size_derived_parts
from gpu_bdb_spark.queries.registry import register

# ---------------------------------------------------------------------------
# Scan / filter / multi-agg (reference: every qNN read_tables + groupby.agg
# dict pattern, e.g. q06:82-93; pruning readers.py:108-127)
# ---------------------------------------------------------------------------

PRICING_SUMMARY_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE), 2) AS sum_qty,
  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))) AS DOUBLE), 2) AS sum_base_price,
  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
           * (CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4))))
       AS DOUBLE), 2) AS sum_disc_price,
  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
           * (CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4)))
           * (CAST(1 AS DECIMAL(12,4)) + CAST(l_tax AS DECIMAL(12,4))))
       AS DOUBLE), 2) AS sum_charge,
  ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))) AS DOUBLE) / COUNT(*), 6) AS avg_price,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@register("pricing_summary", oracle=PRICING_SUMMARY_ORACLE,
          tags=("scan", "filter", "groupby-agg"), bench=True)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped digest: pushed-down date filter + grouped multi-agg.

    Covers the reference's dominant agg pattern (multi-column agg dict,
    q06:82-93, q13:84-89) and scan-time pruning (readers.py:108-127 —
    automatic in Spark: ReadSchema shows only the 7 referenced columns).
    """
    l = read_table(spark, sf_dir, "lineitem", hint_broadcast=False)
    one = F.lit(1).cast(DEC)
    return (
        l.filter(F.col("l_shipdate") <= F.lit("2000-12-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            F.round(F.sum(dec("l_extendedprice") * (one - dec("l_discount")))
                    .cast("double"), 2).alias("sum_disc_price"),
            F.round(F.sum(dec("l_extendedprice") * (one - dec("l_discount"))
                          * (one + dec("l_tax"))).cast("double"), 2)
            .alias("sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Fact ⋈ broadcast-dim join chain (reference: the dominant join pattern,
# q06:78-80, q07:72-77; hand-rolled broadcasts readers.py:129-134)
# ---------------------------------------------------------------------------

REVENUE_BY_NATION_ORACLE = """
SELECT
  r.r_name,
  n.n_name,
  ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,4))
           * (CAST(1 AS DECIMAL(12,4)) - CAST(l.l_discount AS DECIMAL(12,4))))
       AS DOUBLE), 2) AS revenue,
  COUNT(*) AS n_lineitems
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
GROUP BY r.r_name, n.n_name
"""


@register("revenue_by_nation", oracle=REVENUE_BY_NATION_ORACLE,
          tags=("join", "broadcast", "groupby-agg"), bench=True)
def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-way fact⋈dim join chain with broadcast dims.

    The reference collapses small tables to one partition and merges
    per-partition (readers.py:129-134, q03:131-134); Spark broadcasts
    them — `read_table` attaches the hint, AQE would pick it anyway.
    """
    l = read_table(spark, sf_dir, "lineitem",
                   ["l_orderkey", "l_extendedprice", "l_discount"],
                   hint_broadcast=False)
    o = read_table(spark, sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"],
                   hint_broadcast=False).filter(
        F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
    c = read_table(spark, sf_dir, "customer", ["c_custkey", "c_nationkey"])
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.round(F.sum(revenue()).cast("double"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


# ---------------------------------------------------------------------------
# Global top-k (reference: repartition(1)+sort+head(k), q01:125-141 —
# Spark does distributed TakeOrderedAndProject)
# ---------------------------------------------------------------------------

TOP_ORDERS_ORACLE = """
SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 25
"""


@register("top_orders", oracle=TOP_ORDERS_ORACLE, tags=("topk", "sort"))
def top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k with a deterministic tiebreak key.

    The reference's top-k collapses to one partition then sorts
    (q01:125-141); Spark's orderBy+limit compiles to a distributed
    TakeOrderedAndProject (per-partition heap + driver merge) that never
    materializes a global sort — the scale-correct plan.
    """
    o = read_table(spark, sf_dir, "orders", hint_broadcast=False)
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(25)
    )


# ---------------------------------------------------------------------------
# Semi / anti joins (reference: hand-rolled left_semi utils.py:929-940,
# used q17:55-105, q18:65-70; anti join absent in reference — free in Spark)
# ---------------------------------------------------------------------------

PRIORITY_SEMI_ORACLE = """
SELECT o.o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45
)
GROUP BY o.o_orderpriority
"""


@register("order_priority_semi", oracle=PRIORITY_SEMI_ORACLE,
          tags=("semi-join", "having"))
def order_priority_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS as native left-semi join.

    Reference builds left-semi by broadcasting a single-partition right
    side into per-partition merges (utils.py:929-940); Spark has the
    operator natively and will broadcast the filtered build side.
    """
    o = read_table(spark, sf_dir, "orders", ["o_orderkey", "o_orderpriority"],
                   hint_broadcast=False)
    l = read_table(spark, sf_dir, "lineitem", ["l_orderkey", "l_quantity"],
                   hint_broadcast=False).filter(F.col("l_quantity") > 45)
    return (
        o.join(l, o.o_orderkey == l.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


ANTI_JOIN_ORACLE = """
SELECT c.c_mktsegment, COUNT(*) AS n_customers_without_recent_orders
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey
    AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
)
GROUP BY c.c_mktsegment
"""


@register("customers_anti_join", oracle=ANTI_JOIN_ORACLE, tags=("anti-join",))
def customers_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS as native left-anti join (not present in the reference —
    SURVEY §2.3 notes Spark provides it for free)."""
    c = read_table(spark, sf_dir, "customer", ["c_custkey", "c_mktsegment"],
                   hint_broadcast=False)
    o = read_table(spark, sf_dir, "orders", ["o_custkey", "o_orderdate"],
                   hint_broadcast=False).filter(
        F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp"))
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers_without_recent_orders"))
    )


# ---------------------------------------------------------------------------
# Left outer join + COALESCE (reference q16:140-145 web_sales LEFT JOIN
# web_returns; COALESCE q16:193-197)
# ---------------------------------------------------------------------------

LEFT_JOIN_COALESCE_ORACLE = """
SELECT
  o.o_orderstatus,
  COUNT(*) AS n_orders,
  COUNT(l.big_qty) AS n_with_big_lineitem,
  ROUND(CAST(SUM(COALESCE(l.big_qty_dec, CAST(0 AS DECIMAL(12,4)))) AS DOUBLE), 2)
    AS sum_big_qty
FROM orders o
LEFT JOIN (
  SELECT l_orderkey,
         COUNT(*) AS big_qty,
         SUM(CAST(l_quantity AS DECIMAL(12,4))) AS big_qty_dec
  FROM lineitem WHERE l_quantity > 48 GROUP BY l_orderkey
) l ON o.o_orderkey = l.l_orderkey
GROUP BY o.o_orderstatus
"""


@register("left_join_coalesce", oracle=LEFT_JOIN_COALESCE_ORACLE,
          tags=("outer-join", "coalesce"))
def left_join_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders LEFT JOIN aggregated lineitem + COALESCE of the null side
    (reference q16:134-145,193-197 shape)."""
    o = read_table(spark, sf_dir, "orders", ["o_orderkey", "o_orderstatus"],
                   hint_broadcast=False)
    l = (
        read_table(spark, sf_dir, "lineitem", ["l_orderkey", "l_quantity"],
                   hint_broadcast=False)
        .filter(F.col("l_quantity") > 48)
        .groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("big_qty"),
            F.sum(dec("l_quantity")).alias("big_qty_dec"),
        )
    )
    zero = F.lit(0).cast(DEC)
    return (
        o.join(l, o.o_orderkey == l.l_orderkey, "left")
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.count("big_qty").alias("n_with_big_lineitem"),
            F.round(F.sum(F.coalesce(F.col("big_qty_dec"), zero))
                    .cast("double"), 2).alias("sum_big_qty"),
        )
    )


# ---------------------------------------------------------------------------
# Pair self-join / basket analysis (reference q01:49-65, q29:58-74,
# sessionization.py:112-128)
# ---------------------------------------------------------------------------

PART_PAIRS_ORACLE = """
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
SELECT a.l_partkey AS part_1, b.l_partkey AS part_2, COUNT(*) AS cnt
FROM op a JOIN op b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY a.l_partkey, b.l_partkey
HAVING COUNT(*) >= 2
ORDER BY cnt DESC, part_1, part_2
LIMIT 100
"""


@register("part_pairs", oracle=PART_PAIRS_ORACLE,
          tags=("self-join", "pairs", "having", "topk"), bench=True)
def part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Items-bought-together: distinct → pair self-join (a<b) → count →
    HAVING → deterministic top-100 (reference q01:76-141 / q29:89-126).

    Scale: the self-join shuffles both sides on l_orderkey once; AQE
    handles skewed baskets. Pair explosion is bounded by basket size
    (~O(k²) per order), the same bound the reference accepts.
    """
    from gpu_bdb_spark.operators.pairs import pair_counts

    l = read_table(spark, sf_dir, "lineitem", ["l_orderkey", "l_partkey"],
                   hint_broadcast=False)
    # Data-derived pair-aggregate width (round 10): the pair stream is
    # ~1× the fact rows here (sf1: 12.0M pairs from 12M rows), so the
    # fact file size is a faithful linear proxy — clamp(bytes/1MB,
    # 8, 4096) keeps the round-13 per-task group-state bound at scale
    # (sf1zipf ~109MB → ~109 parts ≈ the old flat 256's state/task
    # within 2×) without 256 near-empty tasks at the driver SFs. No
    # extra job: plain os.stat on the table file/dir.
    pairs = pair_counts(l, group_col="l_orderkey", item_col="l_partkey",
                        out_prefix="part",
                        parts=size_derived_parts(sf_dir, "lineitem"))
    return (
        pairs.filter(F.col("cnt") >= 2)
        .orderBy(F.desc("cnt"), "part_1", "part_2")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Theta / inequality join (reference q12:199-206 — clicked-then-bought)
# ---------------------------------------------------------------------------

VIEW_THEN_PURCHASE_ORACLE = """
SELECT v.user_id, COUNT(*) AS n_view_purchase_pairs
FROM events v
JOIN events p
  ON v.user_id = p.user_id
 AND v.event_type = 'view'
 AND p.event_type = 'purchase'
 AND epoch_us(p.ts) > epoch_us(v.ts)
 AND epoch_us(p.ts) - epoch_us(v.ts) <= 3600 * 1000000::BIGINT
GROUP BY v.user_id
"""


@register("view_then_purchase", oracle=VIEW_THEN_PURCHASE_ORACLE,
          tags=("theta-join", "time"))
def view_then_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-join on user + inequality time predicate (reference q12:199-206:
    `wcs_click_date_sk < ss_sold_date_sk` after join).

    The time predicate stays in the join condition so Catalyst evaluates it
    during the (hash) join on user_id rather than materializing the full
    per-user cross product. Per-user cost is still views×purchases inside
    the join task — fine at the reference's event distributions, quadratic
    on a bot-grade hot user; `view_then_purchase_windowed` is the
    pair-free O(n log n) scale shape (same oracle, planted-hot-user probe
    in SCALE.md).
    """
    e = read_table(spark, sf_dir, "events", ["user_id", "event_type", "ts"],
                   hint_broadcast=False)
    v = e.filter(F.col("event_type") == "view").select(
        F.col("user_id"), F.unix_micros(F.col("ts").cast("timestamp")).alias("v_us"))
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.unix_micros(F.col("ts").cast("timestamp")).alias("p_us"))
    return (
        v.join(
            p,
            (v.user_id == p.p_user)
            & (p.p_us > v.v_us)
            & (p.p_us - v.v_us <= 3600 * 1_000_000),
        )
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_view_purchase_pairs"))
    )


@register("view_then_purchase_windowed", oracle=VIEW_THEN_PURCHASE_ORACLE,
          tags=("theta-join", "time", "scale-path", "window"))
def view_then_purchase_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME pair-count semantics as `view_then_purchase`, computed
    pair-free via prefix sums: each purchase becomes two signed probe
    rows, one union stream per user, a single incremental
    UNBOUNDED-PRECEDING range frame, and the in-window view count is
    the difference of two running totals (operators/temporal.py
    `windowed_pair_counts`, strategy="prefix"). ONE user-key shuffle,
    no join, O(n log n) per user INDEPENDENT of event density — the
    shape that survives a bot-grade hot user at 100 TB. (The natural
    trailing-RANGE-frame form is NOT that shape: Spark's sliding
    frames re-accumulate without retraction, measured quadratic on a
    packed hot hour — SCALE.md "hot-user probe".) Held to the
    identical oracle, so the equivalence with the theta-join
    formulation is hash-checked every round."""
    from gpu_bdb_spark.operators.temporal import windowed_pair_counts

    e = read_table(spark, sf_dir, "events", ["user_id", "event_type", "ts"],
                   hint_broadcast=False).filter(F.col("user_id").isNotNull())
    return windowed_pair_counts(
        e, "user_id", "ts",
        left_filter=F.col("event_type") == "view",
        right_filter=F.col("event_type") == "purchase",
        window_us=3600 * 1_000_000,
    ).withColumnRenamed("n_pairs", "n_view_purchase_pairs")


@register("view_then_purchase_auto", oracle=VIEW_THEN_PURCHASE_ORACLE,
          tags=("theta-join", "time", "auto-strategy", "skew"))
def view_then_purchase_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The auto-strategy composition (VERDICT r04 item 4): the SAME
    pair-count semantics, with the plan shape picked from DATA — one
    tiny per-key diagnostic aggregate (`operators/skew.key_skew_stats`,
    a single collected row) chooses prefix sums when any key is hot
    enough to pack a window (the 194×-measured quadratic regime of the
    sliding frame) and the cheaper frame form otherwise
    (`pick_pair_count_strategy`, thresholds documented there). Both
    arms are held to this identical oracle, so dispatch can change only
    the plan, never the answer; the arm choice itself is pinned on
    planted hot/uniform fixtures in tests/test_skew.py."""
    from gpu_bdb_spark.operators.skew import windowed_pair_counts_auto

    e = read_table(spark, sf_dir, "events", ["user_id", "event_type", "ts"],
                   hint_broadcast=False).filter(F.col("user_id").isNotNull())
    return windowed_pair_counts_auto(
        e, "user_id", "ts",
        left_filter=F.col("event_type") == "view",
        right_filter=F.col("event_type") == "purchase",
        window_us=3600 * 1_000_000,
    ).withColumnRenamed("n_pairs", "n_view_purchase_pairs")


# ---------------------------------------------------------------------------
# Count-distinct per group (reference workaround q25:32-45, q26:30-39;
# native in Spark) + stats aggs (q23:32-43 mean/std)
# ---------------------------------------------------------------------------

AGG_STATS_ORACLE = """
SELECT
  p.p_brand,
  COUNT(DISTINCT l.l_suppkey) AS n_suppliers,
  COUNT(DISTINCT l.l_orderkey) AS n_orders,
  MIN(l.l_extendedprice) AS min_price,
  MAX(l.l_extendedprice) AS max_price,
  ROUND(STDDEV_SAMP(l.l_quantity), 6) AS std_qty,
  ROUND(CAST(SUM(CAST(l.l_quantity AS DECIMAL(12,4))) AS DOUBLE)
    / COUNT(l.l_quantity), 6) AS avg_qty
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY p.p_brand
"""


@register("agg_stats", oracle=AGG_STATS_ORACLE,
          tags=("count-distinct", "stats", "join"), bench=True)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group countDistinct / min / max / stddev / exact avg.

    The reference fakes count-distinct with drop_duplicates→count
    ("distinct count groupby OOMs with dask-sql", q25_dask_sql.py:93;
    q25:32-45). Two native countDistincts in ONE aggregate compile to an
    Expand ×3 (every input row triplicated before the shuffle) — measured
    2.4-2.9 s at sf0.1. This split shape — plain agg + one bare-pair
    distinct per count, broadcast-joined on the tiny group key — runs the
    same result in 1.2-1.4 s: each leg scans only its 2-3 pruned parquet
    columns (total bytes ≈ the single wide scan) and shuffles narrow
    rows with map-side partial dedup. Same trade the repo applies
    everywhere: never carry a wide row through a shuffle a bare pair can
    serve (SCALE.md "agg_stats shape").
    """
    l = read_table(spark, sf_dir, "lineitem", hint_broadcast=False)
    p = read_table(spark, sf_dir, "part", ["p_partkey", "p_brand"])
    j = l.join(p, l.l_partkey == p.p_partkey)
    base = j.groupBy("p_brand").agg(
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        F.round(F.stddev_samp("l_quantity"), 6).alias("std_qty"),
        davg("l_quantity", "avg_qty"),
    )
    n_supp = (
        j.select("p_brand", "l_suppkey").distinct()
        .groupBy("p_brand").agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    n_ord = (
        j.select("p_brand", "l_orderkey").distinct()
        .groupBy("p_brand").agg(F.count(F.lit(1)).alias("n_orders"))
    )
    return (
        base.join(n_supp, "p_brand").join(n_ord, "p_brand")
        .select("p_brand", "n_suppliers", "n_orders", "min_price",
                "max_price", "std_qty", "avg_qty")
    )


# ---------------------------------------------------------------------------
# CASE WHEN conditional aggregation (reference q06:43-61, q13:31-45) +
# global scalar ratio (q04:77-83, q14:98-108)
# ---------------------------------------------------------------------------

CASE_WHEN_PIVOT_ORACLE = """
SELECT
  CAST(year(o.o_orderdate) AS INTEGER) AS order_year,
  ROUND(CAST(SUM(CASE WHEN c.c_mktsegment = 'BUILDING'
       THEN CAST(o.o_totalprice AS DECIMAL(12,4)) ELSE CAST(0 AS DECIMAL(12,4)) END)
       AS DOUBLE), 2) AS building_rev,
  ROUND(CAST(SUM(CASE WHEN c.c_mktsegment = 'MACHINERY'
       THEN CAST(o.o_totalprice AS DECIMAL(12,4)) ELSE CAST(0 AS DECIMAL(12,4)) END)
       AS DOUBLE), 2) AS machinery_rev,
  COUNT(*) AS n_orders
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY 1
"""


@register("case_when_sums", oracle=CASE_WHEN_PIVOT_ORACLE,
          tags=("case-when", "conditional-agg"))
def case_when_sums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Masked conditional sums per year — the reference's CASE-WHEN-via-
    masked-assignment idiom (q06:43-61: first_year_sales/second_year_sales)."""
    o = read_table(spark, sf_dir, "orders",
                   ["o_custkey", "o_orderdate", "o_totalprice"],
                   hint_broadcast=False)
    c = read_table(spark, sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    zero = F.lit(0).cast(DEC)
    cond_sum = lambda seg: F.round(F.sum(  # noqa: E731
        F.when(F.col("c_mktsegment") == seg, dec("o_totalprice")).otherwise(zero)
    ).cast("double"), 2)
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(
            cond_sum("BUILDING").alias("building_rev"),
            cond_sum("MACHINERY").alias("machinery_rev"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


SCALAR_RATIO_ORACLE = """
SELECT
  ROUND(CAST(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_extendedprice AS DECIMAL(12,4))
                ELSE CAST(0 AS DECIMAL(12,4)) END) AS DOUBLE)
  / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))) AS DOUBLE), 6)
  AS returned_revenue_ratio
FROM lineitem
"""


@register("scalar_ratio", oracle=SCALAR_RATIO_ORACLE, tags=("scalar-agg",))
def scalar_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-row global ratio-of-sums (reference q04:77-83 abandoned-cart
    ratio, q14:98-108 am/pm ratio — scalar answers kept DataFrame-shaped)."""
    l = read_table(spark, sf_dir, "lineitem",
                   ["l_returnflag", "l_extendedprice"], hint_broadcast=False)
    zero = F.lit(0).cast(DEC)
    return l.agg(
        F.round(
            F.sum(F.when(F.col("l_returnflag") == "R",
                         dec("l_extendedprice")).otherwise(zero)).cast("double")
            / F.sum(dec("l_extendedprice")).cast("double"),
            6,
        ).alias("returned_revenue_ratio")
    )


# ---------------------------------------------------------------------------
# Set operations (reference §2.7: UNION ALL q25:99; INTERSECT/EXCEPT free)
# ---------------------------------------------------------------------------

UNION_ROLLUP_ORACLE = """
SELECT channel, CAST(year(odate) AS INTEGER) AS order_year,
       ROUND(CAST(SUM(CAST(price AS DECIMAL(12,4))) AS DOUBLE), 2) AS rev,
       COUNT(*) AS n
FROM (
  SELECT 'urgent' AS channel, o_orderdate AS odate, o_totalprice AS price
  FROM orders WHERE o_orderpriority IN ('1-URGENT','2-HIGH')
  UNION ALL
  SELECT 'normal' AS channel, o_orderdate AS odate, o_totalprice AS price
  FROM orders WHERE o_orderpriority NOT IN ('1-URGENT','2-HIGH')
)
GROUP BY 1, 2
"""


@register("union_rollup", oracle=UNION_ROLLUP_ORACLE, tags=("union", "rollup"))
def union_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of two tagged subsets re-aggregated (reference q25:99-103:
    store + web per-customer aggs concatenated then re-grouped)."""
    o = read_table(spark, sf_dir, "orders",
                   ["o_orderpriority", "o_orderdate", "o_totalprice"],
                   hint_broadcast=False)
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    mk = lambda df, tag: df.select(  # noqa: E731
        F.lit(tag).alias("channel"),
        F.col("o_orderdate").alias("odate"),
        F.col("o_totalprice").alias("price"),
    )
    unioned = mk(o.filter(urgent), "urgent").unionByName(mk(o.filter(~urgent), "normal"))
    return (
        unioned.groupBy("channel", F.year("odate").alias("order_year"))
        .agg(F.round(F.sum(dec("price")).cast("double"), 2).alias("rev"),
             F.count(F.lit(1)).alias("n"))
    )


INTERSECT_BRANDS_ORACLE = """
SELECT p_brand FROM part WHERE p_size >= 40
INTERSECT
SELECT p_brand FROM part WHERE p_retailprice > 1500
"""


@register("intersect_brands", oracle=INTERSECT_BRANDS_ORACLE, tags=("intersect",))
def intersect_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT of two filtered projections (absent in the reference —
    SURVEY §2.7 notes it comes free in Spark)."""
    p = read_table(spark, sf_dir, "part", hint_broadcast=False)
    big = p.filter(F.col("p_size") >= 40).select("p_brand")
    pricey = p.filter(F.col("p_retailprice") > 1500).select("p_brand")
    return big.intersect(pricey)


EXCEPT_BRANDS_ORACLE = """
SELECT p_brand FROM part WHERE p_size >= 40
EXCEPT
SELECT p_brand FROM part WHERE p_retailprice > 1500
"""


@register("except_brands", oracle=EXCEPT_BRANDS_ORACLE, tags=("except",))
def except_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (set difference) of two filtered projections."""
    p = read_table(spark, sf_dir, "part", hint_broadcast=False)
    big = p.filter(F.col("p_size") >= 40).select("p_brand")
    pricey = p.filter(F.col("p_retailprice") > 1500).select("p_brand")
    return big.subtract(pricey)  # EXCEPT DISTINCT semantics


# ---------------------------------------------------------------------------
# Distinct / dedup of rows (reference q01:98, q12:191-197)
# ---------------------------------------------------------------------------

DISTINCT_PAIRS_ORACLE = """
SELECT DISTINCT l_partkey, l_suppkey FROM lineitem WHERE l_quantity >= 49
"""


@register("distinct_rows", oracle=DISTINCT_PAIRS_ORACLE, tags=("distinct",))
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicates on a projected key pair (reference q01:98 post-join
    drop_duplicates). Spark plans it as a hash aggregate with partial dedup
    before the shuffle."""
    l = read_table(spark, sf_dir, "lineitem",
                   ["l_partkey", "l_suppkey", "l_quantity"], hint_broadcast=False)
    return l.filter(F.col("l_quantity") >= 49).select("l_partkey", "l_suppkey").distinct()


# ---------------------------------------------------------------------------
# Compound predicate blocks (reference q09:92-148 OR-of-AND; IN-lists
# q01:83-89; BETWEEN q12:92-95; rlike q09:132)
# ---------------------------------------------------------------------------

PREDICATE_BLOCKS_ORACLE = """
SELECT COUNT(*) AS n_rows,
       ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE), 2) AS total_qty
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE (
    (p.p_brand = 'Brand#1' AND l.l_quantity BETWEEN 1 AND 11
     AND p.p_size BETWEEN 1 AND 5)
 OR (p.p_brand = 'Brand#2' AND l.l_quantity BETWEEN 10 AND 20
     AND p.p_size BETWEEN 1 AND 10)
 OR (p.p_brand = 'Brand#3' AND l.l_quantity BETWEEN 20 AND 30
     AND p.p_size BETWEEN 1 AND 15)
)
AND l.l_returnflag IN ('A','N')
AND regexp_matches(p.p_type, 'STEEL|BRASS|COPPER')
"""


@register("predicate_blocks", oracle=PREDICATE_BLOCKS_ORACLE,
          tags=("filter", "or-of-and", "in-list", "between", "rlike"))
def predicate_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q19-shaped OR-of-AND predicate + IN-list + BETWEEN + regex
    (reference q09:92-148 three-slice OR blocks; rlike q09:132)."""
    l = read_table(spark, sf_dir, "lineitem",
                   ["l_partkey", "l_quantity", "l_returnflag"], hint_broadcast=False)
    p = read_table(spark, sf_dir, "part", ["p_partkey", "p_brand", "p_size", "p_type"])
    j = l.join(p, l.l_partkey == p.p_partkey)
    block = lambda brand, qlo, qhi, slo, shi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("l_quantity").between(qlo, qhi)
        & F.col("p_size").between(slo, shi)
    )
    return (
        j.filter(
            (block("Brand#1", 1, 11, 1, 5)
             | block("Brand#2", 10, 20, 1, 10)
             | block("Brand#3", 20, 30, 1, 15))
            & F.col("l_returnflag").isin("A", "N")
            & F.col("p_type").rlike("STEEL|BRASS|COPPER")
        )
        .agg(F.count(F.lit(1)).alias("n_rows"),
             dsum("l_quantity", "total_qty"))
    )


# ---------------------------------------------------------------------------
# Date functions (reference date parse utils.py:943-954; epoch math
# q02:71-73) and string functions (§2.8)
# ---------------------------------------------------------------------------

DATE_BUCKETS_ORACLE = """
SELECT
  CAST(year(o_orderdate) AS INTEGER) AS y,
  CAST(month(o_orderdate) AS INTEGER) AS m,
  CAST(quarter(o_orderdate) AS INTEGER) AS q,
  strftime(o_orderdate, '%Y-%m') AS ym,
  COUNT(*) AS n_orders,
  ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4))) AS DOUBLE), 2) AS rev
FROM orders
WHERE date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) >= 365
GROUP BY year(o_orderdate), month(o_orderdate), quarter(o_orderdate), 4
"""


@register("date_buckets", oracle=DATE_BUCKETS_ORACLE, tags=("date-funcs",))
def date_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date extraction + datediff bucketing (reference stores dates as
    strings and converts to epoch days, utils.py:943-954 — here the columns
    are real timestamps, the Spark-native model)."""
    o = read_table(spark, sf_dir, "orders", ["o_orderdate", "o_totalprice"],
                   hint_broadcast=False)
    return (
        o.filter(F.datediff(F.col("o_orderdate"),
                            F.lit("1995-01-01").cast("date")) >= 365)
        .groupBy(
            F.year("o_orderdate").alias("y"),
            F.month("o_orderdate").alias("m"),
            F.quarter("o_orderdate").alias("q"),
            F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
        )
        .agg(F.count(F.lit(1)).alias("n_orders"),
             F.round(F.sum(dec("o_totalprice")).cast("double"), 2).alias("rev"))
    )


STRING_FUNCS_ORACLE = """
SELECT
  p_partkey,
  lower(p_name) AS name_lower,
  upper(p_brand) AS brand_upper,
  trim(p_type) AS type_trim,
  concat_ws('|', p_brand, p_type) AS brand_type,
  CAST(length(p_name) AS INTEGER) AS name_len,
  substr(p_name, 1, 5) AS name_prefix,
  replace(p_name, ' ', '_') AS name_snake,
  contains(p_type, 'BRASS') AS is_brass
FROM part
WHERE p_partkey <= 200
"""


@register("string_funcs", oracle=STRING_FUNCS_ORACLE, tags=("string-funcs",))
def string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar string function surface (reference §2.8: lower q10:59, replace
    q10:62-66, strip text.py:57, str.cat q04_utils.py:59-65, contains
    q04_utils.py:71-75)."""
    p = read_table(spark, sf_dir, "part", hint_broadcast=False)
    return p.filter(F.col("p_partkey") <= 200).select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.upper("p_brand").alias("brand_upper"),
        F.trim("p_type").alias("type_trim"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.regexp_replace("p_name", " ", "_").alias("name_snake"),
        F.col("p_type").contains("BRASS").alias("is_brass"),
    )


# ---------------------------------------------------------------------------
# Pivot / one-hot (reference q05:60-88 get_dummies, q26:63-77)
# ---------------------------------------------------------------------------

EVENT_TYPES = ("click", "view", "purchase", "signup", "error")

PIVOT_ORACLE = """
SELECT user_id,
  COUNT(*) FILTER (WHERE event_type = 'click')    AS n_click,
  COUNT(*) FILTER (WHERE event_type = 'view')     AS n_view,
  COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
  COUNT(*) FILTER (WHERE event_type = 'signup')   AS n_signup,
  COUNT(*) FILTER (WHERE event_type = 'error')    AS n_error
FROM events
GROUP BY user_id
"""


@register("pivot_event_counts", oracle=PIVOT_ORACLE, tags=("pivot", "one-hot"))
def pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user one-hot event counts via pivot with an explicit value list
    (reference q05:60-88 `get_dummies` over category ids — explicit values
    keep the plan single-pass, no distinct-scan to discover columns)."""
    e = read_table(spark, sf_dir, "events", ["user_id", "event_type"],
                   hint_broadcast=False)
    piv = (
        e.groupBy("user_id")
        .pivot("event_type", list(EVENT_TYPES))
        .count()
        .na.fill(0)
    )
    renames = [F.col("user_id")] + [
        F.col(t).alias(f"n_{t}") for t in EVENT_TYPES
    ]
    return piv.select(*renames)


FREQUENT_TRIPLES_ORACLE = """
-- b/nb MATERIALIZED: DuckDB re-inlines plain CTEs per reference and
-- the planner collapsed into a pathological join order (>10 min at
-- sf1 vs 9 s materialized — the round-8 CTE lesson)
WITH b AS MATERIALIZED (SELECT DISTINCT l_orderkey AS g, p.p_name AS i
           FROM lineitem JOIN part p ON l_partkey = p.p_partkey),
nb AS MATERIALIZED (SELECT COUNT(DISTINCT g) AS n FROM b),
t AS (
  SELECT b1.i AS item_1, b2.i AS item_2, b3.i AS item_3,
         COUNT(*) AS support
  FROM b b1
  JOIN b b2 ON b1.g = b2.g AND b1.i < b2.i
  JOIN b b3 ON b1.g = b3.g AND b2.i < b3.i
  GROUP BY 1, 2, 3
)
SELECT item_1, item_2, item_3, support FROM t, nb
WHERE support >= GREATEST(2, CAST(ceil(0.0002 * nb.n) AS BIGINT))
"""


@register("frequent_triples", oracle=FREQUENT_TRIPLES_ORACLE,
          tags=("basket", "apriori", "itemsets"))
def frequent_triples_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent product-name 3-itemsets across orders with RELATIVE
    minsup max(2, ceil(0.02% of baskets)) — relative support keeps the
    entry non-vacuous at EVERY scale factor (r3 verdict: the old
    absolute support ≥ 2 over raw part keys returned 0 rows at sf0.1
    as baskets grew sparser than the key space; the hash was green but
    trivially). The 64-name vocabulary is the DENSE regime, so Spark
    runs the per-basket C(k,3) expansion (`basket_triples`: linear in
    baskets for bounded basket size, one reused basket exchange) —
    A-priori's candidate lattice prunes nothing over a dense small
    vocabulary, so its extra passes buy nothing here (see
    operators/pairs.py regime notes)."""
    from gpu_bdb_spark.operators.pairs import basket_triples

    li = read_table(spark, sf_dir, "lineitem", ["l_orderkey", "l_partkey"],
                    hint_broadcast=False)
    p = read_table(spark, sf_dir, "part", ["p_partkey", "p_name"])
    named = li.join(F.broadcast(p),
                    li.l_partkey == p.p_partkey).select(
        "l_orderkey", "p_name")
    return basket_triples(named, "l_orderkey", "p_name",
                          min_support=2, min_support_frac=0.0002)


ASSOC_RULES_ORACLE = """
WITH b AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS i FROM lineitem),
n AS (SELECT COUNT(DISTINCT g) AS n_baskets FROM b),
item AS (SELECT i, COUNT(*) AS s FROM b GROUP BY i),
pair AS (
  SELECT b1.i AS a, b2.i AS c, COUNT(*) AS s_ab
  FROM b b1 JOIN b b2 ON b1.g = b2.g AND b1.i <> b2.i
  GROUP BY 1, 2
)
SELECT p.a AS antecedent, p.c AS consequent, p.s_ab AS support_ab,
       ia.s AS support_a, ic.s AS support_c,
       ROUND(CAST(p.s_ab AS DOUBLE) / CAST(ia.s AS DOUBLE), 6)
         AS confidence,
       ROUND(CAST(p.s_ab AS DOUBLE) * CAST(n.n_baskets AS DOUBLE)
             / (CAST(ia.s AS DOUBLE) * CAST(ic.s AS DOUBLE)), 6) AS lift
FROM pair p
JOIN item ia ON ia.i = p.a
JOIN item ic ON ic.i = p.c
CROSS JOIN n
WHERE p.s_ab >= 3
"""


@register("association_rules", oracle=ASSOC_RULES_ORACLE,
          tags=("basket", "association-rules", "lift"))
def association_rules_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed association rules a→c over order baskets with
    confidence = s(ab)/s(a) and lift = N·s(ab)/(s(a)·s(c)), support
    floor 3. Basket self-join for directed pair counts (both
    directions — a rule is ordered), item supports re-attach by
    broadcast (item-dimension-sized), basket count is one scalar. All
    ratios divide exact integers."""
    li = read_table(spark, sf_dir, "lineitem", ["l_orderkey", "l_partkey"],
                    hint_broadcast=False)
    b = (
        li.select(F.col("l_orderkey").alias("g"),
                  F.col("l_partkey").alias("i"))
        .filter(F.col("g").isNotNull() & F.col("i").isNotNull())
        .distinct()
    )
    n = b.select(F.countDistinct("g").cast("long").alias("n_baskets"))
    item = b.groupBy(F.col("i")).agg(F.count(F.lit(1)).alias("s"))
    pair = (
        b.alias("x").join(b.alias("y"),
                          (F.col("x.g") == F.col("y.g"))
                          & (F.col("x.i") != F.col("y.i")))
        .groupBy(F.col("x.i").alias("antecedent"),
                 F.col("y.i").alias("consequent"))
        .agg(F.count(F.lit(1)).alias("support_ab"))
        .filter(F.col("support_ab") >= 3)
    )
    return (
        pair.join(F.broadcast(item.withColumnsRenamed(
            {"i": "antecedent", "s": "support_a"})), "antecedent")
        .join(F.broadcast(item.withColumnsRenamed(
            {"i": "consequent", "s": "support_c"})), "consequent")
        .crossJoin(F.broadcast(n))
        .select(
            "antecedent", "consequent", "support_ab", "support_a",
            "support_c",
            F.round(F.col("support_ab").cast("double")
                    / F.col("support_a").cast("double"), 6)
            .alias("confidence"),
            F.round(F.col("support_ab").cast("double")
                    * F.col("n_baskets").cast("double")
                    / (F.col("support_a").cast("double")
                       * F.col("support_c").cast("double")), 6)
            .alias("lift"),
        )
    )


DQ_REPORT_ORACLE = """
WITH ri AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COUNT(*) FILTER (c.c_custkey IS NULL) AS BIGINT) AS f
  FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
),
uq AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COUNT(*) FILTER (cnt > 1) AS BIGINT) AS f
  FROM (SELECT c_custkey, COUNT(*) AS cnt FROM customer GROUP BY 1)
),
rng AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COUNT(*) FILTER (l_quantity < 1 OR l_quantity > 50)
              AS BIGINT) AS f
  FROM lineitem
),
nn AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COUNT(*) FILTER (o_orderdate IS NULL) AS BIGINT) AS f
  FROM orders
),
ev AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COUNT(*) FILTER (user_id IS NULL) AS BIGINT) AS f
  FROM events
)
SELECT 'orders_custkey_ri' AS check_name, n AS n_checked, f AS n_failed,
       CAST(f = 0 AS INT) AS pass FROM ri
UNION ALL SELECT 'customer_key_unique', n, f, CAST(f = 0 AS INT) FROM uq
UNION ALL SELECT 'lineitem_qty_range', n, f, CAST(f = 0 AS INT) FROM rng
UNION ALL SELECT 'orders_date_not_null', n, f, CAST(f = 0 AS INT) FROM nn
UNION ALL SELECT 'events_user_null_rate', n, f,
                 CAST(f * 100 <= n AS INT) FROM ev
"""


@register("dq_report", oracle=DQ_REPORT_ORACLE,
          tags=("data-quality", "audit", "report"))
def dq_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality expectation suite as ONE report frame (the
    dbt-tests / Great-Expectations surface): referential integrity
    (orders→customer orphans via a broadcast left join), key
    uniqueness, accepted value range, not-null, and a null-rate
    threshold (≤1%) — each check one aggregate over its pruned
    columns, unioned into (check_name, n_checked, n_failed, pass).
    The report is the CI gate a lakehouse pipeline runs per batch; at
    100 TB each leg is a map-side-combinable count over a narrow
    projection."""
    o = read_table(spark, sf_dir, "orders", ["o_custkey", "o_orderdate"],
                   hint_broadcast=False)
    c = read_table(spark, sf_dir, "customer", ["c_custkey"],
                   hint_broadcast=False)
    l = read_table(spark, sf_dir, "lineitem", ["l_quantity"],
                   hint_broadcast=False)
    e = read_table(spark, sf_dir, "events", ["user_id"],
                   hint_broadcast=False)

    def report(name, frame, n_col, f_col, pass_cond=None):
        agg = frame.agg(n_col.alias("n_checked"), f_col.alias("n_failed"))
        p = (pass_cond if pass_cond is not None
             else (F.col("n_failed") == 0))
        return agg.select(F.lit(name).alias("check_name"), "n_checked",
                          "n_failed", p.cast("int").alias("pass"))

    cnt = F.count(F.lit(1)).cast("long")
    ri = report(
        "orders_custkey_ri",
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left"),
        cnt, F.sum(F.col("c_custkey").isNull().cast("long")))
    uq = report(
        "customer_key_unique",
        c.groupBy("c_custkey").agg(F.count(F.lit(1)).alias("cnt")),
        cnt, F.sum((F.col("cnt") > 1).cast("long")))
    rng = report(
        "lineitem_qty_range", l, cnt,
        F.sum(((F.col("l_quantity") < 1)
               | (F.col("l_quantity") > 50)).cast("long")))
    nn = report("orders_date_not_null", o, cnt,
                F.sum(F.col("o_orderdate").isNull().cast("long")))
    ev = report("events_user_null_rate", e, cnt,
                F.sum(F.col("user_id").isNull().cast("long")),
                pass_cond=(F.col("n_failed") * 100 <= F.col("n_checked")))
    return ri.unionByName(uq).unionByName(rng).unionByName(nn) \
        .unionByName(ev)


#: Benford first-digit probabilities log10(1+1/d), fixed 9-decimal
#: literals computed once driver-side — both engines consume identical
#: constants instead of racing libm (the decay_weights discipline).
_BENFORD = {1: "0.301029996", 2: "0.176091259", 3: "0.124938737",
            4: "0.096910013", 5: "0.079181246", 6: "0.066946790",
            7: "0.057991947", 8: "0.051152522", 9: "0.045757491"}


def _benford_oracle() -> str:
    pcase = " ".join(
        f"WHEN {d} THEN {p}" for d, p in _BENFORD.items())
    return f"""
WITH c AS (
  SELECT CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS v
  FROM orders
),
fd AS (
  SELECT CAST(substr(CAST(v AS VARCHAR), 1, 1) AS BIGINT) AS digit
  FROM c WHERE v > 0
),
obs AS (
  SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM fd GROUP BY digit
),
t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM obs),
x AS (
  SELECT o.digit, o.n, t.total,
         CASE o.digit {pcase} END AS p_benford
  FROM obs o, t
)
SELECT digit, n,
       ROUND(CAST(n AS DOUBLE) / CAST(total AS DOUBLE), 6) AS p_observed,
       CAST(p_benford AS DOUBLE) AS p_benford,
       ROUND((CAST(n AS DOUBLE) - CAST(total AS DOUBLE) * p_benford)
             * (CAST(n AS DOUBLE) - CAST(total AS DOUBLE) * p_benford)
             / (CAST(total AS DOUBLE) * p_benford), 6) AS chi2_term
FROM x
"""


@register("benford_check", oracle=_benford_oracle(),
          tags=("data-quality", "forensics", "benford"))
def benford_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit forensic check on order amounts — the
    fraud/synthetic-data screen auditors run on financial columns:
    observed first-digit shares vs log10(1+1/d) with per-digit χ²
    terms. The first digit comes from INTEGER CENTS via string head
    (decimal→int→varchar is engine-identical; float→string is not),
    Benford probabilities are fixed 9-decimal literals computed once
    driver-side (no libm on the compare path — the decay_weights
    discipline), and every output is an IEEE expression of exact
    counts rounded once."""
    o = read_table(spark, sf_dir, "orders", ["o_totalprice"],
                   hint_broadcast=False)
    v = (F.col("o_totalprice").cast("decimal(12,2)") * 100).cast("long")
    fd = (o.select(v.alias("v")).filter(F.col("v") > 0)
          .select(F.substring(F.col("v").cast("string"), 1, 1)
                  .cast("long").alias("digit")))
    obs = fd.groupBy("digit").agg(F.count(F.lit(1)).cast("long").alias("n"))
    t = obs.agg(F.sum("n").cast("long").alias("total"))
    pb = F.lit(None).cast("double")
    for d, p in sorted(_BENFORD.items(), reverse=True):
        pb = F.when(F.col("digit") == d, F.lit(float(p))).otherwise(pb)
    x = obs.crossJoin(F.broadcast(t)).withColumn("p_benford", pb)
    nd = F.col("n").cast("double")
    td = F.col("total").cast("double")
    return x.select(
        "digit", "n",
        F.round(nd / td, 6).alias("p_observed"),
        F.col("p_benford"),
        F.round((nd - td * F.col("p_benford"))
                * (nd - td * F.col("p_benford"))
                / (td * F.col("p_benford")), 6).alias("chi2_term"))
