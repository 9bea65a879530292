"""Window / order-dependent operator coverage (SURVEY.md §2.5).

The reference implements every order-dependent operator as imperative
per-partition code after a hand-placed shuffle (sessionization.py,
q03_utils.py CUDA kernel, q08_utils.py). Here each one is a
`pyspark.sql.Window` expression — the partitionBy implies the same single
shuffle, and Catalyst/Tungsten run the sort + frame scan JVM-side.

Ordering determinism: every window orders by (ts, event_id) / adds a unique
tiebreak column so Spark and the DuckDB oracle sort identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gpu_bdb_spark.functions import dec, micros
from gpu_bdb_spark.io import read_table
from gpu_bdb_spark.operators.sessionize import session_stats, sessionize
from gpu_bdb_spark.operators.stats import regression_sums, slope_intercept
from gpu_bdb_spark.operators.temporal import trailing_event_stats
from gpu_bdb_spark.queries.registry import register

# ---------------------------------------------------------------------------
# Timeout sessionization (reference sessionization.py:54-97, used by
# q02:103-119, q04, q30)
# ---------------------------------------------------------------------------

SESSIONIZE_ORACLE = """
WITH flagged AS (
  SELECT user_id, ts, event_id,
    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 3600 * 1000000::BIGINT
         THEN 1 ELSE 0 END AS new_session
  FROM events
  WHERE user_id IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, ts, event_id,
    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM flagged
),
per_session AS (
  SELECT user_id, session_seq,
         COUNT(*) AS n_events,
         (MAX(epoch_us(ts)) - MIN(epoch_us(ts))) / 1000000.0 AS duration_s
  FROM sess GROUP BY user_id, session_seq
)
SELECT user_id,
       COUNT(*) AS n_sessions,
       CAST(SUM(n_events) AS BIGINT) AS n_events,
       CAST(SUM(n_events) AS DOUBLE) / COUNT(*) AS events_per_session,
       ROUND(MAX(duration_s), 6) AS max_session_duration_s
FROM per_session
GROUP BY user_id
"""


@register("sessionize_events", oracle=SESSIONIZE_ORACLE,
          tags=("window", "sessionize"), bench=True)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timeout sessionization (gap > 3600 s ⇒ new session) rolled up per
    user. Window port of reference sessionization.py:54-97 — the
    `partitionBy(user_id)` window implies the reference's hand-placed
    `shuffle(on='wcs_user_sk')` (q02:104).
    """
    e = read_table(spark, sf_dir, "events", ["user_id", "ts", "event_id"],
                   hint_broadcast=False)
    sess = sessionize(e, "user_id", "ts", 3600, tiebreak_col="event_id")
    per_session = session_stats(sess, "user_id", "ts", "session_seq")
    return per_session.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n_events").alias("n_events"),
        (F.sum("n_events").cast("double") / F.count(F.lit(1))).alias(
            "events_per_session"),
        F.round(F.max("duration_s"), 6).alias("max_session_duration_s"),
    )


# ---------------------------------------------------------------------------
# Ranking per group (absent in reference — SURVEY §2.5 "free in Spark")
# ---------------------------------------------------------------------------

WINDOW_RANK_ORACLE = """
WITH ranked AS (
  SELECT o_custkey, o_orderkey, o_totalprice,
    row_number() OVER (PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey) AS rn,
    rank() OVER (PARTITION BY o_custkey
                 ORDER BY year(o_orderdate) DESC) AS year_rank,
    ntile(4) OVER (PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey) AS price_quartile
  FROM orders
)
SELECT o_custkey, o_orderkey, o_totalprice, rn, year_rank, price_quartile
FROM ranked WHERE rn <= 3
"""


@register("window_rank_orders", oracle=WINDOW_RANK_ORACLE,
          tags=("window", "rank", "topk-per-group"), bench=True)
def window_rank_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer via row_number, plus rank (with real ties)
    and ntile. The scalable top-k-per-group: one shuffle on the partition
    key, no global sort."""
    o = read_table(spark, sf_dir, "orders", hint_broadcast=False)
    by_price = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey"))
    by_year = Window.partitionBy("o_custkey").orderBy(
        F.desc(F.year("o_orderdate")))
    return (
        o.select(
            "o_custkey", "o_orderkey", "o_totalprice",
            F.row_number().over(by_price).cast("long").alias("rn"),
            F.rank().over(by_year).cast("long").alias("year_rank"),
            F.ntile(4).over(by_price).cast("long").alias("price_quartile"),
        )
        .filter(F.col("rn") <= 3)
    )


# ---------------------------------------------------------------------------
# lag / lead gaps (reference sessionization.py:39-41 ts.diff(),
# q08_utils.py:70-74 shift)
# ---------------------------------------------------------------------------

LAG_GAPS_ORACLE = """
WITH gaps AS (
  SELECT user_id,
    epoch_us(ts) - lag(epoch_us(ts))
      OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us,
    lead(event_type)
      OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
  FROM events
)
SELECT user_id,
       COUNT(gap_us) AS n_gaps,
       CAST(SUM(gap_us) AS BIGINT) AS total_gap_us,
       CAST(SUM(gap_us) AS DOUBLE) / COUNT(gap_us) AS avg_gap_us,
       MAX(gap_us) AS max_gap_us,
       COUNT(*) FILTER (WHERE next_type = 'purchase') AS n_before_purchase
FROM gaps
GROUP BY user_id
"""


@register("lag_gaps", oracle=LAG_GAPS_ORACLE, tags=("window", "lag-lead"))
def lag_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event gap statistics via lag/lead (reference diff/shift sites).
    Gap sums stay integer microseconds (exact); the average divides two
    exact integers in double."""
    e = read_table(spark, sf_dir, "events", ["user_id", "ts", "event_id",
                                             "event_type"], hint_broadcast=False)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gaps = e.select(
        "user_id",
        (us - F.lag(us).over(w)).alias("gap_us"),
        F.lead("event_type").over(w).alias("next_type"),
    )
    return gaps.groupBy("user_id").agg(
        F.count("gap_us").alias("n_gaps"),
        F.sum("gap_us").alias("total_gap_us"),
        (F.sum("gap_us").cast("double") / F.count("gap_us")).alias("avg_gap_us"),
        F.max("gap_us").alias("max_gap_us"),
        F.count(F.when(F.col("next_type") == "purchase", 1)).alias(
            "n_before_purchase"),
    )


# ---------------------------------------------------------------------------
# Argmax / last-event-per-group (reference q04_utils.py:52-75
# concat-string max trick → F.max_by)
# ---------------------------------------------------------------------------

LAST_EVENT_ORACLE = """
SELECT user_id,
       arg_max(event_type, ts) AS last_event_type,
       arg_max(event_id, ts) AS last_event_id,
       MAX(ts) AS last_ts
FROM events
GROUP BY user_id
"""


@register("last_event_per_user", oracle=LAST_EVENT_ORACLE,
          tags=("argmax", "max-by"))
def last_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last event per user via max_by — replaces the reference's
    max(concat(tstamp, ':', type_code)) string trick (q04_utils.py:52-75)."""
    e = read_table(spark, sf_dir, "events", ["user_id", "ts", "event_id",
                                             "event_type"], hint_broadcast=False)
    return e.groupBy("user_id").agg(
        F.max_by("event_type", F.col("ts")).alias("last_event_type"),
        F.max_by("event_id", F.col("ts")).alias("last_event_id"),
        F.max("ts").alias("last_ts"),
    )


# ---------------------------------------------------------------------------
# Running cumulative aggregation (reference cumsum q10:70-71 global
# positions; here the per-group frame-spec form)
# ---------------------------------------------------------------------------

CUMULATIVE_ORACLE = """
SELECT o_custkey, o_orderkey,
  ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4)))
       OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS UNBOUNDED PRECEDING) AS DOUBLE), 2) AS cum_spend,
  row_number() OVER (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey) AS order_seq
FROM orders
"""


@register("cumulative_spend", oracle=CUMULATIVE_ORACLE,
          tags=("window", "cumsum"))
def cumulative_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer running spend (frame-spec window sum in exact decimal)."""
    o = read_table(spark, sf_dir, "orders", hint_broadcast=False)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey", "o_orderkey",
        F.round(
            F.sum(dec("o_totalprice")).over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ).cast("double"), 2).alias("cum_spend"),
        F.row_number().over(w).cast("long").alias("order_seq"),
    )


# ---------------------------------------------------------------------------
# Last-N-events-before (reference q03 CUDA kernel q03_utils.py:54-99 —
# previous-5-rows window + time bound, no kernel needed)
# ---------------------------------------------------------------------------

LAST_VIEWS_ORACLE = """
WITH e AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events
),
pairs AS (
  SELECT p.user_id, p.event_id AS purchase_id,
         v.event_id AS view_id, v.event_type AS prev_type,
         p.us - v.us AS gap_us,
         row_number() OVER (PARTITION BY p.event_id
                            ORDER BY v.us DESC, v.event_id DESC) AS recency
  FROM e p JOIN e v
    ON v.user_id = p.user_id
   AND (v.us < p.us OR (v.us = p.us AND v.event_id < p.event_id))
  WHERE p.event_type = 'purchase'
)
SELECT user_id, purchase_id, view_id, recency
FROM pairs
WHERE recency <= 5 AND prev_type = 'view' AND gap_us <= 86400 * 1000000::BIGINT
"""


@register("last_views_before_purchase", oracle=LAST_VIEWS_ORACLE,
          tags=("window", "last-n-before"), bench=True)
def last_views_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Views among the 5 events preceding each purchase, within 1 day —
    the reference's q03 semantics (last-5-views-within-10-days,
    q03_utils.py:54-170) rebuilt as a rowsBetween(-5,-1) window +
    higher-order array ops. The oracle's self-join formulation is
    quadratic per user; this plan is O(rows·N) after one shuffle — the
    100 TB-safe shape.
    """
    e = read_table(spark, sf_dir, "events", ["user_id", "ts", "event_id",
                                             "event_type"], hint_broadcast=False)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(-5, -1)
    )
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    prev = F.collect_list(
        F.struct(us.alias("us"), F.col("event_id").alias("view_id"),
                 F.col("event_type").alias("prev_type"))
    ).over(w)
    with_prev = e.select(
        "user_id", F.col("event_id").alias("purchase_id"),
        F.col("event_type"), us.alias("p_us"), prev.alias("prev"))
    # collect_list over an ASC window yields ascending order; recency rank
    # of element i (0-based) in an array of size s is s - i.
    enumerated = with_prev.withColumn(
        "prev",
        F.filter(
            F.transform(
                "prev",
                lambda x, i: F.struct(
                    x["us"].alias("us"),
                    x["view_id"].alias("view_id"),
                    x["prev_type"].alias("prev_type"),
                    (F.size(F.col("prev")) - i).alias("recency"),
                ),
            ),
            lambda x: (x["prev_type"] == F.lit("view"))
            & ((F.col("p_us") - x["us"]) <= F.lit(86400 * 1_000_000)),
        ),
    )
    return (
        enumerated.filter(F.col("event_type") == "purchase")
        .select("user_id", "purchase_id", F.explode("prev").alias("v"))
        .select(
            "user_id", "purchase_id",
            F.col("v.view_id").alias("view_id"),
            F.col("v.recency").cast("long").alias("recency"),
        )
    )


# ---------------------------------------------------------------------------
# Regression slope per group (reference q15:80-140 declining categories)
# ---------------------------------------------------------------------------

SALES_SLOPE_ORACLE = """
WITH daily AS (
  SELECT p.p_brand,
         date_diff('day', TIMESTAMP '1970-01-01 00:00:00', l.l_shipdate) AS day_num,
         SUM(CAST(l.l_extendedprice AS DECIMAL(12,4))) AS day_rev
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY 1, 2
),
sums AS (
  SELECT p_brand,
         COUNT(*) AS n,
         SUM(CAST(day_num AS DECIMAL(10,2))) AS sx,
         SUM(CAST(day_rev AS DECIMAL(14,4))) AS sy,
         SUM(CAST(day_num AS DECIMAL(10,2)) * CAST(day_rev AS DECIMAL(14,4))) AS sxy,
         SUM(CAST(day_num AS DECIMAL(10,2)) * CAST(day_num AS DECIMAL(10,2))) AS sxx
  FROM daily GROUP BY p_brand
),
-- decimal→double via VARCHAR: DuckDB's direct cast double-rounds
-- (int128→double, then /10^scale) once the integer form exceeds 2^53
-- (sxy at sf1: 1.3e20), while Spark's BigDecimal cast rounds once —
-- the varchar path is correctly rounded and matches Spark exactly
-- (measured 1-ulp intercept mismatch at sf1, Brand#5)
d AS (
  SELECT p_brand, n,
         CAST(n AS DOUBLE) AS nd,
         CAST(CAST(sx AS VARCHAR) AS DOUBLE) AS sxd,
         CAST(CAST(sy AS VARCHAR) AS DOUBLE) AS syd,
         CAST(CAST(sxy AS VARCHAR) AS DOUBLE) AS sxyd,
         CAST(CAST(sxx AS VARCHAR) AS DOUBLE) AS sxxd
  FROM sums
)
SELECT p_brand, n,
  ROUND((nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd), 6) AS slope,
  ROUND((syd - ((nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd))
           * sxd) / nd, 6) AS intercept
FROM d
"""


@register("sales_slope_by_brand", oracle=SALES_SLOPE_ORACLE,
          tags=("regression", "stats"))
def sales_slope_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Least-squares sales trend per brand from exact sufficient statistics
    (reference q15:102-134 declining-categories regression)."""
    l = read_table(spark, sf_dir, "lineitem",
                   ["l_partkey", "l_shipdate", "l_extendedprice"],
                   hint_broadcast=False)
    p = read_table(spark, sf_dir, "part", ["p_partkey", "p_brand"])
    daily = (
        l.join(p, l.l_partkey == p.p_partkey)
        .groupBy(
            "p_brand",
            F.datediff(F.col("l_shipdate"), F.lit("1970-01-01").cast("date"))
            .alias("day_num"),
        )
        .agg(F.sum(dec("l_extendedprice")).alias("day_rev"))
    )
    sums = regression_sums(daily, ["p_brand"], F.col("day_num"), F.col("day_rev"))
    return slope_intercept(sums).select("p_brand", "n", "slope", "intercept")


ROLLING_24H_ORACLE = """
SELECT event_id, user_id,
       COUNT(*) OVER w AS n_24h,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(12,4))) OVER w AS DOUBLE), 2)
         AS sum_24h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW)
"""


@register("rolling_user_24h", oracle=ROLLING_24H_ORACLE,
          tags=("window", "range-frame", "rolling"))
def rolling_user_24h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event trailing-24-hour activity: count and exact decimal sum
    of the same user's events in [t − 24h, t] (RANGE peers — not ROWS —
    so simultaneous events are full peers in both engines). Computed by
    PREFIX SUMS (operators/temporal.trailing_event_stats), not a
    trailing RANGE frame: Spark's sliding frames re-accumulate from
    frame start per slide — O(n · rows_in_frame) per key, quadratic on
    a bot-grade user whose events pack inside one window span (measured
    1783.5 s vs 9.2 s on a 200k-event packed hot user, SCALE.md). The
    prefix shape is density-independent: two signed probe rows per
    event against ONE incremental UNBOUNDED-PRECEDING frame, join-free,
    and bit-exact-equal to the frame form on exact decimals
    (test_temporal.py pins both edge conventions)."""
    e = read_table(spark, sf_dir, "events",
                   ["event_id", "user_id", "ts", "value"],
                   hint_broadcast=False)
    stats = trailing_event_stats(
        e, "user_id", "ts", "event_id", "value", 86_400_000_000,
        include_current=True, value_decimal="decimal(12,4)")
    return stats.select(
        "event_id",
        "user_id",
        F.col("n").alias("n_24h"),
        F.round(F.col("sum_v").cast("double"), 2).alias("sum_24h"),
    )


SCD2_ORACLE = """
WITH o AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
              THEN 1 ELSE 0 END AS chg
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
r AS (
  SELECT *, SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS run_id
  FROM o
),
runs AS (
  SELECT user_id, CAST(run_id AS BIGINT) AS run_id,
         any_value(event_type) AS event_type,
         MIN(ts) AS valid_from,
         COUNT(*) AS n_events
  FROM r GROUP BY user_id, run_id
)
SELECT user_id, run_id, event_type, valid_from,
       lead(valid_from) OVER (PARTITION BY user_id ORDER BY run_id)
         AS valid_to,
       n_events
FROM runs
"""


@register("scd2_intervals", oracle=SCD2_ORACLE,
          tags=("window", "scd2", "gaps-and-islands"))
def scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 history build: consecutive
    same-type runs per user collapse to (valid_from, valid_to)
    intervals via gaps-and-islands (change flag → running run id → run
    aggregate → lead for the closing edge). Both windows share the
    user partitioning, so the whole history build is ONE shuffle."""
    e = read_table(spark, sf_dir, "events",
                   ["user_id", "ts", "event_id", "event_type"],
                   hint_broadcast=False)
    w = (Window.partitionBy("user_id")
         .orderBy(F.col("ts").asc(), F.col("event_id").asc()))
    chg = F.when(
        ~F.lag("event_type").over(w).eqNullSafe(F.col("event_type")), 1
    ).otherwise(0)
    r = e.select(
        "user_id", "ts", "event_id", "event_type", chg.alias("chg")
    ).withColumn(
        "run_id",
        F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long"),
    )
    runs = r.groupBy("user_id", "run_id").agg(
        F.any_value("event_type").alias("event_type"),
        F.min("ts").alias("valid_from"),
        F.count(F.lit(1)).alias("n_events"),
    )
    wr = Window.partitionBy("user_id").orderBy("run_id")
    return runs.select(
        "user_id", "run_id", "event_type", "valid_from",
        F.lead("valid_from").over(wr).alias("valid_to"),
        "n_events",
    )


SESSION_PATHS_ORACLE = """
WITH flagged AS (
  SELECT user_id, ts, event_id, event_type,
    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
              > 3600 * 1000000::BIGINT
         THEN 1 ELSE 0 END AS new_session
  FROM events
  WHERE user_id IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, ts, event_id, event_type,
    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM flagged
),
pos AS (
  SELECT user_id, session_seq, event_type,
         row_number() OVER (PARTITION BY user_id, session_seq
                            ORDER BY ts, event_id) AS p
  FROM sess
),
p3 AS (
  SELECT user_id, session_seq,
         string_agg(event_type, '>' ORDER BY p) AS path,
         CAST(COUNT(*) AS INT) AS depth
  FROM pos WHERE p <= 3 GROUP BY 1, 2
)
SELECT path, depth, CAST(COUNT(*) AS BIGINT) AS n_sessions
FROM p3 GROUP BY 1, 2
"""


@register("session_paths", oracle=SESSION_PATHS_ORACLE,
          tags=("sessionize", "paths", "funnel"))
def session_paths_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top session-opening paths (first 3 event types per 1-hour-gap
    session): the sessionize window, per-session row_number, and
    (user, session) aggregate all share ONE user-key exchange; the
    only other shuffle is the final path count."""
    from gpu_bdb_spark.operators.sessionize import session_paths

    e = read_table(spark, sf_dir, "events",
                   ["user_id", "ts", "event_id", "event_type"],
                   hint_broadcast=False)
    return session_paths(e, timeout_s=3600, depth=3)


ROLLING_ZSCORE_ORACLE = """
WITH s AS (
  SELECT event_id, user_id, value,
         COUNT(value) OVER w AS n_prev,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sx,
         CAST(SUM(CAST(value AS DECIMAL(18,6))
                  * CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sxx
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
               RANGE BETWEEN 604800000000 PRECEDING AND 1 PRECEDING)
),
z AS (
  SELECT event_id, user_id, n_prev,
         CASE WHEN n_prev >= 2
                   AND (sxx - sx * sx / CAST(n_prev AS DOUBLE))
                       / CAST(n_prev - 1 AS DOUBLE) > 0
              THEN (value - sx / CAST(n_prev AS DOUBLE))
                   / sqrt((sxx - sx * sx / CAST(n_prev AS DOUBLE))
                          / CAST(n_prev - 1 AS DOUBLE))
         END AS zraw
  FROM s
)
SELECT event_id, user_id, CAST(n_prev AS BIGINT) AS n_prev,
       ROUND(zraw, 6) AS z,
       CAST(CASE WHEN zraw IS NOT NULL AND abs(zraw) > 3
                 THEN 1 ELSE 0 END AS INT) AS is_anomaly
FROM z
"""


@register("rolling_zscore", oracle=ROLLING_ZSCORE_ORACLE,
          tags=("window", "anomaly", "zscore"), bench=True)
def rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-baseline anomaly flag: each event's value scored
    against the SAME USER'S prior 7 days (exclusive RANGE frame — peers
    at the current instant are excluded in both engines). Sufficient
    statistics are exact decimal window sums; the finishing
    mean/variance/z arithmetic runs in correctly-rounded double in ONE
    fixed order on identical inputs, so even the |z| > 3 cut compares
    bit-identical doubles cross-engine (ab_test_conversion argument);
    degenerate baselines (n < 2 or non-positive variance from float
    cancellation) yield NULL deterministically. Computed by PREFIX SUMS
    (operators/temporal.trailing_event_stats) instead of a sliding
    RANGE frame — the frame form is O(n · rows_in_frame) per key
    (quadratic on a packed hot user, measured 194× slower in SCALE.md);
    the prefix sufficient statistics are exact decimals equal to the
    frame form's bit-for-bit, and the finishing mean/variance/z chain
    below is the SAME fixed IEEE order, so the output (including the
    |z| > 3 cut) is unchanged. The event's own value rides the probe
    rows as payload — no join back to the fact."""
    e = read_table(spark, sf_dir, "events",
                   ["event_id", "user_id", "ts", "value"],
                   hint_broadcast=False)
    stats = trailing_event_stats(
        e, "user_id", "ts", "event_id", "value", 604_800_000_000,
        include_current=False, value_decimal="decimal(18,6)",
        count_nonnull=True, payload=("value",))
    n = F.col("n")
    sx = F.col("sum_v").cast("double")
    sxx = F.col("sum_v2").cast("double")
    nd = n.cast("double")
    var = (sxx - sx * sx / nd) / (n - 1).cast("double")
    zraw = F.when(
        (n >= 2) & (var > 0),
        (F.col("value") - sx / nd) / F.sqrt(var))
    return stats.select(
        "event_id", "user_id",
        n.cast("long").alias("n_prev"),
        F.round(zraw, 6).alias("z"),
        F.when(zraw.isNotNull() & (F.abs(zraw) > 3), 1).otherwise(0)
        .cast("int").alias("is_anomaly"),
    )


EXPANDING_ZSCORE_ORACLE = """
WITH s AS (
  SELECT event_id, user_id, value,
         COUNT(value) OVER w AS n_prev,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sx,
         CAST(SUM(CAST(value AS DECIMAL(18,6))
                  * CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sxx
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
z AS (
  SELECT event_id, user_id, n_prev,
         CASE WHEN n_prev >= 2
                   AND (sxx - sx * sx / CAST(n_prev AS DOUBLE))
                       / CAST(n_prev - 1 AS DOUBLE) > 0
              THEN (value - sx / CAST(n_prev AS DOUBLE))
                   / sqrt((sxx - sx * sx / CAST(n_prev AS DOUBLE))
                          / CAST(n_prev - 1 AS DOUBLE))
         END AS zraw
  FROM s
)
SELECT event_id, user_id, CAST(n_prev AS BIGINT) AS n_prev,
       ROUND(zraw, 6) AS z
FROM z
"""


@register("expanding_zscore", oracle=EXPANDING_ZSCORE_ORACLE,
          tags=("window", "anomaly", "expanding"))
def expanding_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-history z-score: each event's value against the SAME USER'S
    entire prior stream (expanding ROWS frame over the (ts, event_id)
    total order) — the companion to `rolling_zscore`'s trailing-window
    baseline, and the batch twin of
    `streaming.streaming_expanding_zscore` (whose drained output equals
    this bit-for-bit; the streaming state is just (n, Σx, Σx²) as exact
    integers). Same exactness argument: decimal sufficient statistics,
    fixed IEEE finishing order."""
    e = read_table(spark, sf_dir, "events",
                   ["event_id", "user_id", "ts", "value"],
                   hint_broadcast=False)
    w = (
        Window.partitionBy("user_id")
        .orderBy(micros("ts"), "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    v6 = F.col("value").cast("decimal(18,6)")
    n = F.count("value").over(w)
    sx = F.sum(v6).over(w).cast("double")
    sxx = F.sum(v6 * v6).over(w).cast("double")
    nd = n.cast("double")
    var = (sxx - sx * sx / nd) / (n - 1).cast("double")
    zraw = F.when(
        (n >= 2) & (var > 0),
        (F.col("value") - sx / nd) / F.sqrt(var))
    return e.select(
        "event_id", "user_id",
        n.cast("long").alias("n_prev"),
        F.round(zraw, 6).alias("z"),
    )


CONCURRENCY_ORACLE = """
WITH flagged AS (
  SELECT user_id, ts, event_id,
    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 3600 * 1000000::BIGINT
         THEN 1 ELSE 0 END AS new_session
  FROM events
  WHERE user_id IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, ts, event_id,
    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM flagged
),
iv AS (
  SELECT user_id, session_seq,
         MIN(epoch_us(ts)) AS s_us, MAX(epoch_us(ts)) AS e_us
  FROM sess GROUP BY user_id, session_seq
),
pts AS (
  SELECT s_us AS t, CAST(1 AS BIGINT) AS delta FROM iv
  UNION ALL
  SELECT e_us + 1, CAST(-1 AS BIGINT) FROM iv
  UNION ALL
  -- zero-delta sample at each midnight an interval crosses, so a day
  -- whose concurrency is entirely carried over from sessions that
  -- began the previous day still gets a (correct) max row
  SELECT unnest(generate_series(
           (s_us // 86400000000 + 1) * 86400000000,
           (e_us // 86400000000) * 86400000000,
           86400000000::BIGINT)), CAST(0 AS BIGINT)
  FROM iv
),
curve AS (
  SELECT t, SUM(delta) OVER (
    ORDER BY t, CASE WHEN delta = 1 THEN 0 WHEN delta = -1 THEN 1
                     ELSE 2 END
    ROWS UNBOUNDED PRECEDING) AS conc
  FROM pts
)
SELECT CAST(t // 86400000000 AS BIGINT) AS day,
       CAST(MAX(conc) AS BIGINT) AS max_concurrent
FROM curve GROUP BY 1
"""


@register("concurrency_curve", oracle=CONCURRENCY_ORACLE,
          tags=("window", "sweep-line", "sessions"))
def concurrency_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions per day by SWEEP LINE: sessionized
    intervals become ±1 boundary points, one running sum over the
    collapsed 2·|sessions|-row point frame forms the concurrency
    curve, and the daily max is one aggregate — the capacity-planning
    number computed without expanding intervals into per-minute rows
    (the interval-to-grid explosion this formulation exists to avoid).
    Boundary order (t, +1 before −1) makes touching sessions count as
    overlapping at the instant — deterministic on both engines. A
    zero-delta sample point is injected at every midnight an interval
    crosses (≤ days-spanned extra rows per session), so a day whose
    peak is entirely carried over from sessions opened the previous
    day is sampled correctly instead of getting no row."""
    e = read_table(spark, sf_dir, "events", ["user_id", "ts", "event_id"],
                   hint_broadcast=False)
    sess = sessionize(e, "user_id", "ts", 3600, tiebreak_col="event_id")
    iv = sess.groupBy("user_id", "session_seq").agg(
        F.min(micros("ts")).alias("s_us"),
        F.max(micros("ts")).alias("e_us"))
    day_us = F.lit(86_400_000_000)
    s_day = F.floor(F.col("s_us") / day_us)
    e_day = F.floor(F.col("e_us") / day_us)
    pts = iv.select(F.col("s_us").alias("t"),
                    F.lit(1).cast("long").alias("delta")).unionByName(
        iv.select((F.col("e_us") + 1).alias("t"),
                  F.lit(-1).cast("long").alias("delta"))).unionByName(
        iv.select(
            F.explode(
                F.when(e_day > s_day,
                       F.sequence((s_day + 1) * day_us, e_day * day_us,
                                  day_us))
                .otherwise(F.array().cast("array<long>"))).alias("t"),
        ).select("t", F.lit(0).cast("long").alias("delta")))
    ordr = (F.when(F.col("delta") == 1, 0)
            .when(F.col("delta") == -1, 1).otherwise(2))
    w = Window.orderBy(F.col("t"), ordr).rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    curve = pts.select("t", F.sum("delta").over(w).alias("conc"))
    return (
        curve.groupBy(
            F.floor(F.col("t") / F.lit(86_400_000_000)).cast("long")
            .alias("day"))
        .agg(F.max("conc").cast("long").alias("max_concurrent"))
    )


MOM_GROWTH_ORACLE = """
WITH m AS (
  SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT)
           AS ym,
         SUM(CAST(o_totalprice AS DECIMAL(12,4))) AS rev,
         CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY 1
),
g AS (
  SELECT ym, n_orders, rev,
         lag(rev) OVER (ORDER BY ym) AS prev
  FROM m
)
SELECT ym, n_orders,
       ROUND(CAST(rev AS DOUBLE), 2) AS revenue,
       CASE WHEN prev IS NOT NULL AND prev <> 0
            THEN ROUND(CAST(rev - prev AS DOUBLE) / CAST(prev AS DOUBLE),
                       6) END AS mom_growth
FROM g
"""


@register("mom_growth", oracle=MOM_GROWTH_ORACLE,
          tags=("window", "kpi", "growth"))
def mom_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth — the KPI-dashboard staple: one
    monthly decimal aggregate, one lag over the collapsed months frame,
    growth as an IEEE division of exact decimal differences with the
    zero/first-month cases deterministically NULL (the ab_test se
    guard pattern)."""
    from pyspark.sql import Window as W

    o = read_table(spark, sf_dir, "orders",
                   ["o_orderdate", "o_totalprice"], hint_broadcast=False)
    m = o.groupBy(
        (F.year("o_orderdate") * 100 + F.month("o_orderdate"))
        .cast("long").alias("ym")
    ).agg(F.sum(dec("o_totalprice")).alias("rev"),
          F.count(F.lit(1)).cast("long").alias("n_orders"))
    g = m.withColumn("prev", F.lag("rev").over(W.orderBy("ym")))
    growth = F.when(
        F.col("prev").isNotNull() & (F.col("prev") != 0),
        F.round((F.col("rev") - F.col("prev")).cast("double")
                / F.col("prev").cast("double"), 6))
    return g.select(
        "ym", "n_orders",
        F.round(F.col("rev").cast("double"), 2).alias("revenue"),
        growth.alias("mom_growth"))
