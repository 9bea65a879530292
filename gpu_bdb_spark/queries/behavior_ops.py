"""Driver-contract entries for the user-behavior analytics operators
(cohort retention, Markov transition matrix, time-decayed engagement)
over the `events` table — each with an exact DuckDB oracle.

The decay oracle embeds the SAME driver-side weight table the Spark
side broadcasts (operators/behavior.decay_weights), so neither engine
evaluates transcendental functions on the comparison path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gpu_bdb_spark.io import read_table
from gpu_bdb_spark.operators.behavior import (
    cohort_retention,
    decay_weights,
    decayed_engagement,
    transition_matrix,
)
from gpu_bdb_spark.queries.registry import register

DAY_US = 86_400 * 1_000_000

COHORT_ORACLE = f"""
WITH up AS (
  SELECT DISTINCT user_id, epoch_us(ts) // {DAY_US} AS period
  FROM events
),
c AS (
  SELECT user_id, period,
         MIN(period) OVER (PARTITION BY user_id) AS cohort_period
  FROM up
),
tri AS (
  SELECT cohort_period, period - cohort_period AS period_offset,
         COUNT(*) AS n_active
  FROM c GROUP BY 1, 2
)
SELECT CAST(cohort_period AS BIGINT) AS cohort_period,
       CAST(period_offset AS BIGINT) AS period_offset,
       n_active,
       CAST(SUM(CASE WHEN period_offset = 0 THEN n_active ELSE 0 END)
            OVER (PARTITION BY cohort_period) AS BIGINT) AS cohort_size,
       ROUND(CAST(n_active AS DOUBLE)
             / CAST(SUM(CASE WHEN period_offset = 0 THEN n_active ELSE 0 END)
                    OVER (PARTITION BY cohort_period) AS DOUBLE), 6)
         AS retention_rate
FROM tri
"""


@register("cohort_retention", oracle=COHORT_ORACLE,
          tags=("behavior", "cohort", "window"))
def cohort_retention_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily cohort-retention triangle over the events stream: users
    cohorted by first-active day, distinct-active counts per (cohort,
    day offset) with the cohort-size denominator. The fact-table shuffle
    carries only deduped (user, day) long pairs."""
    e = read_table(spark, sf_dir, "events", ["user_id", "ts"],
                   hint_broadcast=False)
    return cohort_retention(e, period_us=DAY_US)


TRANSITIONS_ORACLE = """
WITH p AS (
  SELECT event_type AS to_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts ASC, event_id ASC) AS from_type
  FROM events
),
c AS (
  SELECT from_type, to_type, COUNT(*) AS n_transitions
  FROM p WHERE from_type IS NOT NULL GROUP BY 1, 2
)
SELECT from_type, to_type, n_transitions,
       CAST(SUM(n_transitions) OVER (PARTITION BY from_type) AS BIGINT)
         AS n_from_total,
       ROUND(CAST(n_transitions AS DOUBLE)
             / CAST(SUM(n_transitions) OVER (PARTITION BY from_type)
                    AS DOUBLE), 6) AS p_transition
FROM c
"""


@register("event_transitions", oracle=TRANSITIONS_ORACLE,
          tags=("behavior", "markov", "window"))
def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of event types per user:
    one shuffle on user_id for the (ts, event_id)-ordered lag window,
    then a partial-aggregating count down to |types|² rows."""
    e = read_table(spark, sf_dir, "events",
                   ["user_id", "ts", "event_id", "event_type"],
                   hint_broadcast=False)
    return transition_matrix(e)


_DECAY_ANCHOR = "2024-03-01"
_DECAY_HALF_LIFE = 14.0
_DECAY_MAX_AGE = 90

_DECAY_VALUES = ",\n  ".join(
    f"({a}, CAST('{w}' AS DECIMAL(12,9)))"
    for a, w in decay_weights(_DECAY_MAX_AGE, _DECAY_HALF_LIFE)
)

DECAY_ORACLE = f"""
WITH dim(age_days, w) AS (VALUES
  {_DECAY_VALUES}
),
e AS (
  SELECT user_id, CAST(value AS DECIMAL(12,4)) AS v,
         LEAST(GREATEST(datediff('day', CAST(ts AS DATE),
                                 DATE '{_DECAY_ANCHOR}'), 0),
               {_DECAY_MAX_AGE}) AS age_days
  FROM events
)
SELECT user_id, COUNT(*) AS n_events,
       ROUND(CAST(SUM(v * w) AS DOUBLE), 6) AS decayed_score
FROM e JOIN dim USING (age_days)
GROUP BY user_id
"""


@register("decayed_engagement", oracle=DECAY_ORACLE,
          tags=("behavior", "decay", "broadcast-join"))
def decayed_engagement_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user half-life-decayed engagement score (recency-weighted
    value sum). The age→weight curve is a driver-computed decimal
    lookup broadcast to executors AND inlined into the oracle SQL, so
    the comparison never depends on engine libm; accumulation is exact
    DECIMAL."""
    e = read_table(spark, sf_dir, "events", ["user_id", "ts", "value"],
                   hint_broadcast=False)
    return decayed_engagement(
        spark, e, _DECAY_ANCHOR,
        half_life_days=_DECAY_HALF_LIFE, max_age_days=_DECAY_MAX_AGE)


AB_TEST_ORACLE = """
WITH per_user AS (
  SELECT user_id,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           AS converted,
         CASE WHEN CAST(concat('0x',
                substr(md5('ab1:' || CAST(user_id AS VARCHAR)), 1, 8))
                AS BIGINT) % 2 = 0 THEN 'A' ELSE 'B' END AS arm
  FROM events GROUP BY user_id
),
arms AS (
  SELECT arm, COUNT(*) AS n, SUM(converted) AS conv
  FROM per_user GROUP BY arm
),
wide AS (
  SELECT CAST(MAX(CASE WHEN arm = 'A' THEN n END) AS BIGINT) AS n_a,
         CAST(MAX(CASE WHEN arm = 'A' THEN conv END) AS BIGINT) AS conv_a,
         CAST(MAX(CASE WHEN arm = 'B' THEN n END) AS BIGINT) AS n_b,
         CAST(MAX(CASE WHEN arm = 'B' THEN conv END) AS BIGINT) AS conv_b
  FROM arms
),
stats AS (
  SELECT n_a, conv_a, n_b, conv_b,
         CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS ra,
         CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS rb,
         sqrt((CAST(conv_a + conv_b AS DOUBLE)
               / CAST(n_a + n_b AS DOUBLE))
              * (1.0 - CAST(conv_a + conv_b AS DOUBLE)
                       / CAST(n_a + n_b AS DOUBLE))
              * (1.0 / CAST(n_a AS DOUBLE)
                 + 1.0 / CAST(n_b AS DOUBLE))) AS se
  FROM wide
)
SELECT n_a, conv_a, n_b, conv_b,
       ROUND(ra, 6) AS rate_a,
       ROUND(rb, 6) AS rate_b,
       CASE WHEN se > 0 THEN ROUND((ra - rb) / se, 6) END AS z_score
FROM stats
"""


@register("ab_test_conversion", oracle=AB_TEST_ORACLE,
          tags=("behavior", "experiment", "ab-test"))
def ab_test_conversion_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-arm conversion experiment readout over the events stream:
    md5-coin arm assignment, per-user any-purchase conversion, pooled
    two-proportion z-statistic. IEEE-correctly-rounded /,*,sqrt in a
    fixed order make the statistic bit-identical cross-engine."""
    from gpu_bdb_spark.operators.behavior import ab_test_conversion

    e = read_table(spark, sf_dir, "events", ["user_id", "event_type"],
                   hint_broadcast=False)
    return ab_test_conversion(e)


ORDERED_FUNNEL_ORACLE = """
WITH v AS (
  SELECT user_id, MIN(ts) AS view_ts
  FROM events WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, v.view_ts, MIN(e.ts) AS click_ts
  FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.view_ts
  WHERE e.event_type = 'click'
  GROUP BY e.user_id, v.view_ts
),
p AS (
  SELECT e.user_id, c.view_ts, c.click_ts, MIN(e.ts) AS purchase_ts
  FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.click_ts
  WHERE e.event_type = 'purchase'
  GROUP BY e.user_id, c.view_ts, c.click_ts
)
SELECT v.user_id, v.view_ts, c.click_ts, p.purchase_ts,
       CAST(CASE WHEN p.purchase_ts IS NOT NULL THEN 1 ELSE 0 END AS INT)
         AS completed
FROM v
LEFT JOIN c ON c.user_id = v.user_id
LEFT JOIN p ON p.user_id = v.user_id
"""


@register("ordered_funnel", oracle=ORDERED_FUNNEL_ORACLE,
          tags=("behavior", "funnel", "ordered-steps"))
def ordered_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-step ordered funnel (view → click → purchase, strictly
    increasing timestamps, earliest completion): each stage is a
    min-aggregate joined forward — the timestamps are PICKED from the
    data, never computed, so the result is exact by construction. Per
    stage one join + one aggregate on user_id; all stages share the
    user partitioning."""
    from pyspark.sql import functions as F

    e = read_table(spark, sf_dir, "events", ["user_id", "ts", "event_type"],
                   hint_broadcast=False)
    v = (e.filter(F.col("event_type") == "view")
         .groupBy("user_id").agg(F.min("ts").alias("view_ts")))
    c = (e.filter(F.col("event_type") == "click").join(v, "user_id")
         .filter(F.col("ts") > F.col("view_ts"))
         .groupBy("user_id", "view_ts")
         .agg(F.min("ts").alias("click_ts")))
    p = (e.filter(F.col("event_type") == "purchase")
         .join(c.select("user_id", "click_ts"), "user_id")
         .filter(F.col("ts") > F.col("click_ts"))
         .groupBy("user_id", "click_ts")
         .agg(F.min("ts").alias("purchase_ts")))
    return (
        v.join(c.select("user_id", "click_ts"), "user_id", "left")
        .join(p.select("user_id", "purchase_ts"), "user_id", "left")
        .select(
            "user_id", "view_ts", "click_ts", "purchase_ts",
            F.col("purchase_ts").isNotNull().cast("int").alias("completed"),
        )
    )


CHI_SQUARE_ORACLE = """
WITH o AS (
  SELECT lang, source, COUNT(*) AS obs FROM documents GROUP BY 1, 2
),
rt AS (SELECT lang, SUM(obs) AS row_tot FROM o GROUP BY lang),
ct AS (SELECT source, SUM(obs) AS col_tot FROM o GROUP BY source),
n AS (SELECT SUM(obs) AS total FROM o)
SELECT o.lang, o.source, o.obs,
       ROUND(CAST(rt.row_tot AS DOUBLE) * CAST(ct.col_tot AS DOUBLE)
             / CAST(n.total AS DOUBLE), 6) AS expected,
       ROUND((CAST(o.obs AS DOUBLE)
              - CAST(rt.row_tot AS DOUBLE) * CAST(ct.col_tot AS DOUBLE)
                / CAST(n.total AS DOUBLE))
             * (CAST(o.obs AS DOUBLE)
                - CAST(rt.row_tot AS DOUBLE) * CAST(ct.col_tot AS DOUBLE)
                  / CAST(n.total AS DOUBLE))
             / (CAST(rt.row_tot AS DOUBLE) * CAST(ct.col_tot AS DOUBLE)
                / CAST(n.total AS DOUBLE)), 6) AS contrib
FROM o
JOIN rt USING (lang)
JOIN ct USING (source)
CROSS JOIN n
"""


@register("chi_square_lang_source", oracle=CHI_SQUARE_ORACLE,
          tags=("stats", "chi-square", "contingency"))
def chi_square_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contingency-table chi-square cells for lang × source: observed
    counts, expected under independence, and per-cell (o−e)²/e
    contributions in a fixed IEEE operation order (identical in the
    oracle). One scan → cell counts; margins re-attach by broadcast."""
    from pyspark.sql import functions as F

    d = read_table(spark, sf_dir, "documents", ["lang", "source"],
                   hint_broadcast=False)
    o = d.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("obs"))
    rt = o.groupBy("lang").agg(F.sum("obs").alias("row_tot"))
    ct = o.groupBy("source").agg(F.sum("obs").alias("col_tot"))
    n = o.select(F.sum("obs").alias("total"))
    e = (F.col("row_tot").cast("double") * F.col("col_tot").cast("double")
         / F.col("total").cast("double"))
    dev = F.col("obs").cast("double") - e
    return (
        o.join(F.broadcast(rt), "lang")
        .join(F.broadcast(ct), "source")
        .crossJoin(F.broadcast(n))
        .select(
            "lang", "source", "obs",
            F.round(e, 6).alias("expected"),
            F.round(dev * dev / e, 6).alias("contrib"),
        )
    )


USER_360_ORACLE = f"""
WITH dim(age_days, w) AS (VALUES
  {_DECAY_VALUES}
),
e AS (
  SELECT user_id, ts, event_type,
         CAST(value AS DECIMAL(12,4)) AS v,
         LEAST(GREATEST(datediff('day', CAST(ts AS DATE),
                                 DATE '{_DECAY_ANCHOR}'), 0),
               {_DECAY_MAX_AGE}) AS age_days
  FROM events
)
SELECT user_id,
       COUNT(*) AS n_events,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_purchases,
       MIN(ts) AS first_ts,
       MAX(ts) AS last_ts,
       ROUND(CAST(SUM(v) AS DOUBLE), 2) AS total_value,
       ROUND(CAST(SUM(v * d.w) AS DOUBLE), 6) AS decayed_score,
       CAST(CASE WHEN MIN(CASE WHEN event_type = 'view' THEN ts END)
                      < MAX(CASE WHEN event_type = 'purchase' THEN ts END)
                 THEN 1 ELSE 0 END AS INT) AS viewed_then_purchased
FROM e JOIN dim d USING (age_days)
GROUP BY user_id
"""


@register("user_360", oracle=USER_360_ORACLE,
          tags=("behavior", "one-scan", "report"), bench=True)
def user_360(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-scan per-user 360 report: event counts, purchase counts,
    first/last timestamps, exact decimal spend, the half-life decayed
    score, and a view-before-purchase flag — ALL as conditional
    aggregates in a single hash aggregate after the broadcast weight
    join. One fact scan, one shuffle (plan-asserted); the composition
    answer to running five separate per-user queries."""
    from pyspark.sql import functions as F

    e = read_table(spark, sf_dir, "events",
                   ["user_id", "ts", "event_type", "value"],
                   hint_broadcast=False)
    rows = decay_weights(_DECAY_MAX_AGE, _DECAY_HALF_LIFE)
    dim = spark.createDataFrame(rows, "age_days INT, w STRING").select(
        "age_days", F.col("w").cast("decimal(12,9)").alias("w"))
    age = F.least(
        F.greatest(
            F.datediff(F.lit(_DECAY_ANCHOR).cast("date"),
                       F.col("ts").cast("date")).cast("int"),
            F.lit(0)),
        F.lit(_DECAY_MAX_AGE))
    base = (
        e.select(
            "user_id", "ts", "event_type",
            F.col("value").cast("decimal(12,4)").alias("v"),
            age.alias("age_days"))
        .join(F.broadcast(dim), "age_days")
    )
    return base.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long").alias("n_purchases"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
        F.round(F.sum("v").cast("double"), 2).alias("total_value"),
        F.round(F.sum(F.col("v") * F.col("w")).cast("double"), 6)
        .alias("decayed_score"),
        # coalesce: a user missing either step compares NULL — the
        # oracle's CASE yields 0 there, so pin the same semantics
        F.coalesce(
            (F.min(F.when(F.col("event_type") == "view", F.col("ts")))
             < F.max(F.when(F.col("event_type") == "purchase",
                            F.col("ts")))).cast("int"),
            F.lit(0),
        ).alias("viewed_then_purchased"),
    )


ATTRIBUTION_ORACLE = """
WITH p AS (
  SELECT event_id AS purchase_id, user_id, ts AS p_ts,
         CAST(value AS DECIMAL(12,4)) AS amount
  FROM events WHERE event_type = 'purchase'
),
touch AS (
  SELECT p.purchase_id, p.amount, e.event_type
  FROM events e JOIN p
    ON e.user_id = p.user_id
   AND e.ts < p.p_ts
   AND e.ts >= p.p_ts - INTERVAL 24 HOUR
  WHERE e.event_type <> 'purchase'
),
n AS (
  SELECT purchase_id, COUNT(*) AS n_touches FROM touch GROUP BY 1
),
credit AS (
  SELECT t.event_type,
         CAST(ROUND(CAST(t.amount AS DOUBLE)
                    / CAST(n.n_touches AS DOUBLE), 9)
              AS DECIMAL(28,9)) AS c
  FROM touch t JOIN n USING (purchase_id)
)
SELECT event_type, COUNT(*) AS n_credited,
       ROUND(CAST(SUM(c) AS DOUBLE), 4) AS credited_value
FROM credit GROUP BY event_type
"""


@register("attribution_linear", oracle=ATTRIBUTION_ORACLE,
          tags=("behavior", "attribution", "range-join"))
def attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: each purchase splits its value
    equally across the same user's non-purchase touches in the
    preceding 24 h; credit aggregates per event type. The touch join is
    the bucketed interval join (operators/temporal.range_join — never a
    nested loop); per-touch credit is round-9-quantized and
    decimal-summed so the split is exact cross-engine."""
    from pyspark.sql import functions as F

    from gpu_bdb_spark.functions import micros
    from gpu_bdb_spark.operators.temporal import range_join

    e = read_table(spark, sf_dir, "events",
                   ["event_id", "user_id", "ts", "event_type", "value"],
                   hint_broadcast=False)
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        (F.timestamp_micros(micros("ts")
                            - F.lit(86_400_000_000).cast("long")))
        .alias("start_ts"),
        F.col("ts").alias("end_ts"),
        F.col("value").cast("decimal(12,4)").alias("amount"),
    )
    touches = e.filter(F.col("event_type") != "purchase").select(
        "user_id", "ts", "event_type")
    t = range_join(touches, p, point_col="ts", start_col="start_ts",
                   end_col="end_ts", by=("user_id",), strategy="bucket",
                   bucket_width_s=86_400).select(
        "purchase_id", "amount", "event_type")
    n = t.groupBy("purchase_id").agg(F.count(F.lit(1)).alias("n_touches"))
    credit = t.join(n, "purchase_id").select(
        "event_type",
        F.round(F.col("amount").cast("double")
                / F.col("n_touches").cast("double"), 9)
        .cast("decimal(28,9)").alias("c"),
    )
    return credit.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_credited"),
        F.round(F.sum("c").cast("double"), 4).alias("credited_value"),
    )


RFM_ORACLE = """
WITH pc AS (
  SELECT o_custkey AS cust,
         epoch_us(MAX(o_orderdate)) AS last_order_us,
         CAST(COUNT(*) AS BIGINT) AS frequency,
         SUM(CAST(o_totalprice AS DECIMAL(12,4))) AS mon
  FROM orders GROUP BY 1
),
sc AS (
  SELECT cust, last_order_us, frequency,
         ROUND(CAST(mon AS DOUBLE), 2) AS monetary,
         ntile(4) OVER (ORDER BY last_order_us DESC, cust) AS r_score,
         ntile(4) OVER (ORDER BY frequency DESC, cust) AS f_score,
         ntile(4) OVER (ORDER BY mon DESC, cust) AS m_score
  FROM pc
)
SELECT cust, last_order_us, frequency, monetary,
       CAST(r_score AS INT) AS r_score, CAST(f_score AS INT) AS f_score,
       CAST(m_score AS INT) AS m_score,
       CAST(r_score * 100 + f_score * 10 + m_score AS INT) AS segment
FROM sc
"""


@register("rfm_segments", oracle=RFM_ORACLE,
          tags=("behavior", "segmentation", "rfm"))
def rfm_segments_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM quartile segmentation of customers from the orders fact:
    one hash aggregate to a per-customer frame, then three
    total-order-deterministic ntile windows over that (small) frame."""
    from gpu_bdb_spark.operators.behavior import rfm_segments

    o = read_table(spark, sf_dir, "orders",
                   ["o_custkey", "o_orderdate", "o_totalprice"],
                   hint_broadcast=False)
    return rfm_segments(o)


SEQUENCES_ORACLE = """
WITH pos AS (
  SELECT user_id AS u, event_type AS t,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS p
  FROM events
),
s1 AS (SELECT u, t AS t1, MIN(p) AS p1 FROM pos GROUP BY 1, 2),
s2 AS (
  SELECT pos.u, s1.t1, pos.t AS t2, MIN(pos.p) AS p2
  FROM pos JOIN s1 ON pos.u = s1.u AND pos.p > s1.p1
  GROUP BY 1, 2, 3
),
s3 AS (
  SELECT DISTINCT pos.u, s2.t1, s2.t2, pos.t AS t3
  FROM pos JOIN s2 ON pos.u = s2.u AND pos.p > s2.p2
)
SELECT t1, t2, t3, CAST(COUNT(*) AS BIGINT) AS n_users
FROM s3 GROUP BY 1, 2, 3
"""


@register("frequent_sequences", oracle=SEQUENCES_ORACLE,
          tags=("behavior", "sequential-patterns"), bench=True)
def frequent_sequences_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GSP-style frequent length-3 event subsequences (gaps allowed):
    greedy-scan existence via two min-aggregates and a distinct —
    per-user fanout bounded by |types|², never a positional cross
    product."""
    from gpu_bdb_spark.operators.behavior import frequent_sequences

    e = read_table(spark, sf_dir, "events",
                   ["event_id", "ts", "user_id", "event_type"],
                   hint_broadcast=False)
    return frequent_sequences(e)


def _lag_pick(num: int, den: int, tag: str) -> str:
    """Conditional-aggregate picks of the two order statistics around
    quantile num/den (0-based pos = (n−1)·num/den, k = pos DIV 1)."""
    k = f"(((n_converted - 1) * {num}) // {den})"
    return (f"MIN(CASE WHEN r = {k} + 1 THEN lag_us END) AS a{tag},\n"
            f"    MIN(CASE WHEN r = {k} + 2 THEN lag_us END) AS b{tag}")


def _lag_interp(num: int, den: int, tag: str) -> str:
    """The SAME fixed-order IEEE chain as the Spark rollup:
    (a + ((b−a)·rem)/den) / 1e6 — ulp-identical cross-engine, so no
    terminal round (see operators/behavior.conversion_lag_rollup)."""
    rem = f"(((n_converted - 1) * {num}) % {den})"
    b = f"COALESCE(b{tag}, a{tag})"
    return (f"(CAST(a{tag} AS DOUBLE) + "
            f"CAST(({b} - a{tag}) * {rem} AS DOUBLE) / {den}.0) "
            f"/ 1000000.0 AS p{tag}_lag_s")


CONVERSION_LAG_ORACLE = f"""
WITH f AS (
  SELECT user_id AS u, MIN(epoch_us(ts)) AS f_us
  FROM events WHERE event_type = 'view' GROUP BY 1
),
c AS (
  SELECT e.user_id AS u,
         MIN(epoch_us(e.ts)) - f.f_us AS lag_us
  FROM events e JOIN f ON e.user_id = f.u
  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > f.f_us
  GROUP BY 1, f.f_us
),
j AS (SELECT f.u, c.lag_us FROM f LEFT JOIN c ON f.u = c.u),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_users_from,
         CAST(COUNT(lag_us) AS BIGINT) AS n_converted
  FROM j
),
rk AS (
  SELECT lag_us, CAST(row_number() OVER (ORDER BY lag_us) AS BIGINT) AS r
  FROM j WHERE lag_us IS NOT NULL
),
picks AS (
  SELECT
    {_lag_pick(1, 4, '25')},
    {_lag_pick(1, 2, '50')},
    {_lag_pick(9, 10, '90')}
  FROM rk, tot
)
SELECT n_users_from, n_converted,
       CAST(n_converted AS DOUBLE) / CAST(n_users_from AS DOUBLE)
         AS conversion_rate,
       {_lag_interp(1, 4, '25')},
       {_lag_interp(1, 2, '50')},
       {_lag_interp(9, 10, '90')}
FROM tot, picks
"""


@register("conversion_lag", oracle=CONVERSION_LAG_ORACLE,
          tags=("behavior", "funnel", "timing"))
def conversion_lag_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-view → first-subsequent-purchase timing report: two
    user-key min-aggregates + one single-row rollup; lags stay integer
    micros until the final seconds division."""
    from gpu_bdb_spark.operators.behavior import conversion_lag

    e = read_table(spark, sf_dir, "events",
                   ["user_id", "ts", "event_type"], hint_broadcast=False)
    return conversion_lag(e)


NEW_RETURNING_ORACLE = f"""
WITH up AS (
  SELECT DISTINCT user_id, epoch_us(ts) // {DAY_US} AS period
  FROM events WHERE user_id IS NOT NULL
),
f AS (
  SELECT user_id, period,
         period = MIN(period) OVER (PARTITION BY user_id) AS is_new
  FROM up
)
SELECT CAST(period AS BIGINT) AS period,
       CAST(COUNT(*) AS BIGINT) AS n_active,
       CAST(COUNT(*) FILTER (is_new) AS BIGINT) AS n_new,
       CAST(COUNT(*) FILTER (NOT is_new) AS BIGINT) AS n_returning,
       ROUND(CAST(COUNT(*) FILTER (NOT is_new) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS returning_share
FROM f GROUP BY period
"""


@register("new_vs_returning", oracle=NEW_RETURNING_ORACLE,
          tags=("behavior", "dau", "growth"))
def new_vs_returning_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily new-vs-returning active-user split: dedup to (user, day)
    pairs first (the only fact-cardinality shuffle carries two longs),
    per-user min window over the deduped pairs, one day rollup."""
    from gpu_bdb_spark.operators.behavior import new_vs_returning

    e = read_table(spark, sf_dir, "events", ["user_id", "ts"],
                   hint_broadcast=False)
    return new_vs_returning(e)


def _gap_pick(num: int, den: int, name: str) -> str:
    k = f"(((n_gaps - 1) * {num}) // {den})"
    return (f"MIN(CASE WHEN r = {k} + 1 THEN gap_us END) AS a_{name},\n"
            f"    MIN(CASE WHEN r = {k} + 2 THEN gap_us END) AS b_{name}")


def _gap_interp(num: int, den: int, name: str) -> str:
    rem = f"(((n_gaps - 1) * {num}) % {den})"
    b = f"COALESCE(b_{name}, a_{name})"
    return (f"(CAST(a_{name} AS DOUBLE) + "
            f"CAST(({b} - a_{name}) * {rem} AS DOUBLE) / {den}.0) "
            f"/ 86400000000.0 AS {name}")


# owned interpolation over INTEGER micros (operators/stats.
# interpolated_percentiles): quantile_cont/percentile interpolate in
# different IEEE op orders, and gap_days only escaped ties because the
# fixture's order dates are midnight-aligned — the conversion_lag
# hardening applied before the tie can bite
INTERPURCHASE_ORACLE = f"""
WITH gaps AS (
  SELECT (epoch_us(o_orderdate)
          - lag(epoch_us(o_orderdate))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey))
         AS gap_us
  FROM orders
),
g AS (SELECT gap_us FROM gaps WHERE gap_us IS NOT NULL),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_gaps FROM g),
rk AS (
  SELECT gap_us, CAST(row_number() OVER (ORDER BY gap_us) AS BIGINT) AS r
  FROM g
),
picks AS (
  SELECT
    {_gap_pick(1, 4, 'p25_days')},
    {_gap_pick(1, 2, 'p50_days')},
    {_gap_pick(9, 10, 'p90_days')}
  FROM rk, tot
)
SELECT n_gaps,
       {_gap_interp(1, 4, 'p25_days')},
       {_gap_interp(1, 2, 'p50_days')},
       {_gap_interp(9, 10, 'p90_days')}
FROM tot, picks
"""


@register("interpurchase_time", oracle=INTERPURCHASE_ORACLE,
          tags=("behavior", "cadence", "retention"))
def interpurchase_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-purchase cadence: exact percentiles of the gap between a
    customer's consecutive orders — the reorder-cycle number behind
    replenishment and churn models. One customer-key shuffle for the
    lag window (ties broken by order key); gaps stay INTEGER micros
    through rank-picked order statistics and one fixed-order IEEE
    finishing chain (operators/stats.interpolated_percentiles — the
    conversion_lag engine-owned-interpolation discipline)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    from gpu_bdb_spark.functions import micros
    from gpu_bdb_spark.operators.stats import interpolated_percentiles

    o = read_table(spark, sf_dir, "orders",
                   ["o_custkey", "o_orderdate", "o_orderkey"],
                   hint_broadcast=False)
    w = W.partitionBy("o_custkey").orderBy(micros("o_orderdate"),
                                           "o_orderkey")
    gap = (micros("o_orderdate")
           - F.lag(micros("o_orderdate")).over(w)).alias("gap_us")
    g = o.select(gap).filter(F.col("gap_us").isNotNull())
    return interpolated_percentiles(
        g, "gap_us",
        [(1, 4, "p25_days"), (1, 2, "p50_days"), (9, 10, "p90_days")],
        divisor=86_400_000_000.0, n_name="n_gaps")


PARETO_ORACLE = """
WITH pc AS (
  SELECT o_custkey AS cust,
         SUM(CAST(o_totalprice AS DECIMAL(12,4))) AS spend
  FROM orders GROUP BY 1
),
r AS (
  SELECT spend,
         row_number() OVER (ORDER BY spend DESC, cust) AS rn,
         COUNT(*) OVER () AS n
  FROM pc
)
SELECT CAST(MAX(n) AS BIGINT) AS n_customers,
       CAST(COUNT(*) FILTER (rn * 10 <= n) AS BIGINT) AS n_top_decile,
       ROUND(CAST(SUM(spend) FILTER (rn * 10 <= n) AS DOUBLE), 2)
         AS top_decile_spend,
       ROUND(CAST(SUM(spend) AS DOUBLE), 2) AS total_spend,
       ROUND(CAST(SUM(spend) FILTER (rn * 10 <= n) AS DOUBLE)
             / CAST(SUM(spend) AS DOUBLE), 6) AS top_decile_share
FROM r
"""


@register("pareto_share", oracle=PARETO_ORACLE,
          tags=("behavior", "concentration", "pareto"))
def pareto_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration: the top spend decile's share of total
    spend (the 80/20 health metric). Membership is the all-integer cut
    rn·10 ≤ n over a (spend desc, cust) total order; decimal spend
    sums; the single-partition rank runs over the per-customer
    aggregate only."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    from gpu_bdb_spark.functions import dec

    o = read_table(spark, sf_dir, "orders", ["o_custkey", "o_totalprice"],
                   hint_broadcast=False)
    pc = o.groupBy(F.col("o_custkey").alias("cust")).agg(
        F.sum(dec("o_totalprice")).alias("spend"))
    w = W.orderBy(F.desc("spend"), F.col("cust"))
    r = pc.select(
        "spend",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy()).alias("n"),
    )
    top = F.col("rn") * 10 <= F.col("n")
    return r.agg(
        F.max("n").cast("long").alias("n_customers"),
        F.sum(top.cast("long")).alias("n_top_decile"),
        F.round(F.sum(F.when(top, F.col("spend"))).cast("double"), 2)
        .alias("top_decile_spend"),
        F.round(F.sum("spend").cast("double"), 2).alias("total_spend"),
        F.round(F.sum(F.when(top, F.col("spend"))).cast("double")
                / F.sum("spend").cast("double"), 6)
        .alias("top_decile_share"),
    )


KS_TEST_ORACLE = """
WITH seg AS (
  SELECT c_custkey, c_mktsegment AS g FROM customer
  WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
),
v AS (
  SELECT CAST(o_totalprice AS DOUBLE) AS v, g
  FROM orders JOIN seg ON o_custkey = c_custkey
),
pv AS (
  SELECT v,
         CAST(SUM(CASE WHEN g = 'BUILDING' THEN 1 ELSE 0 END) AS BIGINT)
           AS a,
         CAST(SUM(CASE WHEN g = 'AUTOMOBILE' THEN 1 ELSE 0 END) AS BIGINT)
           AS b
  FROM v GROUP BY v
),
t AS (SELECT CAST(SUM(a) AS BIGINT) AS na, CAST(SUM(b) AS BIGINT) AS nb
      FROM pv),
c AS (
  SELECT SUM(a) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS ca,
         SUM(b) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cb
  FROM pv
),
d AS (
  SELECT MAX(round(abs(CAST(ca AS DOUBLE) / CAST(na AS DOUBLE)
                       - CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE)), 9)) AS dm,
         MAX(na) AS na, MAX(nb) AS nb
  FROM c, t
)
SELECT na AS n_a, nb AS n_b,
       round(dm, 6) AS d_stat,
       round(1.358 * sqrt(CAST(na + nb AS DOUBLE)
                          / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))), 6)
         AS d_crit,
       CAST(round(dm, 6)
            > round(1.358 * sqrt(CAST(na + nb AS DOUBLE)
                                 / (CAST(na AS DOUBLE)
                                    * CAST(nb AS DOUBLE))), 6) AS INT)
         AS reject
FROM d
"""


@register("ks_test", oracle=KS_TEST_ORACLE,
          tags=("behavior", "stats", "distribution-shift"))
def ks_test_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov distribution-shift test: does the
    BUILDING segment's order-value distribution differ from
    AUTOMOBILE's? One hash aggregate to per-distinct-value group
    counts, one running-sum window over that collapsed frame (the
    exact-ECDF total order, same deliberate trade as quantile_bins),
    broadcast totals, single-row verdict. Integer counts + round-9 ECDF
    gaps make D engine-exact."""
    from gpu_bdb_spark.operators.behavior import ks_two_sample

    c = read_table(spark, sf_dir, "customer",
                   ["c_custkey", "c_mktsegment"], hint_broadcast=False)
    o = read_table(spark, sf_dir, "orders", ["o_custkey", "o_totalprice"],
                   hint_broadcast=False)
    vals = o.join(
        F.broadcast(c.filter(
            F.col("c_mktsegment").isin(["BUILDING", "AUTOMOBILE"]))),
        o.o_custkey == c.c_custkey,
    ).select(F.col("o_totalprice").alias("v"),
             F.col("c_mktsegment").alias("g"))
    return ks_two_sample(vals, "v", "g", "BUILDING", "AUTOMOBILE")


PSI_DRIFT_ORACLE = """
WITH b AS (
  SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bin,
         CAST(SUM(CASE WHEN year(o_orderdate) < 1998 THEN 1 ELSE 0 END)
              AS BIGINT) AS c_ref,
         CAST(SUM(CASE WHEN year(o_orderdate) >= 1998 THEN 1 ELSE 0 END)
              AS BIGINT) AS c_cur
  FROM orders GROUP BY 1
),
t AS (
  SELECT CAST(SUM(c_ref) AS BIGINT) AS n_ref,
         CAST(SUM(c_cur) AS BIGINT) AS n_cur,
         CAST(COUNT(*) AS BIGINT) AS n_bins
  FROM b
),
terms AS (
  SELECT CAST(round(
           (CAST(c_ref + 1 AS DOUBLE) / CAST(n_ref + n_bins AS DOUBLE)
            - CAST(c_cur + 1 AS DOUBLE) / CAST(n_cur + n_bins AS DOUBLE))
           * ln((CAST(c_ref + 1 AS DOUBLE) / CAST(n_ref + n_bins AS DOUBLE))
                / (CAST(c_cur + 1 AS DOUBLE)
                   / CAST(n_cur + n_bins AS DOUBLE))), 6)
         AS DECIMAL(20,6)) AS term,
         n_ref, n_cur, n_bins
  FROM b, t
)
SELECT MAX(n_ref) AS n_ref, MAX(n_cur) AS n_cur, MAX(n_bins) AS n_bins,
       round(CAST(SUM(term) AS DOUBLE), 6) AS psi
FROM terms
"""


@register("psi_drift", oracle=PSI_DRIFT_ORACLE,
          tags=("behavior", "stats", "drift", "monitoring"))
def psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between the pre-1998 and 1998+ order
    value distributions — the standard production drift monitor
    (PSI < 0.1 stable, > 0.25 shifted) next to `ks_test`'s exact
    sup-statistic. One hash aggregate builds both periods' histograms
    together (fixed-width bins, add-1 smoothing over the observed bin
    set); totals ride a broadcast one-row crossJoin; each bin's
    (p−q)·ln(p/q) term is an IEEE expression of exact integers rounded
    1e-6 once, and PSI is their DECIMAL sum (order-free, engine-exact —
    the char_entropy ln discipline). Histogram and finishing stage are
    shared with the standing-table streaming twin
    (`streaming.ops.counter_ingest_batches` + `psi_serve`)."""
    from gpu_bdb_spark.operators.behavior import psi_histogram, psi_rollup

    o = read_table(spark, sf_dir, "orders",
                   ["o_orderdate", "o_totalprice"], hint_broadcast=False)
    return psi_rollup(psi_histogram(o))


GINI_ORACLE = """
WITH pc AS (
  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(12,4))) AS spend
  FROM orders GROUP BY o_custkey
),
r AS (
  SELECT spend,
         CAST(row_number() OVER (ORDER BY spend, o_custkey) AS BIGINT) AS i,
         CAST(COUNT(*) OVER () AS BIGINT) AS n
  FROM pc
),
s AS (
  SELECT CAST(SUM((2 * i - n - 1) * spend) AS DOUBLE) AS num,
         CAST(MAX(n) AS BIGINT) AS n,
         CAST(SUM(spend) AS DOUBLE) AS tot
  FROM r
)
SELECT n AS n_customers,
       ROUND(num / (CAST(n AS DOUBLE) * tot), 6) AS gini
FROM s
"""


@register("gini_spend", oracle=GINI_ORACLE,
          tags=("behavior", "inequality", "stats"))
def gini_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Gini coefficient of customer spend concentration — the
    inequality scalar next to `pareto_share`'s top-decile share, via
    the sorted-rank identity G = Σ(2i−n−1)·x₍ᵢ₎ / (n·Σx). One
    customer aggregate, one total-order row_number over the collapsed
    per-customer frame (full (spend, custkey) tie-break), one decimal
    rollup: the weighted sum stays DECIMAL (integer rank × exact
    decimal spend) until the single final division."""
    from pyspark.sql import Window

    o = read_table(spark, sf_dir, "orders",
                   ["o_custkey", "o_totalprice"], hint_broadcast=False)
    pc = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(12,4)")).alias("spend"))
    w = Window.orderBy("spend", "o_custkey")
    r = pc.select(
        "spend",
        F.row_number().over(w).cast("long").alias("i"),
        F.count(F.lit(1)).over(
            Window.partitionBy()).cast("long").alias("n"))
    s = r.agg(
        F.sum((2 * F.col("i") - F.col("n") - 1) * F.col("spend"))
        .cast("double").alias("num"),
        F.max("n").alias("n"),
        F.sum("spend").cast("double").alias("tot"))
    return s.select(
        F.col("n").alias("n_customers"),
        F.round(F.col("num") / (F.col("n").cast("double") * F.col("tot")),
                6).alias("gini"))


PINBALL_ORACLE = """
WITH m AS (
  SELECT c.c_mktsegment AS seg,
         CAST(quantile_cont(CAST(o.o_totalprice AS DOUBLE), 0.5)
              AS DOUBLE) AS q50,
         CAST(quantile_cont(CAST(o.o_totalprice AS DOUBLE), 0.9)
              AS DOUBLE) AS q90
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1
),
j AS (
  SELECT c.c_mktsegment AS seg, CAST(o.o_totalprice AS DOUBLE) AS y,
         m.q50, m.q90
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN m ON m.seg = c.c_mktsegment
),
t AS (
  SELECT seg,
         CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(round(CASE WHEN y >= q50 THEN 0.5 * (y - q50)
                             ELSE 0.5 * (q50 - y) END, 6)
                  AS DECIMAL(28,6))) AS l50,
         SUM(CAST(round(CASE WHEN y >= q90 THEN 0.9 * (y - q90)
                             ELSE 0.1 * (q90 - y) END, 6)
                  AS DECIMAL(28,6))) AS l90
  FROM j GROUP BY seg
)
SELECT seg, n,
       ROUND(CAST(l50 AS DOUBLE) / CAST(n AS DOUBLE), 6) AS pinball_p50,
       ROUND(CAST(l90 AS DOUBLE) / CAST(n AS DOUBLE), 6) AS pinball_p90
FROM t
"""


@register("pinball_loss", oracle=PINBALL_ORACLE,
          tags=("ml", "forecast-eval", "quantile-loss"))
def pinball_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pinball (quantile) loss of per-segment constant quantile
    forecasts — the forecast-evaluation metric quantile models are
    graded on. Two passes: exact interpolated q50/q90 per segment
    (dimension-sized result, broadcast back), then one aggregate of
    round-6 per-row losses summed in DECIMAL. Loss terms are IEEE
    expressions of (identical) interpolated quantiles and raw values,
    quantized once before the order-free sum."""
    c = read_table(spark, sf_dir, "customer",
                   ["c_custkey", "c_mktsegment"], hint_broadcast=False)
    o = read_table(spark, sf_dir, "orders",
                   ["o_custkey", "o_totalprice"], hint_broadcast=False)
    j0 = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("seg"),
        F.col("o_totalprice").cast("double").alias("y"))
    m = j0.groupBy("seg").agg(
        F.percentile("y", F.lit(0.5)).alias("q50"),
        F.percentile("y", F.lit(0.9)).alias("q90"))
    j = j0.join(F.broadcast(m), "seg")
    l50 = F.when(F.col("y") >= F.col("q50"),
                 0.5 * (F.col("y") - F.col("q50"))) \
        .otherwise(0.5 * (F.col("q50") - F.col("y")))
    l90 = F.when(F.col("y") >= F.col("q90"),
                 0.9 * (F.col("y") - F.col("q90"))) \
        .otherwise(0.1 * (F.col("q90") - F.col("y")))
    t = j.groupBy("seg").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.round(l50, 6).cast("decimal(28,6)")).alias("l50"),
        F.sum(F.round(l90, 6).cast("decimal(28,6)")).alias("l90"))
    return t.select(
        "seg", "n",
        F.round(F.col("l50").cast("double") / F.col("n").cast("double"),
                6).alias("pinball_p50"),
        F.round(F.col("l90").cast("double") / F.col("n").cast("double"),
                6).alias("pinball_p90"))


COHORT_LTV_ORACLE = """
WITH o AS (
  SELECT o_custkey AS cust,
         CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT)
           AS period,
         CAST(o_totalprice AS DECIMAL(12,4)) AS rev
  FROM orders
),
coh AS (
  SELECT cust, MIN(period) AS cohort FROM o GROUP BY cust
),
sizes AS (
  SELECT cohort, CAST(COUNT(*) AS BIGINT) AS cohort_size
  FROM coh GROUP BY cohort
),
per AS (
  SELECT c.cohort, o.period - c.cohort AS offset_m,
         SUM(o.rev) AS rev
  FROM o JOIN coh c ON o.cust = c.cust
  GROUP BY 1, 2
),
cum AS (
  SELECT cohort, offset_m, rev,
         SUM(rev) OVER (PARTITION BY cohort ORDER BY offset_m
                        ROWS UNBOUNDED PRECEDING) AS cum_rev
  FROM per
)
SELECT m.cohort, m.offset_m,
       ROUND(CAST(m.rev AS DOUBLE), 2) AS period_rev,
       ROUND(CAST(m.cum_rev AS DOUBLE), 2) AS cum_rev,
       s.cohort_size,
       -- DuckDB ROUND(double, 6) rounds the BINARY double (an exact
       -- decimal tie like x.3321875 sits a hair below .5 in binary and
       -- rounds DOWN); Spark round() rounds the SHORTEST DECIMAL repr
       -- HALF_UP. Round via the varchar→decimal path to get Spark's
       -- semantics exactly (measured 1-ulp mismatch on generated data).
       CAST(ROUND(CAST(CAST(
           CAST(m.cum_rev AS DOUBLE) / CAST(s.cohort_size AS DOUBLE)
         AS VARCHAR) AS DECIMAL(38,18)), 6) AS DOUBLE) AS ltv_per_user
FROM cum m JOIN sizes s ON m.cohort = s.cohort
"""


@register("cohort_ltv", oracle=COHORT_LTV_ORACLE,
          tags=("behavior", "cohort", "ltv"))
def cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves — cumulative revenue per acquisition
    cohort at each month offset, per-user — the revenue companion to
    `cohort_retention`'s activity triangle. One per-customer min
    aggregate derives cohorts, one (cohort, offset) decimal aggregate,
    one running-sum window over the collapsed cohort×offset frame;
    divisions are single IEEE ops of exact decimals cast at the edge
    (magnitudes stay below the 2^53 cast bound at scale 4)."""
    from pyspark.sql import Window

    o = read_table(spark, sf_dir, "orders",
                   ["o_custkey", "o_orderdate", "o_totalprice"],
                   hint_broadcast=False)
    base = o.select(
        F.col("o_custkey").alias("cust"),
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1)
        .cast("long").alias("period"),
        F.col("o_totalprice").cast("decimal(12,4)").alias("rev"))
    coh = base.groupBy("cust").agg(F.min("period").alias("cohort"))
    sizes = coh.groupBy("cohort").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_size"))
    per = (
        base.join(coh, "cust")
        .groupBy("cohort", (F.col("period") - F.col("cohort"))
                 .alias("offset_m"))
        .agg(F.sum("rev").alias("rev"))
    )
    w = Window.partitionBy("cohort").orderBy("offset_m").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    cum = per.withColumn("cum_rev", F.sum("rev").over(w))
    return (
        cum.join(F.broadcast(sizes), "cohort")
        .select(
            "cohort", "offset_m",
            F.round(F.col("rev").cast("double"), 2).alias("period_rev"),
            F.round(F.col("cum_rev").cast("double"), 2).alias("cum_rev"),
            "cohort_size",
            F.round(F.col("cum_rev").cast("double")
                    / F.col("cohort_size").cast("double"), 6)
            .alias("ltv_per_user"))
    )


SURVIVAL_KM_ORACLE = """
WITH RECURSIVE f AS (
  SELECT user_id AS u, MIN(epoch_us(ts)) AS f_us
  FROM events WHERE event_type = 'view' AND user_id IS NOT NULL
  GROUP BY 1
),
conv AS (
  SELECT e.user_id AS u, MIN(epoch_us(e.ts)) AS c_us
  FROM events e JOIN f ON e.user_id = f.u
  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > f.f_us
  GROUP BY 1
),
last AS (
  SELECT user_id AS u, MAX(epoch_us(ts)) AS l_us
  FROM events WHERE user_id IS NOT NULL GROUP BY 1
),
subj AS (
  SELECT f.u,
         CASE WHEN c.c_us IS NOT NULL
              THEN (c.c_us - f.f_us) // 86400000000
              ELSE (l.l_us - f.f_us) // 86400000000 END AS t_days,
         CASE WHEN c.c_us IS NOT NULL THEN 1 ELSE 0 END AS ev
  FROM f JOIN last l ON f.u = l.u LEFT JOIN conv c ON f.u = c.u
),
tbl AS (
  SELECT t_days, CAST(SUM(ev) AS BIGINT) AS d,
         CAST(SUM(1 - ev) AS BIGINT) AS c,
         CAST(COUNT(*) AS BIGINT) AS m
  FROM subj GROUP BY t_days
),
rk AS MATERIALIZED (
  SELECT t_days, d, c, m,
         CAST(row_number() OVER (ORDER BY t_days) AS BIGINT) AS i,
         CAST(SUM(m) OVER () AS BIGINT)
           - COALESCE(CAST(SUM(m) OVER (ORDER BY t_days
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING) AS BIGINT), 0) AS n_risk
  FROM tbl
),
km(i, t_days, d, c, n_risk, s) AS (
  SELECT i, t_days, d, c, n_risk,
         round(1.0 * round(CAST(n_risk - d AS DOUBLE)
                           / CAST(n_risk AS DOUBLE), 9), 9)
  FROM rk WHERE i = 1
  UNION ALL
  SELECT r.i, r.t_days, r.d, r.c, r.n_risk,
         round(km.s * round(CAST(r.n_risk - r.d AS DOUBLE)
                            / CAST(r.n_risk AS DOUBLE), 9), 9)
  FROM km JOIN rk r ON r.i = km.i + 1
)
SELECT t_days, n_risk, d AS n_events, c AS n_censored,
       s AS survival
FROM km
"""


@register("survival_km", oracle=SURVIVAL_KM_ORACLE,
          tags=("behavior", "survival", "kaplan-meier"))
def survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier survival curve of time-to-purchase after first
    view, WITH right censoring (users who never convert are censored
    at their last observed event) — the survival-analysis staple
    behind churn and conversion-hazard models. The data-sized work is
    three user-key aggregates collapsing to a per-duration life table
    (at-risk counts from one exclusive running sum); the sequential
    product Ŝ(t) = Π(1 − dᵢ/nᵢ) then runs over the duration-count-
    sized frame in applyInPandas, each factor and partial product
    round-9 (values ≤ 1, so the double↔decimal edge is exact — the
    ewma 2^53 lesson respected); the DuckDB recursive CTE replays the
    identical chain."""
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    e = read_table(spark, sf_dir, "events",
                   ["user_id", "ts", "event_type"],
                   hint_broadcast=False).filter(F.col("user_id").isNotNull())
    f = (e.filter(F.col("event_type") == "view")
         .groupBy(F.col("user_id").alias("u"))
         .agg(F.min(us).alias("f_us")))
    conv = (e.filter(F.col("event_type") == "purchase")
            .select(F.col("user_id").alias("u"), us.alias("t_us"))
            .join(f, "u").filter(F.col("t_us") > F.col("f_us"))
            .groupBy("u").agg(F.min("t_us").alias("c_us")))
    last = e.groupBy(F.col("user_id").alias("u")).agg(F.max(us).alias("l_us"))
    subj = (f.join(last, "u").join(conv, "u", "left")
            .select(
                F.when(F.col("c_us").isNotNull(),
                       F.floor((F.col("c_us") - F.col("f_us"))
                               / F.lit(86_400_000_000)))
                .otherwise(F.floor((F.col("l_us") - F.col("f_us"))
                                   / F.lit(86_400_000_000)))
                .cast("long").alias("t_days"),
                F.when(F.col("c_us").isNotNull(), 1).otherwise(0)
                .alias("ev")))
    tbl = subj.groupBy("t_days").agg(
        F.sum("ev").cast("long").alias("d"),
        F.sum(1 - F.col("ev")).cast("long").alias("c"),
        F.count(F.lit(1)).cast("long").alias("m"))
    from pyspark.sql import Window

    wc = Window.orderBy("t_days").rowsBetween(Window.unboundedPreceding, -1)
    rk = tbl.select(
        "t_days", "d", "c",
        (F.sum("m").over(Window.partitionBy())
         - F.coalesce(F.sum("m").over(wc), F.lit(0)))
        .cast("long").alias("n_risk"))

    def chain(pdf):
        import decimal as _dec

        q9 = _dec.Decimal("1e-9")

        def r9(x):
            return float(_dec.Decimal(repr(float(x))).quantize(
                q9, rounding=_dec.ROUND_HALF_UP))

        pdf = pdf.sort_values("t_days").reset_index(drop=True)
        out, s = [], 1.0
        for n, d in zip(pdf["n_risk"], pdf["d"]):
            factor = r9((int(n) - int(d)) / int(n))
            s = r9(s * factor)
            out.append(s)
        pdf["survival"] = out
        return pdf[["t_days", "n_risk", "d", "c", "survival"]]

    km = rk.groupBy().applyInPandas(
        chain, "t_days long, n_risk long, d long, c long, survival double")
    return km.select("t_days", "n_risk", F.col("d").alias("n_events"),
                     F.col("c").alias("n_censored"), "survival")


def _sprt_consts():
    """Driver-side SPRT constants, quantized decimal scale 12 and
    inlined into BOTH engines (the decayed_engagement no-libm-on-the-
    compare-path discipline): H0 p=0.25 vs H1 p=0.30, alpha=beta=0.05."""
    import decimal as _dec
    import math as _math

    q12 = _dec.Decimal("1e-12")

    def q(x):
        return _dec.Decimal(repr(x)).quantize(
            q12, rounding=_dec.ROUND_HALF_UP)

    return {
        "c1": q(_math.log(0.30 / 0.25)),      # per-conversion increment
        "c0": q(_math.log(0.70 / 0.75)),      # per-non-conversion
        "a": q(_math.log(0.95 / 0.05)),       # accept-H1 boundary
        "b": q(_math.log(0.05 / 0.95)),       # accept-H0 boundary
    }


_SPRT = _sprt_consts()

SPRT_ORACLE = f"""
WITH ud AS (
  SELECT epoch_us(ts) // {DAY_US} AS day, user_id,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
  FROM events WHERE user_id IS NOT NULL GROUP BY 1, 2
),
d AS (
  SELECT CAST(day AS BIGINT) AS day,
         CAST(COUNT(*) AS BIGINT) AS n_users,
         CAST(SUM(conv) AS BIGINT) AS n_converted
  FROM ud GROUP BY 1
),
l AS (
  SELECT day, n_users, n_converted,
         SUM(CAST(n_converted * CAST({_SPRT["c1"]} AS DECIMAL(20,12))
                  + (n_users - n_converted)
                    * CAST({_SPRT["c0"]} AS DECIMAL(20,12))
                  AS DECIMAL(26,12)))
           OVER (ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS llr
  FROM d
)
SELECT day, n_users, n_converted,
       CAST(CAST(llr AS VARCHAR) AS DOUBLE) AS llr,
       CASE WHEN llr >= CAST({_SPRT["a"]} AS DECIMAL(20,12))
              THEN 'accept_h1'
            WHEN llr <= CAST({_SPRT["b"]} AS DECIMAL(20,12))
              THEN 'accept_h0'
            ELSE 'continue' END AS decision
FROM l
"""


@register("sprt_conversion", oracle=SPRT_ORACLE,
          tags=("behavior", "sequential", "sprt", "ab-test"))
def sprt_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald's sequential probability ratio test on the daily conversion
    stream (H0 p=0.25 vs H1 p=0.30, alpha=beta=0.05): the sequential-
    DECISION companion to `cusum_changepoint`'s drift chart and
    `ab_test_conversion`'s fixed-horizon z-test. Per day, trials =
    distinct active users, conversions = users who purchased; the
    log-likelihood ratio is a pure CUMULATIVE SUM of per-day increments
    k·ln(p1/p0) + (n−k)·ln(q1/q0) — no recursion at all, so the chain
    is one unbounded-preceding window over the day-cardinality frame.
    The log constants and Wald boundaries are driver-side decimals
    inlined into BOTH engines (no libm on the compare path), the
    accumulation is exact DECIMAL, the boundary comparisons are
    decimal-vs-decimal, and the published llr is the EXACT scale-12
    decimal cast to double with NO rounding (a round(…, 6) here hit a
    genuine half-way tie at sf0.01 and the engines disagreed; raw cast
    sidesteps the tie class entirely). The oracle routes that cast
    through VARCHAR: at sf1 the llr's scale-12 int form crosses 2^53
    (llr ≈ 9007+) and DuckDB's int128→double→÷10¹² double-rounds — the
    round-9 taxonomy's lesson 3, measured again here. The decision column is bit-deterministic.
    Scale shape: the fact table collapses to (day, user) distinct
    pairs, then to the day frame, before any sequential logic."""
    e = read_table(spark, sf_dir, "events", ["user_id", "event_type", "ts"],
                   hint_broadcast=False)
    from gpu_bdb_spark.functions import micros

    from pyspark.sql import Window

    ud = (
        e.filter(F.col("user_id").isNotNull())
        .groupBy(
            F.floor(micros("ts") / F.lit(DAY_US)).cast("long").alias("day"),
            "user_id")
        .agg(F.max((F.col("event_type") == "purchase").cast("int"))
             .alias("conv"))
    )
    d = ud.groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("conv").cast("long").alias("n_converted"),
    )
    # counts must be NARROW decimals before the multiply: long ×
    # decimal(20,12) overflows precision 38 and Spark silently REDUCES
    # THE SCALE of the product to 9 (allowPrecisionLoss) — measured as
    # a ~1e-7 llr drift vs the oracle. decimal(10,0) × decimal(14,12)
    # = decimal(25,12): exact.
    c1 = F.lit(str(_SPRT["c1"])).cast("decimal(14,12)")
    c0 = F.lit(str(_SPRT["c0"])).cast("decimal(14,12)")
    a = F.lit(str(_SPRT["a"])).cast("decimal(14,12)")
    b = F.lit(str(_SPRT["b"])).cast("decimal(14,12)")
    k = F.col("n_converted").cast("decimal(10,0)")
    nk = (F.col("n_users") - F.col("n_converted")).cast("decimal(10,0)")
    inc = (k * c1 + nk * c0).cast("decimal(26,12)")
    w = (Window.orderBy("day")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    llr = F.sum(inc).over(w)
    return d.select(
        "day", "n_users", "n_converted",
        llr.cast("double").alias("llr"),
        F.when(llr >= a, F.lit("accept_h1"))
        .when(llr <= b, F.lit("accept_h0"))
        .otherwise(F.lit("continue")).alias("decision"),
    )
