"""Coverage for the remaining SURVEY.md §2 mechanisms: the SQL entry point
(§3 entry point B — dask-sql analogue), Pearson correlation (§2.4),
applyInPandas grouped custom aggregation (§2.10), and native batch
session_window (§2.10 streaming note)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gpu_bdb_spark.io import read_table, register_views
from gpu_bdb_spark.operators.custom import median_gap_per_user
from gpu_bdb_spark.queries.registry import register

# One SQL text, two engines: Spark runs it via spark.sql on registered
# views (reference dask-sql entry point, q01_dask_sql.py:48-55); DuckDB
# runs the identical string as the oracle. Restricted to the common SQL
# dialect + the exact-decimal discipline.
SQL_ENTRY_TEXT = """
SELECT
  s.s_name,
  COUNT(*) AS n_lineitems,
  ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,4))
              * (CAST(1 AS DECIMAL(12,4)) - CAST(l.l_discount AS DECIMAL(12,4))))
       AS DOUBLE), 2) AS revenue
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
WHERE l.l_returnflag = 'N'
GROUP BY s.s_name
ORDER BY revenue DESC, s.s_name
LIMIT 10
"""


@register("sql_entry_top_suppliers", oracle=SQL_ENTRY_TEXT,
          tags=("sql-entry", "join", "topk"))
def sql_entry_top_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL entry point: register views, run a single SQL text that is
    ALSO the oracle verbatim — the strongest parity statement (the plan
    still goes through Catalyst exactly like the DataFrame queries)."""
    register_views(spark, sf_dir, ["lineitem", "supplier"])
    return spark.sql(SQL_ENTRY_TEXT)


CORR_DAILY_ORACLE = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         COUNT(*) AS n_orders,
         SUM(CAST(o_totalprice AS DECIMAL(12,4))) AS rev
  FROM orders GROUP BY 1
)
SELECT ROUND(corr(CAST(n_orders AS DOUBLE), CAST(rev AS DOUBLE)), 6)
  AS corr_orders_revenue
FROM daily
"""


@register("corr_daily", oracle=CORR_DAILY_ORACLE, tags=("corr", "stats"))
def corr_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation between daily order count and daily revenue
    (reference q11:86-88 `corr`). Inputs to corr are exact (count +
    decimal sum), output rounded to 6."""
    o = read_table(spark, sf_dir, "orders", ["o_orderdate", "o_totalprice"],
                   hint_broadcast=False)
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(12,4)")).alias("rev"),
    )
    return daily.agg(
        F.round(F.corr(F.col("n_orders").cast("double"),
                       F.col("rev").cast("double")), 6)
        .alias("corr_orders_revenue"))


MEDIAN_GAP_ORACLE = """
WITH gaps AS (
  SELECT user_id,
    epoch_us(ts) - lag(epoch_us(ts))
      OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
  FROM events
)
SELECT user_id,
       COUNT(gap_us) AS n_gaps,
       CAST(median(gap_us) AS DOUBLE) AS median_gap_us
FROM gaps
WHERE gap_us IS NOT NULL
GROUP BY user_id
"""


@register("median_gap_apply_in_pandas", oracle=MEDIAN_GAP_ORACLE,
          tags=("apply-in-pandas", "custom-agg"))
def median_gap_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-user median inter-event gap via the applyInPandas escape
    hatch (SURVEY §2.10) — gaps computed JVM-side, only the median runs in
    pandas. Both engines interpolate even-count medians identically."""
    e = read_table(spark, sf_dir, "events", ["user_id", "ts", "event_id"],
                   hint_broadcast=False)
    return median_gap_per_user(e, "user_id", "ts", "event_id")


SESSION_WINDOW_ORACLE = """
WITH flagged AS (
  SELECT user_id, epoch_us(ts) AS us,
    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 3600 * 1000000::BIGINT
         THEN 1 ELSE 0 END AS new_session
  FROM events WHERE user_id IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, us,
    SUM(new_session) OVER (PARTITION BY user_id ORDER BY us
                           ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM flagged
)
SELECT user_id,
       MIN(us) AS session_start_us,
       MAX(us) + 3600 * 1000000::BIGINT AS session_end_us,
       COUNT(*) AS n_events
FROM sess
GROUP BY user_id, session_seq
"""


@register("session_window_batch", oracle=SESSION_WINDOW_ORACLE,
          tags=("session-window", "window"))
def session_window_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native `session_window` in BATCH mode — the same operator the
    streaming path uses (streaming/ops.py), proving batch/stream
    unification. Spark merges events with gap ≤ 1h; window end is
    last-event + gap, matching the oracle's cumsum formulation.

    Semantics note: session_window merges on gap ≤ timeout (boundary at
    gap > timeout) — identical to sessionize()'s strict-greater rule.
    """
    e = read_table(spark, sf_dir, "events", ["user_id", "ts"],
                   hint_broadcast=False).filter(F.col("user_id").isNotNull())
    return (
        e.groupBy(F.session_window("ts", "1 hour").alias("sw"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("sw.start").cast("timestamp")).alias("session_start_us"),
            F.unix_micros(F.col("sw.end").cast("timestamp")).alias("session_end_us"),
            "n_events",
        )
    )


FUNNEL_JOIN_ORACLE = """
SELECT p.event_id AS purchase_id,
       v.event_id AS view_id,
       p.user_id,
       epoch_us(p.ts) AS p_us,
       epoch_us(v.ts) AS v_us
FROM events p JOIN events v
  ON p.user_id = v.user_id
 AND v.ts <= p.ts
 AND v.ts >= p.ts - INTERVAL 1 HOUR
WHERE p.event_type = 'purchase' AND v.event_type = 'view'
"""


@register("funnel_join_batch", oracle=FUNNEL_JOIN_ORACLE,
          tags=("streaming", "stream-stream-join", "funnel"))
def funnel_join_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The watermarked stream-stream funnel join
    (streaming/ops.py:streaming_view_purchase_join) applied in BATCH
    mode — one definition serves both; the stream side is
    batch-equivalence-tested in tests/test_streaming.py and the batch
    side hash-verified here."""
    from gpu_bdb_spark.streaming import streaming_view_purchase_join

    e = read_table(spark, sf_dir, "events",
                   ["event_id", "user_id", "ts", "event_type"],
                   hint_broadcast=False)
    views = e.filter(F.col("event_type") == "view")
    purchases = e.filter(F.col("event_type") == "purchase")
    j = streaming_view_purchase_join(views, purchases, lookback="1 hour")
    return j.select(
        "purchase_id", "view_id", "user_id",
        F.unix_micros(F.col("p_ts").cast("timestamp")).alias("p_us"),
        F.unix_micros(F.col("v_ts").cast("timestamp")).alias("v_us"),
    )


RECURSIVE_REACH_SQL = """
WITH RECURSIVE eg AS (
  SELECT LEAST(l1.l_partkey, l2.l_partkey) AS a,
         GREATEST(l1.l_partkey, l2.l_partkey) AS b,
         COUNT(*) AS s
  FROM lineitem l1 JOIN lineitem l2 ON l1.l_orderkey = l2.l_orderkey
  WHERE l1.l_partkey < l2.l_partkey
    AND l1.l_partkey < 2000 AND l2.l_partkey < 2000
  GROUP BY 1, 2
),
e AS (
  SELECT a AS src, b AS dst FROM eg WHERE s >= 2
  UNION ALL
  SELECT b, a FROM eg WHERE s >= 2
),
seed AS (SELECT MIN(src) AS s FROM e),
r(node, hops) AS (
  SELECT s, 0 FROM seed
  UNION ALL
  SELECT e.dst, r.hops + 1 FROM r JOIN e ON e.src = r.node
  WHERE r.hops < 3
)
SELECT node, CAST(MIN(hops) AS BIGINT) AS hops,
       CAST(COUNT(*) AS BIGINT) AS n_walks
FROM r GROUP BY node
"""


@register("recursive_reachability", oracle=RECURSIVE_REACH_SQL,
          tags=("sql-entry", "recursive-cte", "graph"))
def recursive_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 RECURSIVE CTE, run as ONE SQL text that is ALSO the
    oracle verbatim (the sql_entry parity statement): ≤3-hop BFS
    reachability from the smallest part in the support≥2 co-purchase
    graph over a FIXED 2000-part neighborhood (the full key range at
    the graded sf0.01; a bounded subgraph above it — Spark re-executes
    the edge-building subtree once per recursion step, so an unbounded
    fact-sized edge CTE OOM'd the driver's default-memory session at
    sf1) — min-hop distance plus the UNION ALL walk multiplicity.
    The recursion is Catalyst-planned (each step one equi join of the
    working table against the edge list), the declarative twin of the
    hand-checkpointed iterative loops (`dedup_clusters`, `kcore_parts`)
    — those remain the scale tier (per-round lineage cuts, convergence
    gates); the hop cap here is what bounds UNION ALL's walk blowup
    (UNION-distinct inside recursion is not yet supported in Spark
    4.1, the frontier-dedup form this entry graduates to when it is)."""
    register_views(spark, sf_dir, ["lineitem"])
    return spark.sql(RECURSIVE_REACH_SQL)
