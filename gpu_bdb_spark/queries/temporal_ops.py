"""Driver-contract entries for the temporal operators (as-of join,
bucketed range join, hypertable rollup) over the `events` table, each
with an exact DuckDB oracle — the as-of oracle uses DuckDB's native
ASOF JOIN, so the operator is checked against an independent reference
implementation of the semantics, not a restatement of our own.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gpu_bdb_spark.functions import micros
from gpu_bdb_spark.io import read_table
from gpu_bdb_spark.operators.temporal import (asof_join, hypertable_rollup,
                                              range_join)
from gpu_bdb_spark.queries.registry import register

#: Right side unique per (user_id, ts) — max(value) collapses (hypothetical)
#: duplicate instants identically in both engines, keeping ASOF ties
#: well-defined.
ASOF_ORACLE = """
WITH purchases AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
),
views AS (
  SELECT user_id, ts, MAX(value) AS v
  FROM events WHERE event_type = 'view' GROUP BY 1, 2
)
SELECT p.event_id,
       p.user_id,
       ROUND(v.v, 6) AS value_asof,
       ROUND((epoch_us(p.ts) - epoch_us(v.ts)) / 1000000.0, 6) AS lag_s
FROM purchases p ASOF LEFT JOIN views v
  ON p.user_id = v.user_id AND v.ts <= p.ts
"""


@register("asof_join_last_view", oracle=ASOF_ORACLE,
          tags=("temporal", "asof", "join"))
def asof_join_last_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: each purchase picks up the value of the same
    user's latest view at-or-before it (NULL when none). Implemented as a
    tagged union + running last() window — one shuffle, no join — and
    oracled against DuckDB's native ASOF JOIN."""
    e = read_table(spark, sf_dir, "events",
                   ["event_id", "user_id", "ts", "event_type", "value"],
                   hint_broadcast=False)
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts")
    views = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts").agg(F.max("value").alias("v"))
    )
    j = asof_join(purchases, views, on="ts", by=("user_id",),
                  value_cols=("v",), direction="backward", suffix="_asof")
    return j.select(
        "event_id",
        "user_id",
        F.round(F.col("v_asof"), 6).alias("value_asof"),
        F.round((micros("ts") - micros("ts_asof")) / F.lit(1_000_000.0), 6)
        .alias("lag_s"),
    )


RANGE_JOIN_ORACLE = """
WITH anchors AS (
  SELECT event_id AS anchor_id, user_id, ts AS start_ts,
         ts + INTERVAL 2 HOUR AS end_ts
  FROM events WHERE event_type = 'purchase'
)
SELECT a.anchor_id, a.user_id,
       COUNT(*) AS n_in_window,
       CAST(COUNT(DISTINCT e.event_type) AS BIGINT) AS n_types
FROM events e JOIN anchors a
  ON e.user_id = a.user_id
 AND e.ts >= a.start_ts AND e.ts < a.end_ts
GROUP BY 1, 2
"""


@register("range_join_windows", oracle=RANGE_JOIN_ORACLE,
          tags=("temporal", "range-join"))
def range_join_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join, bucketed strategy: every purchase opens a 2-hour
    window; count the same user's events (and distinct types) inside it.
    Intervals explode into 2-hour buckets → equi shuffle join on
    (user_id, bucket) + exact predicate — no nested-loop join at any
    scale."""
    e = read_table(spark, sf_dir, "events",
                   ["event_id", "user_id", "ts", "event_type"],
                   hint_broadcast=False)
    anchors = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("anchor_id"),
        "user_id",
        F.col("ts").alias("start_ts"),
        (F.timestamp_micros(micros("ts")
                            + F.lit(7_200_000_000).cast("long")))
        .alias("end_ts"),
    )
    points = e.select("user_id", "ts", "event_type")
    j = range_join(points, anchors, point_col="ts", start_col="start_ts",
                   end_col="end_ts", by=("user_id",), strategy="bucket",
                   bucket_width_s=7200)
    return j.groupBy("anchor_id", "user_id").agg(
        F.count(F.lit(1)).alias("n_in_window"),
        F.countDistinct("event_type").cast("long").alias("n_types"),
    )


@register("range_join_auto", oracle=RANGE_JOIN_ORACLE,
          tags=("temporal", "range-join", "auto-strategy"))
def range_join_auto_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`range_join_windows` with bucket-vs-salted picked from MEASURED
    (user, bucket) cell skew on the point side (VERDICT r05 item 2:
    widen the data-driven dispatch; operators/skew.range_join_auto).
    Both arms are output-equivalent (pinned in test_temporal.py) and
    held to the SAME oracle as the bucketed entry, so the dispatch can
    only change the plan shape; arm choice on planted hot/uniform
    fixtures is pinned in test_skew.py."""
    from gpu_bdb_spark.operators.skew import range_join_auto

    e = read_table(spark, sf_dir, "events",
                   ["event_id", "user_id", "ts", "event_type"],
                   hint_broadcast=False)
    anchors = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("anchor_id"),
        "user_id",
        F.col("ts").alias("start_ts"),
        (F.timestamp_micros(micros("ts")
                            + F.lit(7_200_000_000).cast("long")))
        .alias("end_ts"),
    )
    points = e.select("user_id", "ts", "event_type")
    j = range_join_auto(points, anchors, point_col="ts",
                        start_col="start_ts", end_col="end_ts",
                        by=("user_id",), bucket_width_s=7200)
    return j.groupBy("anchor_id", "user_id").agg(
        F.count(F.lit(1)).alias("n_in_window"),
        F.countDistinct("event_type").cast("long").alias("n_types"),
    )


HYPERTABLE_ORACLE = """
WITH g AS (SELECT CAST(unnest([3600, 86400, 604800]) AS BIGINT) AS gran_s),
e AS (SELECT epoch_us(ts) AS us, event_type, value FROM events)
SELECT g.gran_s,
       make_timestamp(us - us % (g.gran_s * 1000000)) AS bucket_ts,
       e.event_type,
       COUNT(*) AS n_events,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(12,4))) AS DOUBLE), 2)
         AS value_sum
FROM e CROSS JOIN g
GROUP BY 1, 2, 3
"""


@register("hypertable_rollup_events", oracle=HYPERTABLE_ORACLE,
          tags=("temporal", "rollup", "hypertable"))
def hypertable_rollup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour/day/week event rollup, hierarchical mode: raw events are
    aggregated once at hour grain; day re-aggregates hours, week
    re-aggregates days (exact for count + decimal sum). One fact-table
    scan, shrinking shuffles."""
    e = read_table(spark, sf_dir, "events", ["ts", "event_type", "value"],
                   hint_broadcast=False)
    return hypertable_rollup(e, "ts", (3600, 86400, 604800),
                             ("event_type",), "value", hierarchical=True)


def _gapfill_cert_sql() -> str:
    from gpu_bdb_spark.operators.sampling import certification_sample_sql
    return certification_sample_sql("events", "user_id", 200_000, 0.0625)


GAPFILL_ORACLE = """
WITH e AS (
  SELECT user_id, epoch_us(ts) // 3600000000 AS bucket,
         epoch_us(ts) AS us, event_id, value
  FROM events
  WHERE {cert}
),
last_per_bucket AS (
  SELECT user_id, bucket, value AS obs
  FROM (SELECT *, row_number() OVER (PARTITION BY user_id, bucket
                                     ORDER BY us DESC, event_id DESC) rn
        FROM e)
  WHERE rn = 1
),
spine AS (
  SELECT user_id, unnest(generate_series(MIN(bucket), MAX(bucket)))
           AS bucket
  FROM e GROUP BY user_id
)
SELECT s.user_id, CAST(s.bucket AS BIGINT) AS bucket,
       last_value(l.obs IGNORE NULLS)
         OVER (PARTITION BY s.user_id ORDER BY s.bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value,
       CAST(CASE WHEN l.obs IS NULL THEN 1 ELSE 0 END AS INT) AS is_gap
FROM spine s LEFT JOIN last_per_bucket l USING (user_id, bucket)
"""


@register("gapfill_locf_events",
          oracle=GAPFILL_ORACLE.format(cert=_gapfill_cert_sql()),
          tags=("temporal", "gapfill", "locf", "hypertable"))
def gapfill_locf_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly gap filling with last-observation-carried-forward per
    user (TimescaleDB time_bucket_gapfill + locf shape): dense bucket
    spine per key, per-bucket deterministic last value via a
    partial-aggregating max_by, LOCF window; the fill picks existing
    doubles, never computes, so it is bit-exact cross-engine.

    Certification tier (round 13): the OUTPUT is spine-sized — users ×
    hourly span, 10.5M rows at sf1zipf — and the driver collects it,
    which OOMs a default-memory JVM on result serialization alone. So
    above 200k event rows BOTH engines restrict to the deterministic
    1/16 md5 USER sample (whole series kept or dropped together —
    per-key semantics intact; driver SFs ≤ 100k rows stay full-corpus).
    The operator itself is unbounded; at 100 TB its output is a TABLE
    you write, not a frame you collect."""
    from gpu_bdb_spark.operators.sampling import certification_sample
    from gpu_bdb_spark.operators.temporal import gapfill_locf

    e = read_table(spark, sf_dir, "events",
                   ["user_id", "ts", "event_id", "value"],
                   hint_broadcast=False)
    e = certification_sample(e, "user_id", 200_000, 0.0625)
    return gapfill_locf(e, "user_id", "ts", "value", step_s=3600)


TWA_ORACLE = """
WITH o AS (
  SELECT user_id AS key,
         CAST(value AS DECIMAL(18,6)) AS v,
         lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id)
           - epoch_us(ts) AS dt
  FROM events
)
SELECT key, CAST(COUNT(*) AS BIGINT) AS n_intervals,
       CAST(SUM(dt) AS BIGINT) AS span_us,
       ROUND(CAST(SUM(v * dt) AS DOUBLE) / CAST(SUM(dt) AS DOUBLE), 6)
         AS twa
FROM o WHERE dt IS NOT NULL
GROUP BY key HAVING SUM(dt) > 0
"""


@register("time_weighted_avg", oracle=TWA_ORACLE,
          tags=("temporal", "time-weight", "locf"))
def time_weighted_avg_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOCF time-weighted average of `value` per user over the
    irregular event stream (TimescaleDB time_weight semantics): one
    key shuffle for the lead window, hash aggregate on the same
    partitioning; exact decimal weighted sums, correctly-rounded final
    division."""
    from gpu_bdb_spark.operators.temporal import time_weighted_avg

    e = read_table(spark, sf_dir, "events",
                   ["event_id", "ts", "user_id", "value"],
                   hint_broadcast=False)
    return time_weighted_avg(e)


M4_ORACLE = """
WITH e AS (
  SELECT user_id,
         CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS bucket,
         lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0') || ':'
           || lpad(CAST(event_id AS VARCHAR), 12, '0') AS ord,
         value
  FROM events
  WHERE user_id IS NOT NULL AND value IS NOT NULL
)
SELECT user_id, bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       arg_min(value, ord) AS v_first,
       arg_max(value, ord) AS v_last,
       MIN(value) AS v_min,
       MAX(value) AS v_max
FROM e GROUP BY user_id, bucket
"""


@register("m4_downsample", oracle=M4_ORACLE,
          tags=("temporal", "downsample", "m4"))
def m4_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 time-series downsampling (Jugel et al., VLDB'14): per
    (series, bucket) keep first/last/min/max — the error-free
    downsample for line visualization, and the standard pre-aggregate
    a timeseries store ships alongside gap-fill and rollups. ONE hash
    aggregate (map-side partials; min_by/max_by on a zero-padded
    (ts, event_id) string key makes first/last a total order both
    engines share); values are PICKED, never computed — exact by
    construction. DOMAIN: the padded key is a correct total order only
    for 0 ≤ epoch_us < 1e20 and 0 ≤ event_id < 1e12 (lpad TRUNCATES
    longer inputs; negative epochs break lexicographic order), so the
    key is guarded by assert_true — out-of-domain rows fail the query
    loudly instead of silently mis-ordering first/last. NULL ts /
    event_id pass the guard (they produce a NULL order key that
    min_by/max_by ignore, the pre-guard behavior) — only genuinely
    out-of-domain VALUES fail (ADVICE r04)."""
    e = read_table(spark, sf_dir, "events",
                   ["event_id", "ts", "user_id", "value"],
                   hint_broadcast=False)
    us = micros("ts")
    in_domain = (
        ((us >= 0) & (F.col("event_id") >= 0)
         & (F.col("event_id") < F.lit(1_000_000_000_000)))
        | us.isNull() | F.col("event_id").isNull())
    ordk = F.when(
        F.assert_true(
            in_domain,
            F.lit("m4_downsample: epoch_us/event_id outside the "
                  "lpad-orderable domain")).isNull(),
        F.concat(
            F.lpad(us.cast("string"), 20, "0"), F.lit(":"),
            F.lpad(F.col("event_id").cast("string"), 12, "0")))
    return (
        e.filter(F.col("user_id").isNotNull()
                 & F.col("value").isNotNull())
        .select("user_id",
                F.floor(us / F.lit(3600000000)).cast("long").alias("bucket"),
                ordk.alias("ord"), "value")
        .groupBy("user_id", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n"),
             F.min_by("value", "ord").alias("v_first"),
             F.max_by("value", "ord").alias("v_last"),
             F.min("value").alias("v_min"),
             F.max("value").alias("v_max"))
    )


EWMA_ORACLE = """
WITH RECURSIVE daily AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
         CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS day,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4)))
              AS DECIMAL(18,4)) AS rev
  FROM orders GROUP BY 1, 2
),
seq AS MATERIALIZED (
  SELECT y, day, rev,
         CAST(row_number() OVER (PARTITION BY y ORDER BY day) AS BIGINT)
           AS i
  FROM daily
),
r(y, i, day, rev, e) AS (
  SELECT y, i, day, rev, CAST(rev AS DECIMAL(28,9)) FROM seq WHERE i = 1
  UNION ALL
  SELECT s.y, s.i, s.day, s.rev,
         CAST(round(0.2 * s.rev + 0.8 * r.e, 9) AS DECIMAL(28,9))
  FROM r JOIN seq s ON s.y = r.y AND s.i = r.i + 1
)
SELECT y, day, CAST(rev AS DOUBLE) AS rev,
       CAST(round(e, 6) AS DOUBLE) AS ewma
FROM r
"""


@register("ewma_daily_revenue", oracle=EWMA_ORACLE,
          tags=("temporal", "smoothing", "ewma", "sequential"))
def ewma_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average of daily revenue, one EWMA
    chain per year — the classical monitoring smoother, which is
    INHERENTLY sequential (e_t = α·x_t + (1−α)·e_{t−1} is not
    window-expressible without a recursive product). Scale shape: the
    fact table collapses to a per-(series, day) decimal aggregate
    first; the recursion then runs per series inside applyInPandas —
    parallelism is ACROSS series (the realistic axis: one chain per
    metric/tenant), each chain a few hundred floats. Each step is
    fixed-order IEEE (identical doubles both engines) quantized round-9
    — pagerank's bit-reproducible-fixed-point discipline for a
    sequential op — so the DuckDB recursive-CTE oracle replays every
    step exactly."""
    o = read_table(spark, sf_dir, "orders",
                   ["o_orderdate", "o_totalprice"], hint_broadcast=False)
    daily = o.groupBy(
        F.year("o_orderdate").cast("long").alias("y"),
        F.floor(micros("o_orderdate") / F.lit(86_400_000_000))
        .cast("long").alias("day"),
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(12,4)")).alias("rev"))

    def chain(pdf):
        import decimal as _dec

        _dec.getcontext().prec = 50  # chain values never context-round

        # the whole chain stays EXACT DECIMAL (finite decimals: 0.2·x
        # and 0.8·e are exact products, quantize-9 HALF_UP per step);
        # floats appear only in the output cast. A float chain diverged
        # from DuckDB's round(double, 9) by 1 ulp at 1e6 magnitudes.
        q9 = _dec.Decimal("1e-9")
        # the CHAIN carries scale 9; the OUTPUT re-rounds to scale 6:
        # a scale-9 decimal of ~1e7 has an integer form > 2^53, and
        # DuckDB's decimal->double cast double-rounds there (int128 ->
        # double, then /10^scale) — at scale 6 the cast is exact on
        # both engines (measured 1-ulp oracle mismatches at sf0.1).
        q6 = _dec.Decimal("1e-6")
        a, b = _dec.Decimal("0.2"), _dec.Decimal("0.8")
        pdf = pdf.sort_values("day").reset_index(drop=True)
        out, e = [], None
        for x in pdf["rev"]:
            x = _dec.Decimal(x)
            e = x if e is None else (a * x + b * e).quantize(
                q9, rounding=_dec.ROUND_HALF_UP)
            out.append(float(e.quantize(q6, rounding=_dec.ROUND_HALF_UP)))
        pdf["ewma"] = out
        pdf["rev"] = [float(_dec.Decimal(x)) for x in pdf["rev"]]
        return pdf[["y", "day", "rev", "ewma"]]

    return daily.groupBy("y").applyInPandas(
        chain, "y long, day long, rev double, ewma double")


CUSUM_ORACLE = """
WITH RECURSIVE daily AS (
  SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS day,
         CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4)))
                   AS DECIMAL(18,4)) AS DOUBLE) AS rev
  FROM orders GROUP BY 1
),
mu AS (
  SELECT CAST(SUM(CAST(rev AS DECIMAL(18,4))) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE) AS mu
  FROM daily
),
seq AS MATERIALIZED (
  SELECT d.day, d.rev, m.mu,
         CAST(row_number() OVER (ORDER BY d.day) AS BIGINT) AS i
  FROM daily d, mu m
),
r(i, day, rev, s) AS (
  SELECT i, day, rev,
         greatest(0.0, round(rev - mu - 0.1 * mu, 2))
  FROM seq WHERE i = 1
  UNION ALL
  SELECT q.i, q.day, q.rev,
         greatest(0.0, round(r.s + q.rev - q.mu - 0.1 * q.mu, 2))
  FROM r JOIN seq q ON q.i = r.i + 1
)
SELECT r.day, round(r.rev, 2) AS rev, r.s AS cusum,
       CAST(r.s > 3.0 * m.mu AS INT) AS flag
FROM r, mu m
"""


@register("cusum_changepoint", oracle=CUSUM_ORACLE,
          tags=("temporal", "changepoint", "cusum", "sequential"))
def cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM changepoint/drift detector over daily revenue:
    S_t = max(0, S_{t−1} + x_t − μ − k) with allowance k = 0.1·μ and
    decision threshold 3·μ — the classic sequential monitoring chart
    next to `ewma_daily_revenue`'s smoother and `rolling_zscore`'s
    pointwise flags. Same layout: the fact table collapses to the
    daily frame, the recursion runs over that collapsed frame in
    applyInPandas, each step a fixed-order IEEE expression quantized
    round-2 (integer form stays far under 2^53 — the decimal↔double
    edge rule), replayed exactly by a recursive-CTE oracle."""
    o = read_table(spark, sf_dir, "orders",
                   ["o_orderdate", "o_totalprice"], hint_broadcast=False)
    daily = o.groupBy(
        F.floor(micros("o_orderdate") / F.lit(86_400_000_000))
        .cast("long").alias("day"),
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(12,4)"))
          .cast("decimal(18,4)").cast("double").alias("rev"))
    mu = daily.agg(
        (F.sum(F.col("rev").cast("decimal(18,4)")).cast("double")
         / F.count(F.lit(1)).cast("double")).alias("mu"))
    seq = daily.crossJoin(F.broadcast(mu))

    def chain(pdf):
        import decimal as _dec

        q2 = _dec.Decimal("1e-2")

        def r2(x):
            return float(_dec.Decimal(repr(float(x))).quantize(
                q2, rounding=_dec.ROUND_HALF_UP))

        pdf = pdf.sort_values("day").reset_index(drop=True)
        out, flags, s = [], [], 0.0
        for rev, mu_ in zip(pdf["rev"], pdf["mu"]):
            s = max(0.0, r2(s + float(rev) - float(mu_) - 0.1 * float(mu_)))
            out.append(s)
            flags.append(int(s > 3.0 * float(mu_)))
        pdf["cusum"] = out
        pdf["flag"] = flags
        pdf["rev"] = [r2(x) for x in pdf["rev"]]
        return pdf[["day", "rev", "cusum", "flag"]]

    return seq.groupBy().applyInPandas(
        chain, "day long, rev double, cusum double, flag int")


HOLT_ORACLE = """
WITH RECURSIVE daily AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
         CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS day,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4)))
              AS DECIMAL(18,4)) AS rev
  FROM orders GROUP BY 1, 2
),
seq AS MATERIALIZED (
  SELECT y, day, rev,
         CAST(row_number() OVER (PARTITION BY y ORDER BY day) AS BIGINT)
           AS i
  FROM daily
),
r(y, i, day, rev, l, b) AS (
  SELECT y, i, day, rev, CAST(rev AS DECIMAL(28,9)),
         CAST(0 AS DECIMAL(28,9))
  FROM seq WHERE i = 1
  UNION ALL
  SELECT s.y, s.i, s.day, s.rev,
         CAST(round(0.2 * s.rev + 0.8 * (r.l + r.b), 9) AS DECIMAL(28,9)),
         CAST(round(0.1 * (CAST(round(0.2 * s.rev + 0.8 * (r.l + r.b), 9)
                                AS DECIMAL(28,9)) - r.l)
                    + 0.9 * r.b, 9) AS DECIMAL(28,9))
  FROM r JOIN seq s ON s.y = r.y AND s.i = r.i + 1
)
SELECT y, day, CAST(rev AS DOUBLE) AS rev,
       CAST(round(l, 6) AS DOUBLE) AS level,
       CAST(round(b, 6) AS DOUBLE) AS trend,
       CAST(round(l + b, 6) AS DOUBLE) AS forecast
FROM r
"""


@register("holt_trend_daily", oracle=HOLT_ORACLE,
          tags=("temporal", "smoothing", "holt", "sequential"), bench=True)
def holt_trend_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt linear-trend (double exponential) smoothing of daily revenue,
    one chain per year — the level+trend extension of
    `ewma_daily_revenue`: l_t = α·x_t + (1−α)·(l_{t−1} + b_{t−1}),
    b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}, one-step forecast l + b.
    α = 0.2, β = 0.1; init l₁ = x₁, b₁ = 0 (documented, replayed by the
    oracle). Same discipline as EWMA: the fact table collapses to the
    per-(year, day) decimal frame distributedly, the two-variable chain
    runs per year in applyInPandas entirely in EXACT DECIMAL (quantize-9
    HALF_UP per step, the QUANTIZED l_t feeding b_t — the oracle repeats
    the rounded expression verbatim), outputs re-round to 6. The DuckDB
    recursive CTE carries (l, b) and restates every step bit-for-bit."""
    o = read_table(spark, sf_dir, "orders",
                   ["o_orderdate", "o_totalprice"], hint_broadcast=False)
    daily = o.groupBy(
        F.year("o_orderdate").cast("long").alias("y"),
        F.floor(micros("o_orderdate") / F.lit(86_400_000_000))
        .cast("long").alias("day"),
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(12,4)")).alias("rev"))

    def chain(pdf):
        import decimal as _dec

        _dec.getcontext().prec = 50
        q9 = _dec.Decimal("1e-9")
        q6 = _dec.Decimal("1e-6")
        a, ac = _dec.Decimal("0.2"), _dec.Decimal("0.8")
        beta, bc = _dec.Decimal("0.1"), _dec.Decimal("0.9")
        pdf = pdf.sort_values("day").reset_index(drop=True)
        lv = tr = None
        out_l, out_b, out_f = [], [], []
        for x in pdf["rev"]:
            x = _dec.Decimal(x)
            if lv is None:
                lv, tr = x.quantize(q9), _dec.Decimal(0).quantize(q9)
            else:
                prev = lv
                lv = (a * x + ac * (prev + tr)).quantize(
                    q9, rounding=_dec.ROUND_HALF_UP)
                tr = (beta * (lv - prev) + bc * tr).quantize(
                    q9, rounding=_dec.ROUND_HALF_UP)
            out_l.append(float(lv.quantize(q6, rounding=_dec.ROUND_HALF_UP)))
            out_b.append(float(tr.quantize(q6, rounding=_dec.ROUND_HALF_UP)))
            out_f.append(float((lv + tr).quantize(
                q6, rounding=_dec.ROUND_HALF_UP)))
        pdf["level"] = out_l
        pdf["trend"] = out_b
        pdf["forecast"] = out_f
        pdf["rev"] = [float(_dec.Decimal(x)) for x in pdf["rev"]]
        return pdf[["y", "day", "rev", "level", "trend", "forecast"]]

    return daily.groupBy("y").applyInPandas(
        chain,
        "y long, day long, rev double, level double, trend double, "
        "forecast double")


SEASONAL_DECOMPOSE_ORACLE = """
WITH daily AS (
  SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS day,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4)))
              AS DECIMAL(18,4)) AS rev
  FROM orders GROUP BY 1
),
win AS (
  SELECT day, rev,
         count(*) OVER w AS n7,
         CAST(SUM(rev) OVER w AS DECIMAL(28,4)) AS sum7
  FROM daily
  WINDOW w AS (ORDER BY day RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
det AS (
  SELECT day, rev, n7, sum7, (day + 4) % 7 AS wd,
         CASE WHEN n7 = 7
              THEN CAST(7 * rev AS DECIMAL(28,4)) - sum7 END AS det7
  FROM win
),
seas AS (
  SELECT wd,
         CAST(SUM(det7) AS DOUBLE) AS s_sum,
         CAST(COUNT(det7) AS BIGINT) AS s_n
  FROM det GROUP BY wd
)
SELECT d.day,
       CAST(d.rev AS DOUBLE) AS rev,
       CASE WHEN d.n7 = 7 THEN CAST(d.sum7 AS DOUBLE) / 7.0 END AS trend,
       CASE WHEN s.s_n > 0
            THEN s.s_sum / (7.0 * CAST(s.s_n AS DOUBLE)) END AS seasonal,
       CASE WHEN d.n7 = 7 AND s.s_n > 0
            THEN (CAST(d.rev AS DOUBLE) - CAST(d.sum7 AS DOUBLE) / 7.0)
                 - s.s_sum / (7.0 * CAST(s.s_n AS DOUBLE)) END AS remainder
FROM det d LEFT JOIN seas s USING (wd)
"""


@register("seasonal_decompose_daily", oracle=SEASONAL_DECOMPOSE_ORACLE,
          tags=("temporal", "decomposition", "seasonal"))
def seasonal_decompose_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive time-series decomposition of daily revenue:
    trend = centered 7-day moving average (NULL at series edges /
    gaps — the frame must hold exactly 7 days), weekly seasonal =
    per-weekday mean of the detrended series, remainder = the rest.

    Cross-engine exactness WITHOUT any quotient rounding: every
    aggregate is an exact decimal (the 7-day total, and 7·x − Σ7 — the
    detrended value SCALED BY 7 so it never leaves decimal), and each
    published float is a FIXED-ORDER chain of correctly-rounded IEEE
    ops on bit-identical inputs (sum7/7.0; s_sum/(7.0·n); (rev − trend)
    − seasonal) — the ab_test_conversion argument, so no round()
    appears at all. Decimal→double casts stay exact (int forms ≪ 2^53).

    Scale shape: the fact table collapses distributedly to the
    day-cardinality frame FIRST; the total-order ±3-day window then
    sorts a few-thousand-row frame (single partition by construction —
    the rfm ntile precedent), the weekday frame is 7 rows and joins
    back broadcast. The sliding frame here is day-granular: its width
    is 7 ROWS by definition, immune to the bot-density trap measured
    in SCALE.md round 11.

    The finishing is shared with the streaming standing-table twin
    (`streaming.ops.seasonal_ingest_batches` / `seasonal_serve`) via
    `operators/temporal.seasonal_decompose_rollup`, so drained ≡ batch
    bit-for-bit."""
    from gpu_bdb_spark.operators.temporal import seasonal_decompose_rollup

    o = read_table(spark, sf_dir, "orders",
                   ["o_orderdate", "o_totalprice"], hint_broadcast=False)
    daily = o.groupBy(
        F.floor(micros("o_orderdate") / F.lit(86_400_000_000))
        .cast("long").alias("day"),
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(12,4)"))
          .cast("decimal(18,4)").alias("rev"))
    return seasonal_decompose_rollup(daily)


def _hw_oracle() -> str:
    """Holt-Winters additive recursive-CTE oracle, assembled
    programmatically: the quantized level expression must be inlined
    into the trend and seasonal updates (SQL can't alias within the
    recursive SELECT), and the weekday-indexed seasonal is 7 carried
    columns with a CASE per column."""
    wd = "(s.day + 4) % 7"
    s_used = ("CASE " + " ".join(
        f"WHEN {wd} = {i} THEN r.s{i}" for i in range(7)) + " END")
    lt = (f"CAST(round(0.2 * (s.rev - ({s_used})) "
          f"+ 0.8 * (r.l + r.b), 9) AS DECIMAL(28,9))")
    bt = (f"CAST(round(0.1 * ({lt} - r.l) + 0.9 * r.b, 9) "
          f"AS DECIMAL(28,9))")
    snew = (f"CAST(round(0.3 * (s.rev - {lt}) + 0.7 * ({s_used}), 9) "
            f"AS DECIMAL(28,9))")
    scols = ",\n         ".join(
        f"CASE WHEN {wd} = {i} THEN {snew} ELSE r.s{i} END AS s{i}"
        for i in range(7))
    zero = "CAST(0 AS DECIMAL(28,9))"
    return f"""
WITH RECURSIVE daily AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
         CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS day,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4)))
              AS DECIMAL(18,4)) AS rev
  FROM orders GROUP BY 1, 2
),
seq AS MATERIALIZED (
  SELECT y, day, rev,
         CAST(row_number() OVER (PARTITION BY y ORDER BY day) AS BIGINT)
           AS i
  FROM daily
),
r(y, i, day, rev, fitted, l, b,
  s0, s1, s2, s3, s4, s5, s6) AS (
  SELECT y, i, day, rev, CAST(NULL AS DECIMAL(28,9)),
         CAST(rev AS DECIMAL(28,9)), {zero},
         {zero}, {zero}, {zero}, {zero}, {zero}, {zero}, {zero}
  FROM seq WHERE i = 1
  UNION ALL
  SELECT s.y, s.i, s.day, s.rev,
         CAST(r.l + r.b + ({s_used}) AS DECIMAL(28,9)),
         {lt},
         {bt},
         {scols}
  FROM r JOIN seq s ON s.y = r.y AND s.i = r.i + 1
)
SELECT y, day, CAST(rev AS DOUBLE) AS rev,
       CAST(round(l, 6) AS DOUBLE) AS level,
       CAST(round(b, 6) AS DOUBLE) AS trend,
       CAST(round(fitted, 6) AS DOUBLE) AS fitted
FROM r
"""


@register("holt_winters_daily", oracle=_hw_oracle(),
          tags=("temporal", "smoothing", "holt-winters", "seasonal",
                "sequential"))
def holt_winters_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt-Winters ADDITIVE seasonal smoothing of daily revenue
    (weekly period), one chain per year — the seasonal completion of
    the smoothing family (EWMA → Holt → Holt-Winters): with weekday
    seasonal state s_w, l_t = α(x_t − s_w) + (1−α)(l+b),
    b_t = β(l_t − l) + (1−β)b, s_w ← γ(x_t − l_t) + (1−γ)s_w, and the
    published `fitted` is the PRIOR one-step forecast l+b+s_w (NULL on
    each chain's first row). α=0.2, β=0.1, γ=0.3; init l₁=x₁, b₁=0,
    s≡0 (documented; the oracle replays it). Seasonality is indexed by
    WEEKDAY, not recursion position, so day gaps cannot misalign the
    period. Exactness discipline: exact-decimal chain quantized
    round-9 per step, the QUANTIZED level feeding both the trend and
    seasonal updates — the DuckDB recursive CTE (assembled by
    `_hw_oracle`, carrying the 7 seasonal columns) restates every step
    bit-for-bit."""
    o = read_table(spark, sf_dir, "orders",
                   ["o_orderdate", "o_totalprice"], hint_broadcast=False)
    daily = o.groupBy(
        F.year("o_orderdate").cast("long").alias("y"),
        F.floor(micros("o_orderdate") / F.lit(86_400_000_000))
        .cast("long").alias("day"),
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(12,4)")).alias("rev"))

    def chain(pdf):
        import decimal as _dec

        _dec.getcontext().prec = 50
        q9 = _dec.Decimal("1e-9")
        q6 = _dec.Decimal("1e-6")
        al, alc = _dec.Decimal("0.2"), _dec.Decimal("0.8")
        be, bec = _dec.Decimal("0.1"), _dec.Decimal("0.9")
        ga, gac = _dec.Decimal("0.3"), _dec.Decimal("0.7")
        z9 = _dec.Decimal(0).quantize(q9)
        pdf = pdf.sort_values("day").reset_index(drop=True)
        lv = tr = None
        s = {i: z9 for i in range(7)}
        out_l, out_b, out_f = [], [], []

        def r6(d):
            return (None if d is None else
                    float(d.quantize(q6, rounding=_dec.ROUND_HALF_UP)))

        for day, x in zip(pdf["day"], pdf["rev"]):
            x = _dec.Decimal(x)
            w = int((int(day) + 4) % 7)
            if lv is None:
                lv, tr = x.quantize(q9), z9
                out_f.append(None)
            else:
                sw = s[w]
                out_f.append(r6(lv + tr + sw))
                prev = lv
                lv = (al * (x - sw) + alc * (prev + tr)).quantize(
                    q9, rounding=_dec.ROUND_HALF_UP)
                tr = (be * (lv - prev) + bec * tr).quantize(
                    q9, rounding=_dec.ROUND_HALF_UP)
                s[w] = (ga * (x - lv) + gac * sw).quantize(
                    q9, rounding=_dec.ROUND_HALF_UP)
            out_l.append(r6(lv))
            out_b.append(r6(tr))
        pdf["level"] = out_l
        pdf["trend"] = out_b
        pdf["fitted"] = out_f
        pdf["rev"] = [float(_dec.Decimal(x)) for x in pdf["rev"]]
        return pdf[["y", "day", "rev", "level", "trend", "fitted"]]

    return daily.groupBy("y").applyInPandas(
        chain,
        "y long, day long, rev double, level double, trend double, "
        "fitted double")
