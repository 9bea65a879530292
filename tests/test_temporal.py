"""Temporal operator semantics + plan-shape tests: as-of join (backward /
forward / tolerance / tiebreak, zero-join plan), bucketed range join
(bucket ≡ broadcast, intervals spanning buckets), hypertable rollup
(hierarchical ≡ explode, level re-aggregation exactness). The driver-facing
entries are additionally hash-checked vs DuckDB oracles (temporal_ops.py —
the as-of oracle is DuckDB's native ASOF JOIN)."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from gpu_bdb_spark.operators.temporal import (asof_join, hypertable_rollup,
                                              range_join)
from gpu_bdb_spark.plans import formatted_plan


@pytest.fixture(scope="module")
def trades_quotes(spark):
    trades = spark.createDataFrame(
        [(1, 100, "t1"), (1, 205, "t2"), (2, 150, "t3"), (3, 50, "t4")],
        "sym long, ts long, trade_id string")
    quotes = spark.createDataFrame(
        [(1, 90, 10.0), (1, 100, 11.0), (1, 200, 12.0),
         (2, 149, 20.0), (2, 151, 21.0)],
        "sym long, ts long, px double")
    return trades, quotes


def test_asof_backward(spark, trades_quotes):
    trades, quotes = trades_quotes
    got = {r.trade_id: (r.px_asof, r.ts_asof)
           for r in asof_join(trades, quotes, on="ts", by=("sym",),
                              value_cols=("px",)).collect()}
    assert got == {
        "t1": (11.0, 100),   # inclusive: quote AT the trade instant
        "t2": (12.0, 200),
        "t3": (20.0, 149),   # 151 is in the future
        "t4": (None, None),  # sym 3 has no quotes — left-join NULL
    }


def test_asof_forward_and_tolerance(spark, trades_quotes):
    trades, quotes = trades_quotes
    fwd = {r.trade_id: r.px_asof
           for r in asof_join(trades, quotes, on="ts", by=("sym",),
                              value_cols=("px",),
                              direction="forward").collect()}
    assert fwd == {"t1": 11.0, "t2": None, "t3": 21.0, "t4": None}
    tol = {r.trade_id: r.px_asof
           for r in asof_join(trades, quotes, on="ts", by=("sym",),
                              value_cols=("px",),
                              tolerance_s=4).collect()}
    # t2's nearest backward quote is 5 ticks away -> nulled by tolerance 4
    assert tol == {"t1": 11.0, "t2": None, "t3": 20.0, "t4": None}


def test_asof_right_tiebreak_deterministic(spark):
    left = spark.createDataFrame([(1, 10)], "k long, ts long")
    right = spark.createDataFrame(
        [(1, 10, 5.0, 1), (1, 10, 7.0, 2), (1, 10, 6.0, 0)],
        "k long, ts long, px double, seq long")
    got = asof_join(left, right, on="ts", by=("k",), value_cols=("px",),
                    right_tiebreak="seq").collect()
    assert got[0].px_asof == 7.0  # greatest tiebreak wins


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_chunked_equals_unchunked(spark, direction):
    import random

    rng = random.Random(9)
    left = spark.createDataFrame(
        [(rng.randrange(3), rng.randrange(1000), i) for i in range(300)],
        "k long, ts long, lid long")
    right = spark.createDataFrame(
        [(rng.randrange(3), t, float(t)) for t in
         rng.sample(range(1000), 120)],
        "k long, ts long, px double")
    kw = dict(on="ts", by=("k",), value_cols=("px",), direction=direction)
    plain = {(r.k, r.ts, r.lid): (r.px_asof, r.ts_asof)
             for r in asof_join(left, right, **kw).collect()}
    # chunk width 50 -> ~20 chunks; plenty of cross-chunk carries
    chunked = {(r.k, r.ts, r.lid): (r.px_asof, r.ts_asof)
               for r in asof_join(left, right, chunk_s=50, **kw).collect()}
    assert chunked == plain


def test_asof_chunked_tolerance(spark, trades_quotes):
    trades, quotes = trades_quotes
    tol = {r.trade_id: r.px_asof
           for r in asof_join(trades, quotes, on="ts", by=("sym",),
                              value_cols=("px",), tolerance_s=4,
                              chunk_s=30).collect()}
    assert tol == {"t1": 11.0, "t2": None, "t3": 20.0, "t4": None}


def test_asof_plan_single_shuffle_no_join(spark, trades_quotes):
    trades, quotes = trades_quotes
    plan = formatted_plan(
        asof_join(trades, quotes, on="ts", by=("sym",), value_cols=("px",)))
    assert "Join" not in plan, plan
    # union + one hash partitioning on the by key (local test frames add a
    # parallelize exchange; count only hashpartitioning exchanges)
    assert len(re.findall(r"hashpartitioning\(sym", plan)) == 1, plan


@pytest.fixture(scope="module")
def points_intervals(spark):
    points = spark.createDataFrame(
        [(1, 5, "a"), (1, 55, "b"), (1, 250, "c"), (2, 55, "d")],
        "k long, ts long, pid string")
    # iv1 spans buckets 0..2 at width 100; iv2 is sub-bucket; iv3 empty
    intervals = spark.createDataFrame(
        [(1, 0, 260, "iv1"), (1, 50, 60, "iv2"), (2, 60, 60, "iv3")],
        "k long, s long, e long, iid string")
    return points, intervals


def test_range_join_bucket_matches_broadcast(spark, points_intervals):
    points, intervals = points_intervals
    expect = {("a", "iv1"), ("b", "iv1"), ("c", "iv1"), ("b", "iv2")}
    for strategy in ("bucket", "broadcast"):
        got = {(r.pid, r.iid)
               for r in range_join(points, intervals, "ts", "s", "e",
                                   by=("k",), strategy=strategy,
                                   bucket_width_s=100).collect()}
        assert got == expect, strategy


def test_range_join_half_open_and_multibucket(spark):
    points = spark.createDataFrame(
        [(0, "at_start"), (99, "inside"), (100, "at_end")],
        "ts long, pid string")
    intervals = spark.createDataFrame([(0, 100, "iv")], "s long, e long, iid string")
    got = {r.pid for r in range_join(points, intervals, "ts", "s", "e",
                                     strategy="bucket",
                                     bucket_width_s=7).collect()}
    assert got == {"at_start", "inside"}  # end exclusive


def test_range_join_bucket_plan_is_equi_join(spark, points_intervals):
    points, intervals = points_intervals
    plan = formatted_plan(
        range_join(points, intervals, "ts", "s", "e", by=("k",),
                   strategy="bucket", bucket_width_s=100))
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


@pytest.fixture(scope="module")
def hourly_events(spark):
    # two days of events, 3 per hour boundary region, two types
    rows = []
    for h in range(0, 40):
        for i, typ in enumerate(("x", "y", "x")):
            rows.append((h * 3600 + i * 600, typ, float(h) + i * 0.25))
    return spark.createDataFrame(rows, "ts_s long, event_type string, value double")


def test_rollup_hierarchical_matches_explode(spark, hourly_events):
    df = hourly_events.select(
        F.timestamp_micros(F.col("ts_s") * F.lit(1_000_000)).alias("ts"),
        "event_type", "value")
    widths = (3600, 86400)
    key = lambda r: (r.gran_s, r.bucket_ts, r.event_type)  # noqa: E731
    hier = {key(r): (r.n_events, r.value_sum)
            for r in hypertable_rollup(df, "ts", widths,
                                       hierarchical=True).collect()}
    flat = {key(r): (r.n_events, r.value_sum)
            for r in hypertable_rollup(df, "ts", widths,
                                       hierarchical=False).collect()}
    assert hier == flat
    # day grain partitions all 120 events across 2 day-buckets x 2 types
    day = [(k, v) for k, v in hier.items() if k[0] == 86400]
    assert len(day) == 4
    assert sum(v[0] for _, v in day) == 120


def test_rollup_rejects_non_nested_widths(spark, hourly_events):
    df = hourly_events.select(
        F.timestamp_micros(F.col("ts_s") * F.lit(1_000_000)).alias("ts"),
        "event_type", "value")
    with pytest.raises(ValueError, match="nested"):
        hypertable_rollup(df, "ts", (3600, 5000), hierarchical=True)


def test_range_join_salted_matches_bucket(spark, points_intervals):
    """Salted strategy (hot-cell skew spread) is output-equivalent to the
    plain bucket strategy, including a deliberately hot cell: one key ×
    many points × many overlapping intervals."""
    points, intervals = points_intervals
    expect = {("a", "iv1"), ("b", "iv1"), ("c", "iv1"), ("b", "iv2")}
    got = {(r.pid, r.iid)
           for r in range_join(points, intervals, "ts", "s", "e",
                               by=("k",), strategy="salted",
                               bucket_width_s=100, n_salts=4).collect()}
    assert got == expect

    hot_points = spark.createDataFrame(
        [(1, t, f"p{t}") for t in range(0, 200, 5)],
        "k long, ts long, pid string")
    hot_intervals = spark.createDataFrame(
        [(1, s, s + 50, f"iv{s}") for s in range(0, 150, 10)],
        "k long, s long, e long, iid string")
    base = {(r.pid, r.iid)
            for r in range_join(hot_points, hot_intervals, "ts", "s", "e",
                                by=("k",), strategy="bucket",
                                bucket_width_s=60).collect()}
    salted = {(r.pid, r.iid)
              for r in range_join(hot_points, hot_intervals, "ts", "s", "e",
                                  by=("k",), strategy="salted",
                                  bucket_width_s=60, n_salts=5).collect()}
    assert salted == base and len(base) > 100


class TestGapfillLocf:
    """Gap filling + LOCF (round 5)."""

    def test_planted_gaps_filled_and_leading_nulls_kept(self, spark):
        from datetime import datetime

        from gpu_bdb_spark.operators.temporal import gapfill_locf

        def ts(h):
            return datetime(2001, 1, 1, h)

        rows = [
            # user 1: obs at hours 1 and 4 → gaps at 2,3 carry value 10
            (101, ts(1), 1, 10.0),
            (102, ts(4), 1, 40.0),
            # user 1, same bucket as 102 but earlier → must lose argmax
            (100, ts(4), 1, 39.0),
            # user 2: single observation → one row, no gaps
            (103, ts(2), 2, 7.0),
        ]
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, value double")
        got = {(r["user_id"], r["bucket"] % 24): (r["value"], r["is_gap"])
               for r in gapfill_locf(df).collect()}
        assert got[(1, 1)] == (10.0, 0)
        assert got[(1, 2)] == (10.0, 1)
        assert got[(1, 3)] == (10.0, 1)
        assert got[(1, 4)] == (40.0, 0)   # max (ts, event_id) wins
        assert got[(2, 2)] == (7.0, 0)
        assert len(got) == 5

    def test_bucket_argmax_tiebreak_on_event_id(self, spark):
        from datetime import datetime

        from gpu_bdb_spark.operators.temporal import gapfill_locf

        t = datetime(2001, 1, 1, 5)
        df = spark.createDataFrame(
            [(2, t, 1, 2.0), (9, t, 1, 9.0), (5, t, 1, 5.0)],
            "event_id long, ts timestamp, user_id long, value double")
        rows = gapfill_locf(df).collect()
        assert len(rows) == 1 and rows[0]["value"] == 9.0


def test_time_weighted_avg_semantics(spark):
    """Hand-computed LOCF weights; single-sample and zero-span keys
    drop; same-ts tie resolved by the id column."""
    import datetime as dt

    from gpu_bdb_spark.operators.temporal import time_weighted_avg

    t0 = dt.datetime(2024, 1, 1)

    def ts(sec):
        return t0 + dt.timedelta(seconds=sec)

    rows = [
        # u1: value 10 holds 10s, value 20 holds 20s → (100+400)/30
        (1, ts(0), 10, 10.0), (1, ts(10), 11, 20.0), (1, ts(30), 12, 0.0),
        # u2: single sample → no interval → dropped
        (2, ts(0), 20, 5.0),
        # u3: both samples at the same ts → span 0 → dropped
        (3, ts(0), 30, 1.0), (3, ts(0), 31, 2.0),
        # u4: tie at ts(0): id 40 pairs with the zero-width interval,
        # id 41 holds until ts(10) → twa = v(41) = 7.0 exactly
        (4, ts(0), 40, 3.0), (4, ts(0), 41, 7.0), (4, ts(10), 42, 9.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id LONG, ts TIMESTAMP, event_id LONG, value DOUBLE")
    out = {r.key: r for r in time_weighted_avg(df).collect()}
    assert set(out) == {1, 4}
    assert out[1].n_intervals == 2
    assert out[1].span_us == 30_000_000
    assert out[1].twa == round(500.0 / 30.0, 6)
    assert out[4].n_intervals == 2
    assert out[4].span_us == 10_000_000
    assert out[4].twa == 7.0


def test_rolling_zscore_semantics(spark):
    """Exclusive trailing frame: baseline = prior week's values, peers
    at the current instant excluded; degenerate baselines yield NULL."""
    import datetime as dt

    from gpu_bdb_spark.queries.registry import all_specs  # noqa: F401
    from pyspark.sql import functions as F

    t0 = dt.datetime(2024, 1, 10)

    def ts(h):
        return t0 + dt.timedelta(hours=h)

    rows = [
        (1, ts(0), 10, 10.0),   # no baseline → NULL
        (1, ts(1), 11, 12.0),   # n_prev=1 → NULL
        (1, ts(2), 12, 11.0),   # baseline {10, 12}: mean 11, sd sqrt(2)
        (1, ts(2), 13, 99.0),   # PEER of event 12 — excluded from its
                                # own baseline too: same {10, 12} base
    ]
    df = spark.createDataFrame(
        rows, "user_id LONG, ts TIMESTAMP, event_id LONG, value DOUBLE")
    w = (
        __import__("pyspark.sql.window", fromlist=["Window"]).Window
        .partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
        .rangeBetween(-604_800_000_000, -1)
    )
    v6 = F.col("value").cast("decimal(18,6)")
    n = F.count("value").over(w)
    sx = F.sum(v6).over(w).cast("double")
    sxx = F.sum(v6 * v6).over(w).cast("double")
    var = (sxx - sx * sx / n.cast("double")) / (n - 1).cast("double")
    z = F.when((n >= 2) & (var > 0),
               (F.col("value") - sx / n.cast("double")) / F.sqrt(var))
    out = {r.event_id: r.z for r in
           df.select("event_id", F.round(z, 6).alias("z")).collect()}
    assert out[10] is None and out[11] is None
    import math
    sd = math.sqrt(2.0)
    assert out[12] == round((11.0 - 11.0) / sd, 6) == 0.0
    assert out[13] == round((99.0 - 11.0) / sd, 6)


def test_windowed_pair_counts_strategies_agree(spark):
    """prefix (signed probes + incremental unbounded frame) ≡ frame
    (sliding trailing RANGE) ≡ materialized pair join, on a fixture
    built to hit every edge: a view exactly AT a purchase (excluded),
    at t−window (included, closed lower edge), at t−window−1 (just
    out), tied views, tied purchases, and a key with no pairs."""
    from pyspark.sql import functions as F

    from gpu_bdb_spark.operators.temporal import windowed_pair_counts

    W = 100  # micros
    rows = []

    def ev(key, us, typ):
        rows.append((key, typ, us))

    # key 1: boundary battery around purchase at t=1000
    ev(1, 1000, "purchase")
    ev(1, 1000, "view")      # tie with purchase -> NOT counted
    ev(1, 999, "view")       # in (strict upper edge)
    ev(1, 900, "view")       # in (closed lower edge: 1000-100)
    ev(1, 899, "view")       # out by one
    # key 2: tied purchases + tied views
    ev(2, 500, "purchase")
    ev(2, 500, "purchase")
    ev(2, 450, "view")
    ev(2, 450, "view")
    # key 3: views only (no output row)
    ev(3, 100, "view")
    ev(3, 200, "view")
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, us long"
    ).select("user_id", "event_type",
             F.timestamp_micros("us").alias("ts"))

    def run(strategy):
        out = windowed_pair_counts(
            df, "user_id", "ts",
            left_filter=F.col("event_type") == "view",
            right_filter=F.col("event_type") == "purchase",
            window_us=W, strategy=strategy)
        return {r["user_id"]: r["n_pairs"] for r in out.collect()}

    expect = {1: 2, 2: 4}
    assert run("prefix") == expect
    assert run("frame") == expect


def test_trailing_event_stats_equals_sliding_frame(spark):
    """Prefix-sum per-event trailing stats ≡ the sliding RANGE frame
    form, bit-for-bit on exact decimals, for BOTH edge conventions
    (inclusive = rolling_user_24h's [-W, 0]; exclusive =
    rolling_zscore's [-W, -1]) on a fixture with timestamp ties and
    events exactly W apart."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from gpu_bdb_spark.operators.temporal import trailing_event_stats

    W = 1000
    rows = []
    eid = 0
    for key, ts_list in [
        (1, [0, 500, 500, 1000, 1500, 1501, 2501]),   # ties + exact W
        (2, [100, 100, 100, 100]),                    # all tied
        (3, [5000]),                                  # singleton
    ]:
        for t in ts_list:
            eid += 1
            rows.append((eid, key, t, float(eid) * 1.25))
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, us long, value double")

    for include_current, hi in ((True, 0), (False, -1)):
        w = (Window.partitionBy("user_id").orderBy("us")
             .rangeBetween(-W, hi))
        v6 = F.col("value").cast("decimal(18,6)")
        frame = df.select(
            "event_id",
            F.count(F.lit(1)).over(w).alias("n_f"),
            F.sum(v6).over(w).alias("s_f"),
            F.sum((v6 * v6).cast("decimal(38,12)")).over(w).alias("s2_f"),
        )
        # exclusive frame with no preceding rows -> count 0, sums NULL;
        # the prefix form gates the signed diff on the non-null count,
        # so it emits NULL there too (SQL window-SUM semantics)
        prefix = trailing_event_stats(
            df, "user_id", "us", "event_id", "value", W,
            include_current=include_current)
        joined = frame.join(prefix, "event_id")
        bad = joined.filter(
            (F.col("n_f") != F.col("n"))
            | ~F.col("s_f").eqNullSafe(F.col("sum_v"))
            | ~F.col("s2_f").eqNullSafe(F.col("sum_v2"))).count()
        assert bad == 0, f"include_current={include_current}"
        assert joined.count() == len(rows)

def test_trailing_event_stats_params_match_frame(spark):
    """New trailing_event_stats parameters (round 5): count_nonnull
    (SQL COUNT(value) semantics), value_decimal quantization, payload
    carry-through, and a STRING id column (ADVICE r04: the probe-row
    placeholder must derive its type from the input, not assume long).
    Equivalence vs the sliding frame on a fixture WITH NULL values."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from gpu_bdb_spark.operators.temporal import trailing_event_stats

    W = 1000
    rows = []
    for i, (key, t, v) in enumerate([
        (1, 0, 1.2345), (1, 500, None), (1, 500, 2.5),
        (1, 1000, None), (1, 1600, 7.77), (2, 10, None), (2, 10, 3.0),
    ]):
        rows.append((f"e{i}", key, t, v, f"tag{i}"))
    df = spark.createDataFrame(
        rows, "eid string, user_id long, us long, value double, tag string")

    w = (Window.partitionBy("user_id").orderBy("us").rangeBetween(-W, 0))
    v4 = F.col("value").cast("decimal(12,4)")
    frame = df.select(
        "eid", "tag",
        F.count("value").over(w).alias("n_f"),
        F.sum(v4).over(w).alias("s_f"),
    )
    prefix = trailing_event_stats(
        df, "user_id", "us", "eid", "value", W,
        value_decimal="decimal(12,4)", count_nonnull=True,
        payload=("tag",))
    assert prefix.schema["eid"].dataType.typeName() == "string"
    joined = frame.withColumnRenamed("tag", "tag_f").join(prefix, "eid")
    bad = joined.filter(
        (F.col("n_f") != F.col("n"))
        | ~F.col("s_f").eqNullSafe(F.col("sum_v"))
        | (F.col("tag_f") != F.col("tag"))
        | (F.col("user_id").isNull())).count()
    assert bad == 0
    assert joined.count() == len(rows)


def test_trailing_event_stats_null_and_duplicate_ids(spark):
    """ADVICE r05: rows with NULL or duplicate id_col must yield one
    output row PER SOURCE EVENT (structural mii pairing), each with its
    own payload, matching the per-row SQL-window oracles; and all-NULL
    windows emit sum_v NULL (SQL SUM), not 0."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from gpu_bdb_spark.operators.temporal import trailing_event_stats

    W = 1000
    # user 1: duplicate id 7 at tied ts with DIFFERENT payloads + a NULL
    # id; user 2: all-NULL values (window SUM must be NULL, n counts rows)
    rows = [
        (7, 1, 100, 1.5, "a"),
        (7, 1, 100, 2.5, "b"),
        (None, 1, 600, 4.0, "c"),
        (9, 2, 50, None, "d"),
        (10, 2, 60, None, "e"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, us long, value double, "
              "tag string")
    out = trailing_event_stats(
        df, "user_id", "us", "event_id", "value", W,
        include_current=True, payload=("tag",)).collect()
    assert len(out) == len(rows)  # one row per source event
    by_tag = {r["tag"]: r for r in out}
    assert set(by_tag) == {"a", "b", "c", "d", "e"}
    # tied duplicates are RANGE peers: identical stats, own payload
    for t in ("a", "b"):
        assert by_tag[t]["event_id"] == 7
        assert by_tag[t]["n"] == 2
        assert float(by_tag[t]["sum_v"]) == 4.0
    assert by_tag["c"]["event_id"] is None
    assert by_tag["c"]["n"] == 3
    assert float(by_tag["c"]["sum_v"]) == 8.0
    # all-NULL window: n counts rows (count_nonnull=False), SUM is NULL
    assert by_tag["d"]["n"] == 1 and by_tag["d"]["sum_v"] is None
    assert by_tag["e"]["n"] == 2 and by_tag["e"]["sum_v"] is None
    assert by_tag["e"]["sum_v2"] is None


def test_trailing_event_stats_overflow_gate_is_post_cast(spark):
    """ADVICE r06: the NULL-sum gate must count non-NULL POST-CAST
    values — a frame whose raw values are all non-NULL but every one
    overflows value_decimal to NULL (non-ANSI) must emit sum_v NULL,
    exactly like SQL SUM(CAST(value AS decimal)); a mixed frame sums
    only the in-range values. Pinned against the sliding-frame SQL
    form on a deliberately too-narrow decimal(4,2)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from gpu_bdb_spark.operators.temporal import trailing_event_stats

    W = 1000
    # user 1: both values overflow decimal(4,2) (|v| > 99.99) — raw
    # non-NULL, so the old raw-column gate would emit sum_v = 0;
    # user 2: one overflow + one in-range -> sum of the in-range only.
    rows = [
        (1, 1, 100, 500.0), (2, 1, 200, 1234.5),
        (3, 2, 100, 500.0), (4, 2, 200, 7.25),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, us long, value double")
    out = trailing_event_stats(
        df, "user_id", "us", "event_id", "value", W,
        value_decimal="decimal(4,2)", sq_decimal="decimal(10,4)")
    w = Window.partitionBy("user_id").orderBy("us").rangeBetween(-W, 0)
    v = F.col("value").cast("decimal(4,2)")
    frame = df.select(
        "event_id",
        F.count(F.lit(1)).over(w).alias("n_f"),
        F.sum(v).over(w).alias("s_f"),
        F.sum((v * v).cast("decimal(10,4)")).over(w).alias("s2_f"),
    )
    joined = frame.join(out, "event_id")
    bad = joined.filter(
        (F.col("n_f") != F.col("n"))
        | ~F.col("s_f").eqNullSafe(F.col("sum_v"))
        | ~F.col("s2_f").eqNullSafe(F.col("sum_v2"))).count()
    assert bad == 0
    by_id = {r["event_id"]: r for r in out.collect()}
    assert by_id[2]["n"] == 2 and by_id[2]["sum_v"] is None
    assert by_id[4]["n"] == 2 and float(by_id[4]["sum_v"]) == 7.25

def test_m4_downsample_ignores_null_ts_and_id(spark, tmp_path):
    """ADVICE r04: NULL ts / event_id rows must pass the lpad-domain
    assert_true guard (they produce a NULL order key that min_by/max_by
    ignore) — only genuinely out-of-domain VALUES fail loudly."""
    from gpu_bdb_spark.queries.registry import all_specs

    df = spark.createDataFrame(
        [(1, "2024-01-01 00:10:00", 5, 1.0),
         (None, "2024-01-01 00:20:00", 5, 2.0),
         (2, None, 5, 3.0),
         (3, "2024-01-01 00:30:00", 5, 4.0)],
        "event_id long, ts string, user_id long, value double",
    ).select(F.col("event_id"), F.col("ts").cast("timestamp").alias("ts"),
             "user_id", "value",
             F.lit("view").alias("event_type"), F.lit("{}").alias("props"))
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = all_specs()["m4_downsample"].fn(spark, str(tmp_path)).collect()
    # NULL ts groups under a NULL bucket (pre-guard behavior); the
    # NULL-event_id row stays in the real bucket with a NULL order key
    # that min_by/max_by ignore
    assert len(out) == 2
    by_bucket = {r["bucket"] is None: r for r in out}
    main, nullb = by_bucket[False], by_bucket[True]
    assert main["n"] == 3
    assert main["v_first"] == 1.0 and main["v_last"] == 4.0
    assert main["v_min"] == 1.0 and main["v_max"] == 4.0
    assert nullb["n"] == 1 and nullb["v_first"] is None
