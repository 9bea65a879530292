"""Behavior-analytics operators: semantics on tiny hand frames, plan
shapes at scale-relevant points, and driver-registry wiring."""

from __future__ import annotations

import datetime as dt
import re

from gpu_bdb_spark.operators.behavior import (
    cohort_retention,
    decay_weights,
    decayed_engagement,
    transition_matrix,
)
from gpu_bdb_spark.plans import formatted_plan, has_broadcast_join


def _ts(day, hour=0):
    return dt.datetime(2024, 1, day, hour)


def test_cohort_retention_semantics(spark):
    # u1 first day 1 active days 1,3; u2 first day 1 only; u3 first day 3
    rows = [
        (1, _ts(1)), (1, _ts(1, 5)), (1, _ts(3)),
        (2, _ts(1, 2)),
        (3, _ts(3)),
    ]
    df = spark.createDataFrame(rows, "user_id LONG, ts TIMESTAMP")
    out = cohort_retention(df, period_us=86_400_000_000)
    got = {(r.cohort_period, r.period_offset):
           (r.n_active, r.cohort_size, r.retention_rate)
           for r in out.collect()}
    d1 = (dt.datetime(2024, 1, 1) - dt.datetime(1970, 1, 1)).days
    assert got[(d1, 0)] == (2, 2, 1.0)
    assert got[(d1, 2)] == (1, 2, 0.5)
    assert got[(d1 + 2, 0)] == (1, 1, 1.0)
    assert len(got) == 3


def test_transition_matrix_semantics(spark):
    rows = [
        (1, _ts(1, 1), 10, "view"),
        (1, _ts(1, 2), 11, "click"),
        (1, _ts(1, 3), 12, "click"),
        (2, _ts(1, 1), 20, "view"),
        (2, _ts(1, 2), 21, "click"),
        # same-ts tie broken by event_id: 31 then 32
        (3, _ts(1, 1), 31, "signup"),
        (3, _ts(1, 1), 32, "view"),
    ]
    df = spark.createDataFrame(
        rows, "user_id LONG, ts TIMESTAMP, event_id LONG, event_type STRING")
    got = {(r.from_type, r.to_type): (r.n_transitions, r.n_from_total,
                                      r.p_transition)
           for r in transition_matrix(df).collect()}
    assert got[("view", "click")] == (2, 2, 1.0)
    assert got[("click", "click")] == (1, 1, 1.0)
    assert got[("signup", "view")] == (1, 1, 1.0)
    assert len(got) == 3


def test_decay_weights_monotone_and_formatted():
    w = decay_weights(28, 14.0)
    assert w[0] == (0, "1.000000000")
    assert w[14][1] == f"{0.5:.9f}"
    vals = [float(x) for _, x in w]
    assert all(a >= b for a, b in zip(vals, vals[1:]))


def test_decayed_engagement_exact_small(spark):
    rows = [(1, _ts(1), 10.0), (1, _ts(15), 10.0), (2, _ts(15), 4.0)]
    df = spark.createDataFrame(rows, "user_id LONG, ts TIMESTAMP, value DOUBLE")
    out = decayed_engagement(spark, df, "2024-01-15", half_life_days=14.0,
                             max_age_days=90)
    got = {r.user_id: (r.n_events, r.decayed_score) for r in out.collect()}
    # age 14 weight = 0.5 exactly at half-life; age 0 weight 1.0
    assert got[1] == (2, 15.0)
    assert got[2] == (1, 4.0)


def test_cohort_plan_no_join_and_dedup_before_window(spark, sf_dir):
    from gpu_bdb_spark.io import read_table

    e = read_table(spark, sf_dir, "events", ["user_id", "ts"],
                   hint_broadcast=False)
    plan = formatted_plan(cohort_retention(e, period_us=86_400_000_000))
    assert "Join" not in plan, "cohort derivation must not join the fact table"
    # the deduping aggregate must appear before (below) the user window
    assert "HashAggregate" in plan and "Window" in plan


def test_decayed_engagement_broadcasts_dim(spark, sf_dir):
    from gpu_bdb_spark.io import read_table

    e = read_table(spark, sf_dir, "events", ["user_id", "ts", "value"],
                   hint_broadcast=False)
    plan = formatted_plan(decayed_engagement(spark, e, "2024-03-01"))
    assert has_broadcast_join(plan), "age dimension must broadcast"
    # exactly one broadcast node (the age dim); details headers count once
    assert len(re.findall(r"\(\d+\) BroadcastExchange", plan)) == 1


def test_registry_has_behavior_entries():
    from gpu_bdb_spark.queries.registry import all_specs, oracle_sql

    specs = all_specs()
    for name in ("cohort_retention", "event_transitions",
                 "decayed_engagement"):
        assert name in specs
        assert oracle_sql()[name]


def test_ab_test_conversion_semantics(spark):
    import hashlib
    import math

    from gpu_bdb_spark.operators.behavior import ab_test_conversion

    rows = []
    for u in range(40):
        rows.append((u, "view"))
        if u % 3 == 0:
            rows.append((u, "purchase"))
    df = spark.createDataFrame(rows, "user_id LONG, event_type STRING")
    r = ab_test_conversion(df).collect()[0]

    def arm(u):
        h = int(hashlib.md5(f"ab1:{u}".encode()).hexdigest()[:8], 16)
        return "A" if h % 2 == 0 else "B"

    n = {"A": 0, "B": 0}
    conv = {"A": 0, "B": 0}
    for u in range(40):
        a = arm(u)
        n[a] += 1
        conv[a] += 1 if u % 3 == 0 else 0
    assert (r.n_a, r.conv_a, r.n_b, r.conv_b) == (
        n["A"], conv["A"], n["B"], conv["B"])
    pa, pb = conv["A"] / n["A"], conv["B"] / n["B"]
    pp = (conv["A"] + conv["B"]) / (n["A"] + n["B"])
    z = (pa - pb) / math.sqrt(
        pp * (1.0 - pp) * (1.0 / n["A"] + 1.0 / n["B"]))
    assert r.z_score == round(z, 6)


def test_ab_test_degenerate_split_nulls_z(spark):
    """Pooled rate 1 (every user converts) makes se = 0: the z-score
    must deterministically NULL instead of emitting engine-variant
    Inf/NaN — the same CASE is mirrored in the DuckDB oracle."""
    from gpu_bdb_spark.operators.behavior import ab_test_conversion

    rows = [(u, "purchase") for u in range(20)]
    df = spark.createDataFrame(rows, "user_id LONG, event_type STRING")
    r = ab_test_conversion(df).collect()[0]
    assert r.rate_a == 1.0 and r.rate_b == 1.0
    assert r.z_score is None


def test_delete_keys_parquet_roundtrip(spark, tmp_path):
    from gpu_bdb_spark.sources import delete_keys_parquet

    base = spark.createDataFrame(
        [(i, f"v{i}") for i in range(20)], "k LONG, v STRING")
    base.write.mode("overwrite").parquet(str(tmp_path / "base"))
    dels = spark.createDataFrame([(i,) for i in range(0, 20, 4)], "k LONG")
    out = delete_keys_parquet(spark, str(tmp_path / "base"), dels, "k",
                              str(tmp_path / "out"))
    got = sorted(r.k for r in out.collect())
    assert got == [i for i in range(20) if i % 4 != 0]


def test_user_360_single_shuffle_and_null_funnel(spark, sf_dir):
    import re

    from gpu_bdb_spark.plans import formatted_plan
    from gpu_bdb_spark.queries.registry import all_specs

    df = all_specs()["user_360"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    # one broadcast (the weight dim) + ONE shuffle exchange (user agg)
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan
    assert "BroadcastHashJoin" in plan

    # the funnel flag is always 0/1 — never NULL for users missing a step
    out = df.toPandas()
    assert out["viewed_then_purchased"].isin([0, 1]).all()
    assert not out["viewed_then_purchased"].isna().any()


def test_rfm_segments_semantics(spark):
    """8 customers, quartiles of 2: scores follow the (metric desc,
    cust) total order; monetary is the exact decimal sum."""
    from gpu_bdb_spark.operators.behavior import rfm_segments

    rows = []
    for c in range(1, 9):
        # customer c: c orders, each 100*c, last order on day c
        for k in range(c):
            rows.append((c, dt.datetime(2024, 1, c), 100.0 * c))
    df = spark.createDataFrame(
        rows, "o_custkey LONG, o_orderdate TIMESTAMP, o_totalprice DOUBLE")
    out = {r.cust: r for r in rfm_segments(df).collect()}
    assert len(out) == 8
    # all three metrics rank customers 8,7,...,1 best-to-worst
    for c in range(1, 9):
        tile = (8 - c) // 2 + 1
        assert out[c].r_score == tile
        assert out[c].f_score == tile
        assert out[c].m_score == tile
        assert out[c].segment == tile * 111
        assert out[c].frequency == c
        assert out[c].monetary == round(100.0 * c * c, 2)


def test_frequent_sequences_semantics(spark):
    """Greedy subsequence existence: gaps allowed, order enforced,
    same-ts ties broken by event id."""
    from gpu_bdb_spark.operators.behavior import frequent_sequences

    rows = [
        # u1: A x B y C  → supports (A,B,C) with gaps
        (1, _ts(1, 1), 10, "A"), (1, _ts(1, 2), 11, "x"),
        (1, _ts(1, 3), 12, "B"), (1, _ts(1, 4), 13, "y"),
        (1, _ts(1, 5), 14, "C"),
        # u2: C B A → no (A,B,C); does support (C,B,A)
        (2, _ts(1, 1), 20, "C"), (2, _ts(1, 2), 21, "B"),
        (2, _ts(1, 3), 22, "A"),
        # u3: A then B,C at the SAME ts — ids order B(31) before C(32),
        # so (A,B,C) holds but (A,C,B) does not
        (3, _ts(1, 1), 30, "A"), (3, _ts(1, 2), 31, "B"),
        (3, _ts(1, 2), 32, "C"),
    ]
    df = spark.createDataFrame(
        rows, "user_id LONG, ts TIMESTAMP, event_id LONG, event_type STRING")
    got = {(r.t1, r.t2, r.t3): r.n_users
           for r in frequent_sequences(df).collect()}
    assert got[("A", "B", "C")] == 2      # u1 and u3
    assert ("A", "C", "B") not in got
    assert got[("C", "B", "A")] == 1      # u2 only
    assert got[("A", "x", "B")] == 1      # u1, non-adjacent allowed


def test_session_paths_semantics(spark):
    """Two users sharing an opening path, a short session, and a
    session split by the timeout gap."""
    from gpu_bdb_spark.operators.sessionize import session_paths

    rows = [
        # u1 session 1: view > click > purchase (plus a 4th event,
        # ignored at depth 3)
        (1, _ts(1, 1), 10, "view"), (1, _ts(1, 1), 11, "click"),
        (1, _ts(1, 2), 12, "purchase"), (1, _ts(1, 3), 13, "error"),
        # u1 session 2 after a >1h gap: single-event path
        (1, _ts(2, 9), 14, "view"),
        # u2: same opening path as u1 session 1
        (2, _ts(1, 1), 20, "view"), (2, _ts(1, 1), 21, "click"),
        (2, _ts(1, 2), 22, "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "user_id LONG, ts TIMESTAMP, event_id LONG, event_type STRING")
    got = {(r.path, r.depth): r.n_sessions
           for r in session_paths(df, timeout_s=3600).collect()}
    assert got == {("view>click>purchase", 3): 2, ("view", 1): 1}


def test_conversion_lag_semantics(spark):
    """Purchase BEFORE the first view does not convert; the first
    purchase strictly after it does; never-viewing users are excluded
    from the denominator."""
    from gpu_bdb_spark.operators.behavior import conversion_lag

    rows = [
        # u1: purchase at t-1h, first view at t, purchase at t+30s
        (1, _ts(1, 1), 10, "purchase"), (1, _ts(1, 2), 11, "view"),
        (1, _ts(1, 2) + dt.timedelta(seconds=30), 12, "purchase"),
        # u2: view only
        (2, _ts(1, 1), 20, "view"),
        # u3: purchase only (no view → not in denominator)
        (3, _ts(1, 1), 30, "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "user_id LONG, ts TIMESTAMP, event_id LONG, event_type STRING")
    r = conversion_lag(df).first()
    assert r.n_users_from == 2
    assert r.n_converted == 1
    assert r.conversion_rate == 0.5
    assert r.p50_lag_s == 30.0


def test_new_vs_returning_semantics(spark):
    from gpu_bdb_spark.operators.behavior import new_vs_returning

    rows = [
        (1, _ts(1)), (1, _ts(1, 5)),   # u1 new on day1 (dedup within day)
        (1, _ts(3)),                    # u1 returning on day3
        (2, _ts(3)),                    # u2 new on day3
    ]
    df = spark.createDataFrame(rows, "user_id LONG, ts TIMESTAMP")
    got = {r.period: (r.n_active, r.n_new, r.n_returning)
           for r in new_vs_returning(df).collect()}
    d1 = (dt.datetime(2024, 1, 1) - dt.datetime(1970, 1, 1)).days
    assert got[d1] == (1, 1, 0)
    assert got[d1 + 2] == (2, 1, 1)
