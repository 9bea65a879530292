"""Salting operators: equivalence to unsalted forms on skewed data, and
AQE skew-split engagement pinned by executed-plan inspection (SCALE.md's
skew claims as evidence, not prose)."""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import functions as F

from gpu_bdb_spark.io import read_table
from gpu_bdb_spark.operators.skew import salted_collect_set, salted_join


def skewed_events(spark, n_rows: int = 200_000, hot_share: float = 0.2,
                  n_users: int = 1000):
    """Deterministic skewed fact table: user 0 owns `hot_share` of all
    rows, the rest spread uniformly — the one-hot-user shape that breaks
    naive hash partitioning."""
    hot = F.pmod(F.xxhash64("id", F.lit("hot")), F.lit(1_000_000))
    return spark.range(n_rows).select(
        F.when(hot < int(hot_share * 1_000_000), F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id", F.lit("u")), F.lit(n_users)))
        .alias("user_id"),
        F.pmod(F.xxhash64("id", F.lit("v")), F.lit(50_000)).alias("value"),
        (F.col("id") % 97).alias("payload"),
    )


@contextmanager
def _confs(spark, **kv):
    old = {k: spark.conf.get(k, None) for k in kv}
    for k, v in kv.items():
        spark.conf.set(k, str(v))
    try:
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_aqe_skew_join_split_engages(spark):
    """A sort-merge join keyed on the hot user must be split by AQE
    (`isSkew=true` in the final plan). Thresholds are lowered to make the
    local 200k-row dataset look like a skewed 100 TB shuffle; the *plan
    reaction* is what transfers to cluster scale."""
    events = skewed_events(spark)
    users = spark.range(1000).select(
        F.col("id").alias("user_id"),
        F.concat(F.lit("name"), F.col("id")).alias("name"))
    with _confs(
        spark,
        **{
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes":
                "8KB",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
        },
    ):
        joined = events.join(users, "user_id").groupBy("name").agg(
            F.count(F.lit(1)).alias("n"))
        # collect() drives THIS DataFrame's QueryExecution, so the cached
        # executedPlan is the AQE-final one (a write would execute a fresh
        # QueryExecution and leave this plan isFinalPlan=false)
        assert len(joined.collect()) == 1000
        plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "isSkew=true" in plan or "skew=true" in plan, plan[:4000]


def test_salted_collect_set_on_hot_key(spark):
    """Equivalence under real 20%-hot-key skew: the salted two-phase
    collect_set returns exactly the naive operator's sets. (The perf side
    is recorded in SCALE.md: no reducer materializes the hot key's raw
    rows, only n_salts distinct-set shards.)"""
    events = skewed_events(spark, n_rows=100_000)
    naive = {
        r.user_id: frozenset(r.vals)
        for r in events.groupBy("user_id")
        .agg(F.collect_set("value").alias("vals")).collect()
    }
    salted = {
        r.user_id: frozenset(r["values"])
        for r in salted_collect_set(events, "user_id", "value", 8).collect()
    }
    assert naive == salted
    assert len(naive[0]) > 10_000  # the hot key really is hot


def test_salted_join_matches_plain_join(spark, sf_dir):
    l = read_table(spark, sf_dir, "lineitem",
                   ["l_orderkey", "l_partkey", "l_quantity"],
                   hint_broadcast=False)
    # skew: fold all orderkeys into 3 hot keys
    skewed = l.withColumn("hot_key", F.pmod("l_orderkey", F.lit(3)))
    dim = spark.createDataFrame(
        [(0, "zero"), (1, "one"), (2, "two")], ["hot_key", "label"])
    plain = (
        skewed.join(dim, "hot_key")
        .groupBy("label").agg(F.count(F.lit(1)).alias("n"),
                              F.sum("l_quantity").alias("q"))
    )
    salted = (
        salted_join(skewed, dim, ["hot_key"], n_salts=4)
        .groupBy("label").agg(F.count(F.lit(1)).alias("n"),
                              F.sum("l_quantity").alias("q"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect()))


def test_salted_collect_set_matches_plain(spark, sf_dir):
    l = read_table(spark, sf_dir, "lineitem", ["l_returnflag", "l_partkey"],
                   hint_broadcast=False)
    plain = {
        r.l_returnflag: frozenset(r.vals)
        for r in l.groupBy("l_returnflag")
        .agg(F.collect_set("l_partkey").alias("vals")).collect()
    }
    salted = {
        r.l_returnflag: frozenset(r["values"])
        for r in salted_collect_set(l, "l_returnflag", "l_partkey", 4).collect()
    }
    assert plain == salted


def test_auto_strategy_pickers_choose_right_arm(spark):
    """VERDICT r04 item 4: the data-driven strategy pickers must choose
    the skew-safe arm on a planted hot key and the cheap arm on uniform
    data — and the auto pair-count wrapper must return the same answer
    either way (both arms share one oracle)."""
    from gpu_bdb_spark.operators.skew import (key_skew_stats,
                                              pick_pair_count_strategy,
                                              pick_range_join_strategy,
                                              pick_simhash_strategy,
                                              windowed_pair_counts_auto)
    from gpu_bdb_spark.operators.temporal import windowed_pair_counts

    # planted hot key: user 7 packs 500 events inside one window span;
    # 50 other users get 5 events each
    hot = [(7, 1_000_000 + i * 10, "view" if i % 2 else "purchase")
           for i in range(500)]
    cold = [(u, 1_000_000 + i * 50_000_000, "view" if i % 2 else "purchase")
            for u in range(100, 150) for i in range(5)]
    df = spark.createDataFrame(
        hot + cold, "user_id long, us long, event_type string")

    stats_all = key_skew_stats(df, "user_id")
    assert stats_all["n_keys"] == 51
    assert stats_all["max_key_rows"] == 500
    # thresholds scaled to the fixture: hot arm
    assert pick_pair_count_strategy(
        stats_all, hot_key_rows=400, hot_skew=1e9) == "prefix"
    assert pick_pair_count_strategy(
        stats_all, hot_key_rows=10_000, hot_skew=30.0) == "prefix"
    # uniform data: cheap arm
    stats_cold = key_skew_stats(
        df.filter(F.col("user_id") != 7), "user_id")
    assert pick_pair_count_strategy(
        stats_cold, hot_key_rows=400, hot_skew=30.0) == "frame"

    # range-join / simhash pickers on the same diagnostics shape
    assert pick_range_join_strategy(
        stats_all, hot_cell_rows=400, hot_skew=1e9) == "salted"
    assert pick_range_join_strategy(
        stats_cold, hot_cell_rows=400, hot_skew=30.0) == "bucket"
    assert pick_simhash_strategy(stats_all, hot_bucket_rows=400) == "chunked"
    assert pick_simhash_strategy(stats_cold, hot_bucket_rows=400) == "plain"

    # the auto wrapper's answer equals BOTH explicit arms
    kw = dict(key_col="user_id", ts_col="us",
              left_filter=F.col("event_type") == "view",
              right_filter=F.col("event_type") == "purchase",
              window_us=1_000)
    want = sorted(map(tuple, windowed_pair_counts(
        df, strategy="prefix", **kw).collect()))
    assert sorted(map(tuple, windowed_pair_counts(
        df, strategy="frame", **kw).collect())) == want
    got_hot = sorted(map(tuple, windowed_pair_counts_auto(
        df, hot_key_rows=400, **kw).collect()))
    got_cold_arm = sorted(map(tuple, windowed_pair_counts_auto(
        df, hot_key_rows=10_000, hot_skew=1e9, **kw).collect()))
    assert got_hot == want
    assert got_cold_arm == want


def test_range_join_auto_picks_arm_and_matches(spark):
    """VERDICT r05 item 2: range_join_auto must pick salted on a
    planted hot (user, bucket) cell and bucket on uniform data, and
    both dispatches must return the bucketed arm's exact output."""
    from gpu_bdb_spark.operators.skew import range_join_auto
    from gpu_bdb_spark.operators.temporal import range_join

    # user 7: 300 points in ONE 1000-us bucket; 20 cold users spread
    pts = [(7, 100 + i) for i in range(300)]
    pts += [(u, 100 + i * 1000) for u in range(100, 120) for i in range(3)]
    points = spark.createDataFrame(pts, "user_id long, ts long")
    ivs = [(7, 0, 2000), (110, 500, 1500)]
    intervals = spark.createDataFrame(
        ivs, "user_id long, start long, end long")

    kw = dict(point_col="ts", start_col="start", end_col="end",
              by=("user_id",), bucket_width_s=1000)
    want = sorted(map(tuple, range_join(
        points, intervals, strategy="bucket", **kw).collect()))
    got_salted_arm = sorted(map(tuple, range_join_auto(
        points, intervals, hot_cell_rows=200, hot_skew=1e9,
        **kw).collect()))
    got_bucket_arm = sorted(map(tuple, range_join_auto(
        points, intervals, hot_cell_rows=10_000, hot_skew=1e9,
        **kw).collect()))
    assert got_salted_arm == want
    assert got_bucket_arm == want
    assert len(want) > 0


def test_simhash_pairs_auto_picks_arm_and_matches(spark):
    """VERDICT r05 item 2: simhash_pairs_auto must pick chunked on a
    planted hot pigeonhole bucket (all-identical fingerprints collide
    on every block) and plain on diverse ones; both arms emit the
    identical pair set."""
    from gpu_bdb_spark.operators.dedup import simhash_pairs
    from gpu_bdb_spark.operators.skew import simhash_pairs_auto

    # 60 ids share fingerprint 0xABCD (hot bucket: every block ties);
    # 40 ids get diverse fingerprints
    rows = [(i, 0xABCD) for i in range(60)]
    rows += [(100 + i, (i * 0x9E3779B97F4A7C15) & ((1 << 63) - 1))
             for i in range(40)]
    fp = spark.createDataFrame(rows, "id long, simhash long")

    want = sorted(map(tuple, simhash_pairs(
        fp, max_hamming=3, strategy="plain").collect()))
    assert sorted(map(tuple, simhash_pairs(
        fp, max_hamming=3, strategy="chunked").collect())) == want
    got_chunked_arm = sorted(map(tuple, simhash_pairs_auto(
        fp, max_hamming=3, hot_bucket_rows=50).collect()))
    got_plain_arm = sorted(map(tuple, simhash_pairs_auto(
        fp, max_hamming=3, hot_bucket_rows=10_000).collect()))
    assert got_chunked_arm == want
    assert got_plain_arm == want
    assert len(want) >= 60 * 59 // 2  # the hot clique is all pairs


def test_lsh_pair_work_router(spark):
    """VERDICT r05 item 1: lsh_verified_pairs_portable with a
    pair_work_budget must route to the prefix verify when the measured
    bucket pair-work exceeds the budget — and the routed output equals
    the LSH arm's on a fixture where LSH recall is exhaustive (J=1
    duplicates collide in every band)."""
    from gpu_bdb_spark.operators.dedup import lsh_verified_pairs_portable

    docs = []
    for i in range(30):
        toks = [f"w{i}_{j}" for j in range(12)]
        docs.append((2 * i, toks))
        docs.append((2 * i + 1, list(toks)))  # exact dup partner
    sets = spark.createDataFrame(
        docs, "id long, members array<string>").withColumn(
        "n_members", F.size("members").cast("long"))

    kw = dict(num_hashes=32, bands=16, threshold_num=19, threshold_den=20)
    want = sorted(map(tuple, lsh_verified_pairs_portable(
        sets, **kw).collect()))
    assert sorted((a, b) for a, b, _ in want) == sorted(
        (2 * i, 2 * i + 1) for i in range(30))
    # huge budget -> LSH arm; zero budget -> prefix arm; same answer
    got_lsh = sorted(map(tuple, lsh_verified_pairs_portable(
        sets, pair_work_budget=10**15, **kw).collect()))
    got_prefix = sorted(map(tuple, lsh_verified_pairs_portable(
        sets, pair_work_budget=0, **kw).collect()))
    assert got_lsh == want
    assert got_prefix == want


def test_key_skew_stats_null_and_empty(spark):
    from gpu_bdb_spark.operators.skew import key_skew_stats

    df = spark.createDataFrame(
        [(None, 1), (1, 2), (1, 3)], "k long, v long")
    s = key_skew_stats(df, "k")
    assert s["n_keys"] == 1 and s["total_rows"] == 2
    empty = key_skew_stats(df.filter(F.col("v") > 99), "k")
    assert empty["n_keys"] == 0 and empty["skew_factor"] == 1.0
