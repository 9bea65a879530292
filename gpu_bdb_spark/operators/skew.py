"""Skew mitigation — salting for hot keys.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime; explicit salting remains the tool when a single key dominates a
*non-join* shuffle (e.g. a grouped collect) or when AQE is unavailable
(streaming state, static plans). Salt values are deterministic (hash-based,
no RNG) so results are reproducible run to run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the left side salted and the right side replicated.

    Rows of a hot left key spread across `n_salts` reducers (salt =
    deterministic hash of the full left row); the right side is exploded
    ×n_salts so every salted partition finds its match. Use when the
    LEFT side is large and skewed on `on` and the right side is small
    enough to replicate but too big to broadcast.

    Cost: right side shuffle volume ×n_salts — the classic trade.
    """
    left_cols = [F.col(c) for c in left.columns]
    salted_left = left.withColumn(
        "_salt", F.pmod(F.xxhash64(*left_cols), F.lit(n_salts)).cast("int"))
    salts = F.array(*[F.lit(i) for i in range(n_salts)])
    salted_right = right.withColumn("_salt", F.explode(salts))
    return salted_left.join(salted_right, [*on, "_salt"], how).drop("_salt")


def salted_collect_set(
    df: DataFrame,
    key_col: str,
    value_col: str,
    n_salts: int = 8,
) -> DataFrame:
    """Two-phase collect_set for skewed keys: partial sets per (key, salt)
    shard, then a union-merge per key — no single reducer ever holds a hot
    key's full input, only its (much smaller) distinct set shards.

    Output: (key, values array<…> distinct, unsorted).
    """
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(value_col)), F.lit(n_salts)).cast("int"))
    partial = salted.groupBy(key_col, "_salt").agg(
        F.collect_set(value_col).alias("_part"))
    return partial.groupBy(key_col).agg(
        F.array_distinct(F.flatten(F.collect_list("_part"))).alias("values"))


def key_skew_stats(df: DataFrame, *key_cols: str) -> dict:
    """One-row skew diagnostics over an arbitrary (composite) key — the
    data-driven pre-flight behind the auto-`strategy=` pickers below
    (VERDICT r04 item 4: operators should pick the skew-safe plan from
    DATA, not from the caller). Two hash aggregates (per-key counts with
    map-side partials, then a single-row rollup) collected to the driver
    — the collect is ONE row, the same budget as a convergence
    signature. Keys with any NULL component are excluded (they don't
    co-locate in a shuffle anyway).

    Returns {n_keys, total_rows, max_key_rows, mean_key_rows,
    skew_factor} — skew_factor = max/mean, the `skew_report` entry's
    headline number."""
    cond = F.lit(True)
    for c in key_cols:
        cond = cond & F.col(c).isNotNull()
    row = (
        df.filter(cond)
        .groupBy(*[F.col(c) for c in key_cols])
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_keys"),
             F.sum("c").cast("long").alias("total_rows"),
             F.max("c").cast("long").alias("max_key_rows"))
        .collect()[0]
    )
    d = row.asDict()
    if not d["n_keys"]:
        d.update(total_rows=0, max_key_rows=0,
                 mean_key_rows=0.0, skew_factor=1.0)
        return d
    d["mean_key_rows"] = d["total_rows"] / d["n_keys"]
    d["skew_factor"] = d["max_key_rows"] / max(d["mean_key_rows"], 1e-12)
    return d


def pick_pair_count_strategy(
    stats: dict,
    hot_key_rows: int = 10_000,
    hot_skew: float = 100.0,
) -> str:
    """prefix vs frame for `windowed_pair_counts` /
    `trailing_event_stats`. The trailing-RANGE-frame form re-accumulates
    per slide — O(n · rows_in_frame) per key, measured 194× slower than
    prefix sums on a 200k-event packed hot key but slightly FASTER in
    the spread regime (4.6 s vs 6.0 s, SCALE.md hot-user probe) because
    it skips the probe-row union. So: any key big enough to pack a
    window (max_key_rows ≥ hot_key_rows), or max/mean skew ≥ hot_skew,
    → "prefix"; else "frame"."""
    if (stats["max_key_rows"] >= hot_key_rows
            or stats["skew_factor"] >= hot_skew):
        return "prefix"
    return "frame"


def pick_range_join_strategy(
    stats: dict,
    hot_cell_rows: int = 100_000,
    hot_skew: float = 100.0,
) -> str:
    """bucket vs salted for `range_join`. Compute `stats` on the POINT
    side keyed by (by..., bucket): salting spreads a hot cell across
    n_salts reducers at the cost of replicating the interval side
    ×n_salts, so it only pays when one cell dominates (measured
    equivalence output≡bucket pinned in test_temporal.py)."""
    if (stats["max_key_rows"] >= hot_cell_rows
            or stats["skew_factor"] >= hot_skew):
        return "salted"
    return "bucket"


def pick_simhash_strategy(
    stats: dict,
    hot_bucket_rows: int = 20_000,
) -> str:
    """plain vs chunked for `simhash_pairs`. Compute `stats` on the
    pigeonhole block key: the bucket self-join reuses one exchange on
    both sides, which DISABLES AQE's OptimizeSkewedJoin (SCALE.md
    "SimHash hot-bucket chunking", measured 25.4 → 13.2 s), so a hot
    bucket must be split at plan time — chunking pays only when a
    bucket is pathological."""
    return "chunked" if stats["max_key_rows"] >= hot_bucket_rows else "plain"


def windowed_pair_counts_auto(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    left_filter,
    right_filter,
    window_us: int,
    hot_key_rows: int = 10_000,
    hot_skew: float = 100.0,
) -> DataFrame:
    """`windowed_pair_counts` with the strategy picked from the data:
    one tiny diagnostic aggregate over the participating events chooses
    prefix (density-independent) vs frame (cheaper when no key can pack
    a window). Both arms are held to the same oracle, so the dispatch
    can never change the answer — only the plan shape."""
    from gpu_bdb_spark.operators.temporal import windowed_pair_counts

    stats = key_skew_stats(
        df.filter(left_filter | right_filter), key_col)
    strategy = pick_pair_count_strategy(stats, hot_key_rows, hot_skew)
    return windowed_pair_counts(
        df, key_col, ts_col, left_filter, right_filter, window_us,
        strategy=strategy)


def range_join_auto(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    by: tuple[str, ...] = (),
    bucket_width_s: int = 3600,
    n_salts: int = 8,
    hot_cell_rows: int = 100_000,
    hot_skew: float = 100.0,
) -> DataFrame:
    """`range_join` with bucket-vs-salted picked from the data (VERDICT
    r05 item 2): the diagnostic aggregate runs on the POINT side keyed
    by (by..., bucket) — exactly the equi-join key whose hot cell the
    salted arm exists to spread — so the dispatch reads the join's own
    skew, not a proxy. Both arms are output-equivalent (pinned in
    test_temporal.py), so the choice can only change the plan shape."""
    from gpu_bdb_spark.operators.temporal import _as_ordinal, range_join

    width = int(bucket_width_s) * (
        1_000_000 if dict(points.dtypes)[point_col].startswith("timestamp")
        else 1
    )
    p = points.withColumn(
        "_bkt", F.floor(_as_ordinal(points, point_col) / width))
    stats = key_skew_stats(p, *by, "_bkt")
    strategy = pick_range_join_strategy(stats, hot_cell_rows, hot_skew)
    return range_join(
        points, intervals, point_col=point_col, start_col=start_col,
        end_col=end_col, by=by, strategy=strategy,
        bucket_width_s=bucket_width_s, n_salts=n_salts)


def simhash_pairs_auto(
    fingerprints: DataFrame,
    max_hamming: int = 3,
    id_col: str = "id",
    sim_col: str = "simhash",
    hot_bucket_rows: int = 20_000,
    n_chunks: int = 16,
) -> DataFrame:
    """`simhash_pairs` with plain-vs-chunked picked from the data
    (VERDICT r05 item 2): the diagnostic runs on the pigeonhole block
    buckets themselves (`simhash_blocks` — the self-join key whose hot
    bucket AQE cannot split because the exchange is reused on both
    sides). Chunking replicates the right side ×n_chunks, so it engages
    only when a bucket is measured pathological; both arms emit the
    identical pair set (pinned in test_dedup.py)."""
    from gpu_bdb_spark.operators.dedup import simhash_blocks, simhash_pairs

    buckets = simhash_blocks(fingerprints, max_hamming, id_col, sim_col)
    stats = key_skew_stats(buckets, "blk", "val")
    strategy = pick_simhash_strategy(stats, hot_bucket_rows)
    return simhash_pairs(
        fingerprints, max_hamming, id_col, sim_col,
        strategy=strategy, n_chunks=n_chunks)
