"""Mergeable frequency sketches. Count-min here; the HLL cardinality
tier lives in queries/advanced.py (approx_count_distinct).

The hash family is md5-derived (the repo's portable-RNG contract), so
unlike typical sketch implementations the ENTIRE data structure is
bit-reproducible in any engine with md5 — the DuckDB driver oracle
replays sketch construction and estimation exactly, turning the usual
"behavioral, error-bound" sketch check into an exact hash match. Only
the error ANALYSIS (ε = e/width, δ = e^-depth) stays probabilistic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucket(key, d: int, width: int):
    """Row d's bucket for a string key: md5('d:key') first 8 hex digits
    mod width — identical to DuckDB's
    CAST(concat('0x', substr(md5(...), 1, 8)) AS BIGINT) % width."""
    return F.pmod(
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.lit(str(d)), key)), 1, 8),
            16, 10).cast("long"),
        F.lit(int(width)),
    )


def cms_build(
    df: DataFrame,
    key,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Build a count-min sketch of the (string) key expression: a
    (d, b, c) frame of depth×width counters.

    Scale: the input expands ×depth (a handful of rows), then ONE hash
    aggregate with map-side partials collapses everything to ≤
    depth·width rows — constant size regardless of input cardinality.
    That bound is the point of the sketch: a heavy-hitter estimate over
    a key of unbounded cardinality (URLs, n-grams) with fixed memory,
    mergeable across shards/streams by counter addition.
    """
    rows = df.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(d).cast("int").alias("d"),
                    _bucket(key, d, width).alias("b"),
                )
                for d in range(int(depth))
            ])
        ).alias("cell")
    )
    return rows.select("cell.d", "cell.b").groupBy("d", "b").agg(
        F.count(F.lit(1)).alias("c"))


def cms_estimate(
    sketch: DataFrame,
    candidates: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-estimate counts for candidate keys from a built sketch:
    est(k) = min over rows d of counter[d][h_d(k)] (never an
    underestimate). The sketch is ≤ depth·width rows, so it broadcasts;
    candidates stream."""
    ch = candidates.select(F.col(key_col).alias("key")).select(
        "key",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(d).cast("int").alias("d"),
                    _bucket(F.col("key"), d, width).alias("b"),
                )
                for d in range(int(depth))
            ])
        ).alias("cell"),
    ).select("key", "cell.d", "cell.b")
    return (
        ch.join(F.broadcast(sketch), ["d", "b"])
        .groupBy("key")
        .agg(F.min("c").alias("est_cnt"))
    )
