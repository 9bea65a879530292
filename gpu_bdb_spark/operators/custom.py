"""Custom grouped operators via applyInPandas — the governed escape hatch
(SURVEY.md §2.10: the reference's ~40 `map_partitions` uses collapse to
native expressions except where per-group imperative logic is genuinely
needed; this module is that seam, Arrow-batched).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def median_gap_per_user(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Exact median inter-event gap per user via applyInPandas.

    Exact grouped medians need the group's full gap list — a genuine
    per-group computation (Spark's native `percentile_approx` is the
    constant-memory alternative; `median`/`percentile` exact ones sort per
    group). Here the gaps are computed JVM-side with a lag window; only
    the median itself runs in pandas, one Arrow batch per user group.

    Output: (user_id, n_gaps long, median_gap_us double) — linear
    interpolation for even counts, matching DuckDB/NumPy `median`.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    gaps = (
        events.select(F.col(user_col).alias("user_id"),
                      (us - F.lag(us).over(w)).alias("gap_us"))
        .filter(F.col("gap_us").isNotNull())
    )

    # Self-contained closure: ships by value, no package import on workers.
    def agg_median(pdf):
        import pandas as _pd

        return _pd.DataFrame({
            "user_id": [pdf["user_id"].iloc[0]],
            "n_gaps": [len(pdf)],
            "median_gap_us": [float(pdf["gap_us"].median())],
        })

    return gaps.groupBy("user_id").applyInPandas(
        agg_median, "user_id long, n_gaps long, median_gap_us double")
