"""Statistical aggregation helpers — regression slope/intercept from exact
sufficient statistics.

The reference computes least-squares slope/intercept by aggregating
Σx, Σy, Σxy, Σxx per group and applying the closed form
(q15:102-134, q18:88-96). We keep that exact formulation — summing the
sufficient statistics in DECIMAL so the result is independent of partition
order and bit-identical to a SQL oracle running the same arithmetic —
rather than calling float-accumulating built-ins (F.regr_slope), whose
accumulation order differs across engines.

Decimal-width discipline: products must stay ≤ 38 digits of precision in
BOTH engines (past 38 DuckDB degrades to double, Spark rounds the scale),
so x is decimal(10,2) (epoch days ≪ 10^8) and y decimal(14,4) (money).
x·y → ≤ decimal(25,6), x² → ≤ decimal(21,4); their sums stay exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

XDEC = "decimal(10,2)"
YDEC = "decimal(14,4)"


def regression_sums(
    df: DataFrame, group_cols: list[str], x: Column, y: Column
) -> DataFrame:
    """Per-group exact sufficient statistics for simple linear regression.

    `x` must be integral (day numbers, sequence indexes); `y` must already
    be exact (an integer or a decimal — NOT a computed double, whose
    decimal-cast rounding could differ across engines).
    """
    xc = x.cast(XDEC)
    yc = y.cast(YDEC)
    agg = [
        F.count(F.lit(1)).alias("n"),
        F.sum(xc).alias("sx"),
        F.sum(yc).alias("sy"),
        F.sum(xc * yc).alias("sxy"),
        F.sum(xc * xc).alias("sxx"),
    ]
    return df.groupBy(*group_cols).agg(*agg) if group_cols else df.agg(*agg)


def slope_intercept(sums: DataFrame, round_to: int = 6) -> DataFrame:
    """Closed-form slope/intercept from `regression_sums` output
    (reference q15:116-134: slope=(n·Σxy−ΣxΣy)/(n·Σxx−(Σx)²)).

    The final division happens in double over exact decimal operands, so
    both engines divide identical numbers; output rounded to `round_to`.
    The intercept uses the unrounded slope (round only at the edge).
    """
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    return sums.withColumn("slope", F.round(slope, round_to)).withColumn(
        "intercept", F.round(intercept, round_to)
    )
