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


#: dtype → profiling class for `column_profile`
_NUMERIC = ("int", "bigint", "smallint", "tinyint", "double", "float",
            "decimal")


def column_profile(df: DataFrame) -> DataFrame:
    """Per-column data-quality profile of a table: row count, null count,
    exact distinct count, plus min/max/avg for numeric columns and
    lexicographic min/max for strings — the dataset-card / preflight
    stats pass of a training pipeline.

    ONE scan, ONE global aggregate (all stats partial-aggregated
    map-side; the multi-countDistinct expands the input ×n_cols before
    the reduce — inherent to exact distincts, same trade as agg_stats),
    then an explode of a literal struct array unpivots the single result
    row into (col_name, …) rows. No per-column rescans.

    avg_num uses the decimal-sum ÷ count → double → round(6) discipline
    so the value is partition-order independent and cross-engine exact.
    """
    total = F.count(F.lit(1)).alias("_n")
    aggs, fields = [total], []
    for name, dtype in df.dtypes:
        base = dtype.split("(")[0]
        aggs.append(F.count(name).alias(f"{name}__nn"))
        aggs.append(F.countDistinct(name).alias(f"{name}__nd"))
        is_num = base in _NUMERIC
        if is_num:
            aggs.append(F.min(F.col(name).cast("double"))
                        .alias(f"{name}__mn"))
            aggs.append(F.max(F.col(name).cast("double"))
                        .alias(f"{name}__mx"))
            aggs.append(F.sum(F.col(name).cast("decimal(38,6)"))
                        .alias(f"{name}__sm"))
        elif base == "string":
            aggs.append(F.min(name).alias(f"{name}__mns"))
            aggs.append(F.max(name).alias(f"{name}__mxs"))
        fields.append((name, is_num, base == "string"))
    one = df.agg(*aggs)

    def null_d() -> Column:
        return F.lit(None).cast("double")

    def null_s() -> Column:
        return F.lit(None).cast("string")

    structs = []
    for name, is_num, is_str in fields:
        structs.append(F.struct(
            F.lit(name).alias("col_name"),
            F.col("_n").cast("long").alias("n_rows"),
            (F.col("_n") - F.col(f"{name}__nn")).cast("long")
            .alias("n_nulls"),
            F.col(f"{name}__nd").cast("long").alias("n_distinct"),
            (F.col(f"{name}__mn") if is_num else null_d())
            .alias("min_num"),
            (F.col(f"{name}__mx") if is_num else null_d())
            .alias("max_num"),
            (F.round(F.col(f"{name}__sm").cast("double")
                     / F.col(f"{name}__nn").cast("double"), 6)
             if is_num else null_d()).alias("avg_num"),
            (F.col(f"{name}__mns") if is_str else null_s())
            .alias("min_str"),
            (F.col(f"{name}__mxs") if is_str else null_s())
            .alias("max_str"),
        ))
    return one.select(
        F.explode(F.array(*structs)).alias("p")).select("p.*")


def interpolated_percentiles(
    df,
    value_col: str,
    quantiles: list,
    divisor: float = 1.0,
    n_name: str = "n",
):
    """ENGINE-OWNED exact interpolated percentiles over an INTEGER
    column — the cross-engine-safe replacement for pairing Spark
    `percentile` with DuckDB `quantile_cont`, whose interpolation
    differs at ulp level in IEEE op order (measured: Spark computes
    a·(1−f)+b·f-style mixes, DuckDB another order; a terminal
    round(…, 6) cannot repair a pre-round ulp when the true value
    ties — the conversion_lag lesson).

    `quantiles` = [(num, den, out_name), ...] with the 0-based
    position pos = (n−1)·num/den. Rank k and remainder come from
    integer arithmetic; the two order statistics are picked as exact
    integers by one conditional aggregate over a ranked frame; the
    single finishing chain (a + ((b−a)·rem)/den) / divisor is
    fixed-order IEEE both engines replay bit-for-bit (restate it
    verbatim in the oracle — no terminal round needed). Returns one
    row: (n_name, *out_names).

    The rank window is unpartitioned by construction (a global order
    statistic needs a total order), but it runs over the DISTINCT
    values with counts — a map-side-combined aggregate first — so the
    single-partition sort is bounded by value cardinality, never row
    cardinality (ADVICE r04): rank k+1 is picked from each distinct
    value's [cum−cnt+1, cum] run instead of per-row row_number.
    """
    from pyspark.sql import Window

    vals = df.filter(F.col(value_col).isNotNull())
    dist = vals.groupBy(F.col(value_col).alias("_v")).agg(
        F.count(F.lit(1)).cast("long").alias("_c"))
    cum = F.sum("_c").over(
        Window.orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    ranked = dist.select(
        "_v", (cum - F.col("_c") + 1).alias("_rlo"), cum.alias("_rhi"))
    totals = vals.agg(F.count(F.lit(1)).cast("long").alias(n_name))

    picks = []
    for num, den, name in quantiles:
        pos = (F.col(n_name) - 1) * num
        k = F.floor(pos / den).cast("long")
        picks += [
            F.min(F.when((F.col("_rlo") <= k + 1)
                         & (k + 1 <= F.col("_rhi")), F.col("_v")))
            .alias(f"_a_{name}"),
            F.min(F.when((F.col("_rlo") <= k + 2)
                         & (k + 2 <= F.col("_rhi")), F.col("_v")))
            .alias(f"_b_{name}"),
        ]
    picked = ranked.crossJoin(F.broadcast(totals)).agg(*picks)

    outs = [F.col(n_name)]
    for num, den, name in quantiles:
        rem = F.pmod((F.col(n_name) - 1) * num, F.lit(den))
        a = F.col(f"_a_{name}")
        b = F.coalesce(F.col(f"_b_{name}"), a)
        us = (a.cast("double")
              + ((b - a) * rem).cast("double") / F.lit(float(den)))
        outs.append((us / F.lit(float(divisor))).alias(name))
    return totals.crossJoin(picked).select(*outs)
