"""Shared infrastructure for the TPCx-BB queries.

Replaces the reference's reader/config layer (bdb_tools/readers.py,
utils.py read_tables contract): a `Tables` accessor bound to a parquet
directory or injected DataFrames, plus the date helpers every query needs
(dates are stored as strings, SURVEY.md §1.2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from gpu_bdb_spark.schemas import ALL_TABLES, schema_for

#: Always-broadcast dimension tables — the Spark-native form of the
#: reference's SMALL_TABLES/SUPER_SMALL_TABLES single-partition placement
#: (readers.py:48-72, 129-134).
BROADCAST_DIMS = frozenset({
    "date_dim", "time_dim", "item", "store", "warehouse", "web_page",
    "web_site", "promotion", "reason", "ship_mode", "income_band",
    "household_demographics", "customer_demographics", "customer_address",
    "customer", "item_marketprices",
})


class Tables:
    """Table accessor: `tables("store_sales", cols)` returns a DataFrame.

    Bound to a data_dir (reference layout `{data_dir}/{table}/`) or to a
    dict of DataFrames (tests inject tiny fixtures). Column pruning mirrors
    the reference's `relevant_cols` (readers.py:108-127) — optional under
    Catalyst but keeps intent visible.
    """

    def __init__(
        self,
        spark: SparkSession,
        data_dir: str | None = None,
        frames: dict[str, DataFrame] | None = None,
    ):
        if (data_dir is None) == (frames is None):
            raise ValueError("provide exactly one of data_dir / frames")
        self.spark = spark
        self.data_dir = data_dir
        self.frames = frames

    def __call__(
        self,
        name: str,
        columns: list[str] | None = None,
        broadcast: bool | None = None,
    ) -> DataFrame:
        if name not in ALL_TABLES:
            raise KeyError(f"unknown TPCx-BB table {name!r}")
        if self.frames is not None:
            df = self.frames[name]
        else:
            df = self.spark.read.schema(schema_for(name)).parquet(
                f"{self.data_dir.rstrip('/')}/{name}"
            )
        if columns:
            df = df.select(*columns)
        if broadcast or (broadcast is None and name in BROADCAST_DIMS):
            df = F.broadcast(df)
        return df


def date_to_days(col: str | Column) -> Column:
    """'YYYY-MM-DD' string → epoch days int (reference
    convert_datestring_to_days, utils.py:943-954)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.datediff(F.to_date(c, "yyyy-MM-dd"), F.lit("1970-01-01").cast("date"))


def click_timestamp(date_sk: str | Column, time_sk: str | Column) -> Column:
    """Clickstream surrogate timestamp in seconds:
    date_sk·86400 + time_sk (reference q02:71-73, q03:49,66)."""
    d = F.col(date_sk) if isinstance(date_sk, str) else date_sk
    t = F.col(time_sk) if isinstance(time_sk, str) else time_sk
    return d * 86400 + t
