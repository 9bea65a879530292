"""Distributed deterministic TPCx-BB data generator.

The reference relies on the TPC kit's external dataGen plus a CSV→Parquet
load test (load_test/gpu_bdb_load_test.py). This module generates the
tables directly in Spark: every table is `spark.range(n)` + pure column
expressions, with all "randomness" derived from xxhash64 of the row id —
so generation is embarrassingly parallel, repeatable at any scale factor,
and produces identical rows regardless of partitioning. No driver-side
data, no Python RNG: an SF1000 table generates exactly like SF0.01, just
with more partitions.

Foreign-key consistency without joins: child tables (returns) re-derive
their parent rows by filtering the SAME deterministic generator output, so
(ticket, item, customer) triples always exist in the parent.

Covers the tables the 30 queries touch; dimension domains follow
FIXTURES.md §A (states/categories/education values, sk 37134 = 2001-09-02
date alignment, target items 10000/10001/10002). Sales/review dates span
the full 1461-day date_dim range and fact item FKs cover the special SKs,
so every query's default window sees data. Density caveats at small SF:
q07's HAVING ≥10-customers threshold needs SF≥1, and q19's cross-channel
coincidence (same item returned in store AND web inside 4 specific weeks
with sums within 10%) needs SF≥~10 — below that they are correctly empty;
pass `params` overrides to the runner to hit smaller datasets.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

SK_OFFSET = 25567  # d_date_sk = epoch_days + SK_OFFSET (fixture convention)
DAY0 = (dt.date(2001, 1, 1) - dt.date(1970, 1, 1)).days
N_DAYS = 1461  # 2001-01-01 .. 2004-12-31

CATEGORIES = ("Books", "Electronics", "Music", "Home", "Sports", "Toys",
              "Shoes")
STATES = ("KY", "GA", "NM", "MT", "OR", "IN", "WI", "MO", "WV", "CA")
EDUCATION = ("4 yr Degree", "College", "Advanced Degree", "2 yr Degree",
             "Unknown")
WP_TYPES = ("order", "dynamic", "review", "general", "feedback", "protected")
SPECIAL_ITEMS = (10000, 10001, 10002)


def _u(salt: str) -> Column:
    """Deterministic uniform [0, 1) from the row id (column `id`)."""
    return (
        F.pmod(F.xxhash64(F.col("id"), F.lit(salt)), F.lit(1_000_000))
        .cast("double") / 1_000_000.0
    )


def _pick(salt: str, values: tuple) -> Column:
    """Deterministic choice from a literal list."""
    arr = F.array(*[F.lit(v) for v in values])
    idx = F.pmod(F.xxhash64(F.col("id"), F.lit(salt)), F.lit(len(values)))
    return F.element_at(arr, (idx + 1).cast("int"))


def _item_sk(salt: str, n_item: int, boost: float = 0.0) -> Column:
    """Deterministic fact-table item FK over the item table's real SK
    domain {10000,10001,10002} ∪ [3, n_item): raw draws 0-2 map onto the
    special SKs (the item table replaces i_item_sk 0-2 with 10000-10002,
    so bare 0-2 would be dangling). With `boost`, an extra deterministic
    slice of rows lands on the specials so targeted queries (q02/q24/q30
    default item_sk 10000/10001) see a workable number of sales."""
    raw = F.pmod(F.xxhash64(F.col("id"), F.lit(salt)), F.lit(n_item))
    mapped = F.when(raw < 3, raw + 10000).otherwise(raw)
    if boost:
        special = 10000 + F.pmod(F.xxhash64(F.col("id"), F.lit(salt + "#")),
                                 F.lit(3))
        return F.when(_u(salt + "boost") < boost, special).otherwise(mapped)
    return mapped


def _sizes(sf: float) -> dict[str, int]:
    return {
        "item": 200 + int(180 * sf),
        "customer": 100 + int(100 * sf),
        "store_sales": max(1000, int(30_000 * sf)),
        "web_sales": max(1000, int(30_000 * sf)),
        "web_clickstreams": max(2000, int(100_000 * sf)),
        "inventory": max(500, int(12_000 * sf)),
        "product_reviews": max(100, int(300 * sf)),
    }


def generate_table(spark: SparkSession, name: str, sf: float = 1.0,
                   partitions: int | None = None) -> DataFrame:
    """Generate one table at scale factor `sf` (SF1 ≈ reference row
    densities per FIXTURES.md §A). Output columns are the subset the 30
    queries read; schemas are compatible with `schemas.schema_for` columns
    used by the query set."""
    sizes = _sizes(sf)
    n_item = sizes["item"]
    n_cust = sizes["customer"]

    def ranged(n):
        r = spark.range(n)
        if partitions:
            r = r.repartition(partitions)
        return r

    if name == "date_dim":
        d = ranged(N_DAYS).withColumn(
            "date", F.date_add(F.lit("2001-01-01").cast("date"),
                               F.col("id").cast("int")))
        return d.select(
            (F.col("id") + DAY0 + SK_OFFSET).alias("d_date_sk"),
            F.col("date").cast("string").alias("d_date"),
            ((F.col("id") + DAY0 + SK_OFFSET) / 7).cast("int")
            .alias("d_week_seq"),
            F.year("date").alias("d_year"),
            F.month("date").alias("d_moy"),
            F.dayofmonth("date").alias("d_dom"),
        )

    if name == "time_dim":
        return ranged(24).select(
            F.col("id").alias("t_time_sk"),
            F.col("id").cast("int").alias("t_hour"),
            F.when(F.col("id") < 12, "AM").otherwise("PM").alias("t_am_pm"),
        )

    if name == "item":
        base = ranged(n_item)
        cat_id = F.when(_u("catnull") < 0.02, None).otherwise(
            F.pmod(F.col("id"), F.lit(7)).cast("int") + 1)
        return base.select(
            F.when(F.col("id") < len(SPECIAL_ITEMS),
                   F.element_at(F.array(*[F.lit(s) for s in SPECIAL_ITEMS]),
                                (F.col("id") + 1).cast("int")))
            .otherwise(F.col("id")).alias("i_item_sk"),
            F.format_string("ITEM%06d", F.col("id").cast("int"))
            .alias("i_item_id"),
            F.concat(F.lit("desc of item "), F.col("id")).alias("i_item_desc"),
            F.round(F.lit(1.0) + _u("price") * 4.0, 2).cast("decimal(7,2)")
            .alias("i_current_price"),
            cat_id.alias("i_category_id"),
            F.element_at(F.array(*[F.lit(c) for c in CATEGORIES]),
                         F.coalesce(cat_id, F.lit(1)).cast("int"))
            .alias("i_category"),
            (F.pmod(F.col("id"), F.lit(15)).cast("int") + 1).alias("i_class_id"),
        )

    if name == "customer":
        return ranged(n_cust).select(
            (F.col("id") + 1).alias("c_customer_sk"),
            F.format_string("C%06d", F.col("id").cast("int") + 1)
            .alias("c_customer_id"),
            (F.pmod(F.col("id"), F.lit(24)) + 1).alias("c_current_cdemo_sk"),
            (F.pmod(F.col("id"), F.lit(10)) + 1).alias("c_current_hdemo_sk"),
            (F.pmod(F.col("id"), F.lit(30)) + 1).alias("c_current_addr_sk"),
            F.concat(F.lit("fn"), F.col("id")).alias("c_first_name"),
            F.concat(F.lit("ln"), F.col("id")).alias("c_last_name"),
            # descriptive columns q06 selects (reference q06:43-202)
            F.when(F.pmod(F.col("id"), F.lit(3)) == 0, "Y").otherwise("N")
            .alias("c_preferred_cust_flag"),
            _pick("bc", ("UNITED STATES", "CANADA", "GERMANY", "JAPAN",
                         "BRAZIL")).alias("c_birth_country"),
            F.format_string("login%06d", F.col("id").cast("int"))
            .alias("c_login"),
            F.format_string("c%06d@example.com", F.col("id").cast("int"))
            .alias("c_email_address"),
        )

    if name == "store_sales":
        n = sizes["store_sales"]
        ticket = (F.col("id") / 4).cast("long")
        price = F.round(F.lit(20.0) + _u("sp") * 160.0, 2)
        # full 1461-day date_dim span so 2003/2004-window queries
        # (q07/q21) see sales
        day = (F.pmod(F.xxhash64(ticket, F.lit("ssday")), F.lit(N_DAYS))
               + DAY0 + SK_OFFSET)
        return ranged(n).select(
            day.alias("ss_sold_date_sk"),
            F.pmod(F.col("id"), F.lit(24)).alias("ss_sold_time_sk"),
            _item_sk("ssitem", n_item, boost=0.04).alias("ss_item_sk"),
            (F.pmod(F.xxhash64(ticket, F.lit("sscust")), F.lit(n_cust)) + 1)
            .alias("ss_customer_sk"),
            (F.pmod(F.xxhash64(ticket, F.lit("sscust")), F.lit(24)) + 1)
            .alias("ss_cdemo_sk"),
            (F.pmod(F.xxhash64(ticket, F.lit("sscust")), F.lit(30)) + 1)
            .alias("ss_addr_sk"),
            _pick("ssstore", (10, 20, 33, 40, 50, 60)).alias("ss_store_sk"),
            F.when(_u("promo") < 0.8,
                   F.pmod(F.col("id"), F.lit(8)) + 1).alias("ss_promo_sk"),
            ticket.alias("ss_ticket_number"),
            (F.pmod(F.col("id"), F.lit(10)).cast("int") + 1)
            .alias("ss_quantity"),
            price.cast("decimal(7,2)").alias("ss_sales_price"),
            price.cast("decimal(7,2)").alias("ss_net_paid"),
            price.cast("decimal(7,2)").alias("ss_ext_sales_price"),
            F.round(price * 1.2, 2).cast("decimal(7,2)")
            .alias("ss_ext_list_price"),
            F.round(price * 0.7, 2).cast("decimal(7,2)")
            .alias("ss_ext_wholesale_cost"),
            F.round(price * 0.1, 2).cast("decimal(7,2)")
            .alias("ss_ext_discount_amt"),
            F.round(_u("profit") * 2550.0 - 50.0, 2).cast("decimal(7,2)")
            .alias("ss_net_profit"),
        )

    if name == "store_returns":
        # deterministic subset of store_sales — FK triples always exist
        ss = generate_table(spark, "store_sales", sf, partitions)
        keep = F.pmod(F.xxhash64("ss_ticket_number", "ss_item_sk",
                                 F.lit("sret")), F.lit(10)) == 0
        return ss.filter(keep).select(
            F.least(
                F.col("ss_sold_date_sk")
                + F.pmod(F.xxhash64("ss_ticket_number", F.lit("rdelta")),
                         F.lit(140)) + 10,
                F.lit(DAY0 + SK_OFFSET + N_DAYS - 1),
            ).alias("sr_returned_date_sk"),
            F.col("ss_item_sk").alias("sr_item_sk"),
            F.col("ss_customer_sk").alias("sr_customer_sk"),
            F.col("ss_ticket_number").alias("sr_ticket_number"),
            (F.pmod(F.xxhash64("ss_item_sk", F.lit("rq")), F.lit(4))
             .cast("int") + 1).alias("sr_return_quantity"),
            F.round(F.col("ss_net_paid") * 0.5, 2).cast("decimal(7,2)")
            .alias("sr_return_amt"),
            F.col("ss_store_sk").alias("sr_store_sk"),
        )

    if name == "web_sales":
        n = sizes["web_sales"]
        order = (F.col("id") / 3).cast("long")
        price = F.round(F.lit(15.0) + _u("wp") * 145.0, 2)
        # full span: q11 (2003-01) and q19 (2004 return weeks) need
        # sales beyond 2002
        day = (F.pmod(F.xxhash64(order, F.lit("wsday")), F.lit(N_DAYS))
               + DAY0 + SK_OFFSET)
        return ranged(n).select(
            day.alias("ws_sold_date_sk"),
            _pick("wst", (7, 8, 19, 20, 12)).alias("ws_sold_time_sk"),
            _item_sk("wsitem", n_item, boost=0.04).alias("ws_item_sk"),
            (F.pmod(F.xxhash64(order, F.lit("wscust")), F.lit(n_cust)) + 1)
            .alias("ws_bill_customer_sk"),
            (F.pmod(F.xxhash64(order, F.lit("wscust")), F.lit(10)) + 1)
            .alias("ws_ship_hdemo_sk"),
            (F.pmod(F.col("id"), F.lit(12)) + 1).alias("ws_web_page_sk"),
            (F.pmod(F.col("id"), F.lit(3)) + 1).alias("ws_warehouse_sk"),
            order.alias("ws_order_number"),
            (F.pmod(F.col("id"), F.lit(8)).cast("int") + 1)
            .alias("ws_quantity"),
            price.cast("decimal(7,2)").alias("ws_sales_price"),
            price.cast("decimal(7,2)").alias("ws_net_paid"),
            F.round(price * 1.2, 2).cast("decimal(7,2)")
            .alias("ws_ext_list_price"),
            F.round(price * 0.7, 2).cast("decimal(7,2)")
            .alias("ws_ext_wholesale_cost"),
            F.round(price * 0.1, 2).cast("decimal(7,2)")
            .alias("ws_ext_discount_amt"),
            price.cast("decimal(7,2)").alias("ws_ext_sales_price"),
        )

    if name == "web_returns":
        ws = generate_table(spark, "web_sales", sf, partitions)
        keep = F.pmod(F.xxhash64("ws_order_number", "ws_item_sk",
                                 F.lit("wret")), F.lit(10)) == 0
        return ws.filter(keep).select(
            F.least(
                F.col("ws_sold_date_sk")
                + F.pmod(F.xxhash64("ws_order_number", F.lit("wdelta")),
                         F.lit(55)) + 5,
                F.lit(DAY0 + SK_OFFSET + N_DAYS - 1),
            ).alias("wr_returned_date_sk"),
            F.col("ws_item_sk").alias("wr_item_sk"),
            F.col("ws_order_number").alias("wr_order_number"),
            (F.pmod(F.xxhash64("ws_item_sk", F.lit("wq")), F.lit(4))
             .cast("int") + 1).alias("wr_return_quantity"),
            F.when(_u_over("ws_order_number", "wrc") < 0.7,
                   F.round(F.col("ws_net_paid") * 0.4, 2))
            .cast("decimal(7,2)").alias("wr_refunded_cash"),
        )

    if name == "web_clickstreams":
        n = sizes["web_clickstreams"]
        user = (F.pmod((F.col("id") / 50).cast("long"), F.lit(n_cust)) + 1)
        pos = F.pmod(F.col("id"), F.lit(50))  # position within the burst
        # one year from 2001-09-02: inside q08's default window, with the
        # first 30 days covering q12's click_start_sk=37134 window and
        # store sales extending past it for the ≤90-day theta join
        day = (F.pmod(F.xxhash64(user, F.lit("wcday")), F.lit(365))
               + DAY0 + 244 + SK_OFFSET)
        # two sub-bursts > 1 h apart; clicks 1 min apart inside a burst
        tod = (F.lit(1000) + pos * 60
               + F.when(pos >= 25, 3600 * 3).otherwise(0))
        is_buy = _u("buy") < 0.05
        return ranged(n).select(
            day.alias("wcs_click_date_sk"),
            tod.alias("wcs_click_time_sk"),
            F.when(is_buy, (F.col("id") / 3).cast("long")
                   % (sizes["web_sales"] // 3)).alias("wcs_sales_sk"),
            F.when(_u("inull") < 0.03, None)
            .when(_u("target") < 0.05, 10001)
            .otherwise(_item_sk("wci", n_item)).alias("wcs_item_sk"),
            (F.pmod(F.col("id"), F.lit(12)) + 1).alias("wcs_web_page_sk"),
            F.when(_u("unull") < 0.05, None).otherwise(user)
            .alias("wcs_user_sk"),
        )

    if name == "inventory":
        n = sizes["inventory"]
        return ranged(n).select(
            # Jan–Jun 2001: covers q23's Jan-Feb window AND q22's default
            # ±30d band around 2001-05-08
            (F.pmod(F.col("id"), F.lit(160)) + DAY0 + SK_OFFSET)
            .alias("inv_date_sk"),
            _item_sk("invi", min(40, n_item)).alias("inv_item_sk"),
            (F.pmod(F.col("id"), F.lit(3)) + 1).alias("inv_warehouse_sk"),
            F.when(_u("hv") < 0.2,
                   _pick("hvv", (0, 1200, 5, 300)).cast("int"))
            .otherwise((F.lit(100) + (_u("lv") * 10).cast("int")))
            .cast("int").alias("inv_quantity_on_hand"),
        )

    if name == "product_reviews":
        n = sizes["product_reviews"]
        senti = _pick("sw", ("good", "great", "bad", "terrible", "awful"))
        store_name = _pick("sn", ("able", "ought", "bar", "cally"))
        item = F.when(_u("ri") < 0.1, 10002).otherwise(
            _item_sk("pri", n_item))
        # full 2001-2004 span so review-windowed queries past 2001 see data
        review_date = F.date_add(
            F.lit("2001-01-01").cast("date"),
            F.pmod(F.xxhash64(F.col("id"), F.lit("prday")),
                   F.lit(N_DAYS)).cast("int"))
        return ranged(n).select(
            (F.col("id") + 1).alias("pr_review_sk"),
            review_date.cast("string").alias("pr_review_date"),
            (F.pmod(F.col("id"), F.lit(5)).cast("int") + 1)
            .alias("pr_review_rating"),
            item.alias("pr_item_sk"),
            (F.pmod(F.col("id"), F.lit(40)) + 1).alias("pr_user_sk"),
            F.concat(
                F.lit("This product is "), senti,
                F.lit(" and I bought it at "), store_name,
                F.lit(". Compare with Acme Corp products! The item is "),
                _pick("sw2", ("bad", "worst", "hate")), F.lit(" overall."),
            ).alias("pr_review_content"),
        )

    if name == "store":
        names = ("able", "ought", "bar", "cally", "eing", "anti")
        return ranged(6).select(
            _pick_at("id", (10, 20, 33, 40, 50, 60)).alias("s_store_sk"),
            F.format_string("S%d", F.col("id").cast("int")).alias("s_store_id"),
            _pick_at("id", names).alias("s_store_name"),
            F.when(F.pmod(F.col("id"), F.lit(2)) == 0, -5.0).otherwise(-6.0)
            .cast("decimal(5,2)").alias("s_gmt_offset"),
        )

    if name == "warehouse":
        return ranged(3).select(
            (F.col("id") + 1).alias("w_warehouse_sk"),
            F.concat(F.lit("warehouse "), F.col("id") + 1)
            .alias("w_warehouse_name"),
            _pick_at("id", STATES[:3]).alias("w_state"),
        )

    if name == "web_page":
        return ranged(12).select(
            (F.col("id") + 1).alias("wp_web_page_sk"),
            _pick_at("id", WP_TYPES).alias("wp_type"),
            F.when(F.pmod(F.col("id"), F.lit(3)) == 0, 5500).otherwise(2000)
            .alias("wp_char_count"),
        )

    if name == "promotion":
        return ranged(8).select(
            (F.col("id") + 1).alias("p_promo_sk"),
            _pick_at("id", ("Y", "N", None)).alias("p_channel_dmail"),
            _pick_at("id", ("N", "Y", None)).alias("p_channel_email"),
            _pick_at("id", ("N", None, "Y")).alias("p_channel_tv"),
        )

    if name == "customer_address":
        return ranged(30).select(
            (F.col("id") + 1).alias("ca_address_sk"),
            F.when(_u("canull") < 0.05, None)
            .otherwise(_pick_at("id", STATES)).alias("ca_state"),
            F.lit("United States").alias("ca_country"),
            F.lit(-5.0).cast("decimal(5,2)").alias("ca_gmt_offset"),
        )

    if name == "customer_demographics":
        return ranged(24).select(
            (F.col("id") + 1).alias("cd_demo_sk"),
            F.when(F.pmod(F.col("id"), F.lit(2)) == 0, "M").otherwise("F")
            .alias("cd_gender"),
            F.when(F.pmod(F.col("id"), F.lit(3)) != 0, "M").otherwise("S")
            .alias("cd_marital_status"),
            _pick_at("id", EDUCATION).alias("cd_education_status"),
        )

    if name == "household_demographics":
        return ranged(10).select(
            (F.col("id") + 1).alias("hd_demo_sk"),
            F.when(F.pmod(F.col("id"), F.lit(2)) == 0, 5).otherwise(2)
            .cast("int").alias("hd_dep_count"),
        )

    if name == "item_marketprices":
        # four price periods for the q24 default item, one each for the
        # other special items — every imp_item_sk exists in `item`
        return ranged(6).select(
            (F.col("id") + 1).alias("imp_sk"),
            F.when(F.col("id") < 4, 10000)
            .otherwise(F.col("id") - 3 + 10000).alias("imp_item_sk"),
            F.round(F.lit(2.0) + F.col("id"), 2).cast("decimal(7,2)")
            .alias("imp_competitor_price"),
            (F.lit(DAY0 + SK_OFFSET + 59) + (F.col("id") + 1) * 40)
            .alias("imp_start_date"),
            (F.lit(DAY0 + SK_OFFSET + 89) + (F.col("id") + 1) * 40)
            .alias("imp_end_date"),
        )

    raise KeyError(f"datagen does not cover table {name!r}")


def _pick_at(id_col: str, values: tuple) -> Column:
    """Positional pick: element values[id mod len] (1-based element_at)."""
    arr = F.array(*[F.lit(v) for v in values])
    return F.element_at(
        arr, (F.pmod(F.col(id_col), F.lit(len(values))) + 1).cast("int"))


def _u_over(col: str, salt: str) -> Column:
    """Uniform [0,1) keyed on an arbitrary column (not the range id)."""
    return (
        F.pmod(F.xxhash64(F.col(col), F.lit(salt)), F.lit(1_000_000))
        .cast("double") / 1_000_000.0
    )


GENERATED_TABLES = (
    "date_dim", "time_dim", "item", "customer", "store_sales",
    "store_returns", "web_sales", "web_returns", "web_clickstreams",
    "inventory", "product_reviews", "store", "warehouse", "web_page",
    "promotion", "customer_address", "customer_demographics",
    "household_demographics", "item_marketprices",
)


def write_dataset(spark: SparkSession, out_dir: str, sf: float = 0.1,
                  partitions: int | None = None) -> None:
    """Generate and write the dataset in the reference layout
    ({out_dir}/{table}/ parquet). Generation is fully distributed; at
    large SF pass `partitions` to control output file counts."""
    for name in GENERATED_TABLES:
        generate_table(spark, name, sf, partitions).write.mode(
            "overwrite").parquet(f"{out_dir.rstrip('/')}/{name}")
