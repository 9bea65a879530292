"""TPCx-BB q10–q19 (semantics per SURVEY.md §2.11).

Text queries (q10/q18/q19) run the reference pipeline reviews → sentences →
words → lexicon join (reference bdb_tools/text.py:28-69) via
operators/text.py. The sentiment lexicon is injected (`pos_lexicon` /
`neg_lexicon` DataFrames of (word, sentiment)) or defaults to a small
built-in list — the reference ships external word-list files
(README.md:37-44) which are not redistributed here; load real ones with
sources.load_word_list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gpu_bdb_spark.operators.stats import regression_sums, slope_intercept
from gpu_bdb_spark.operators.text import sentences as split_sentences
from gpu_bdb_spark.operators.text import words as split_words
from gpu_bdb_spark.queries.tpcxbb.base import Tables, date_to_days
from gpu_bdb_spark.queries.tpcxbb.registry import register_q

#: Built-in lexicon (stand-in for the reference's sentiment_files/*.txt;
#: q10:35-44 — those files are not redistributed). ~60 common English
#: sentiment words per side; inject larger domain lexicons via the
#: pos_words/neg_words parameters or sources.load_word_list.
DEFAULT_POS = (
    "good", "great", "excellent", "love", "best", "happy", "wonderful",
    "fantastic", "nice", "amazing", "awesome", "beautiful", "brilliant",
    "charming", "comfortable", "convenient", "delightful", "durable",
    "easy", "effective", "efficient", "elegant", "enjoyable", "exceptional",
    "fabulous", "fast", "favorite", "fine", "flawless", "fresh", "friendly",
    "fun", "generous", "gorgeous", "handy", "helpful", "ideal", "impressed",
    "impressive", "incredible", "lovely", "loved", "marvelous", "outstanding",
    "perfect", "pleasant", "pleased", "premium", "quality", "recommend",
    "reliable", "satisfied", "smooth", "solid", "sturdy", "stunning",
    "superb", "superior", "terrific", "valuable", "worthwhile")
DEFAULT_NEG = (
    "bad", "terrible", "awful", "hate", "worst", "angry", "horrible",
    "poor", "broken", "disappointing", "annoying", "atrocious", "awkward",
    "cheap", "clumsy", "crap", "cracked", "damaged", "defective",
    "deficient", "dirty", "disappointed", "disgusting", "dreadful",
    "faulty", "flawed", "flimsy", "fragile", "garbage", "gross", "hated",
    "inadequate", "inferior", "junk", "lousy", "mediocre", "mess",
    "miserable", "misleading", "noisy", "overpriced", "pathetic",
    "problem", "refund", "regret", "return", "returned", "rough", "rude",
    "slow", "sloppy", "stuck", "unacceptable", "uncomfortable", "unhappy",
    "unreliable", "unusable", "useless", "waste", "weak", "wrong")


def _lexicon(spark: SparkSession, words, sentiment: str) -> DataFrame:
    return F.broadcast(
        spark.createDataFrame([(w,) for w in sorted(set(words))], ["sent_word"])
        .withColumn("sentiment", F.lit(sentiment))
    )


def _review_words(reviews: DataFrame) -> DataFrame:
    """reviews → (pr_item_sk, review_idx, sentence_idx, sentence, word) via
    the operators/text pipeline. The reference keys sentences by a global
    cumsum (q10:70-71); (review, sentence_idx) is the scale-safe key."""
    base = reviews.select(
        F.col("pr_review_sk"), F.col("pr_item_sk"),
        F.lower(F.col("pr_review_content")).alias("content"))
    sent = split_sentences(base, "content", "pr_review_sk").join(
        base.select("pr_review_sk", "pr_item_sk"), "pr_review_sk")
    return split_words(sent, "sentence")


@register_q(10)
def q10(spark: SparkSession, tables: Tables, *, pos_words=DEFAULT_POS,
        neg_words=DEFAULT_NEG) -> DataFrame:
    """Sentiment words per item from reviews (reference q10:55-123).
    Output: (item_sk, review_sentence, sentiment, sentiment_word)."""
    reviews = tables("product_reviews",
                     ["pr_review_sk", "pr_item_sk", "pr_review_content"],
                     broadcast=False).filter(
        F.col("pr_item_sk").isNotNull()
        & F.col("pr_review_content").isNotNull())
    lex = _lexicon(spark, pos_words, "POS").unionByName(
        _lexicon(spark, neg_words, "NEG"))
    w = _review_words(reviews)
    return (
        w.join(F.broadcast(lex), w.word == lex.sent_word)
        .select(
            F.col("pr_item_sk").alias("item_sk"),
            F.col("sentence").alias("review_sentence"),
            "sentiment",
            F.col("word").alias("sentiment_word"),
        )
        .distinct()
        .orderBy("item_sk", "review_sentence", "sentiment_word")
    )


@register_q(11)
def q11(spark: SparkSession, tables: Tables, *, start_date="2003-01-02",
        end_date="2003-02-02") -> DataFrame:
    """corr(review count, avg rating) over items sold in the window
    (reference q11:41-91). 1×1."""
    dd = (
        tables("date_dim", ["d_date_sk", "d_date"])
        .withColumn("d_days", date_to_days("d_date"))
        .filter(F.col("d_days").between(
            date_to_days(F.lit(start_date)), date_to_days(F.lit(end_date))))
        .select("d_date_sk")
    )
    ws = tables("web_sales", ["ws_sold_date_sk", "ws_item_sk"],
                broadcast=False)
    sold_items = (
        ws.join(dd, ws.ws_sold_date_sk == dd.d_date_sk)
        .filter(F.col("ws_item_sk").isNotNull())
        .select("ws_item_sk").distinct()
    )
    pr = tables("product_reviews", ["pr_item_sk", "pr_review_rating"],
                broadcast=False).filter(F.col("pr_item_sk").isNotNull())
    per_item = pr.groupBy("pr_item_sk").agg(
        F.count("pr_review_rating").alias("reviews_count"),
        F.avg("pr_review_rating").alias("avg_rating"),
    )
    joined = sold_items.join(per_item,
                             sold_items.ws_item_sk == per_item.pr_item_sk)
    return joined.agg(
        F.corr("reviews_count", "avg_rating").alias(
            "corr(reviews_count, avg_rating)"))


@register_q(12)
def q12(spark: SparkSession, tables: Tables, *,
        categories=("Books", "Electronics"), click_start_sk=37134,
        click_window=30, sale_window=90) -> DataFrame:
    """Users who clicked category items online then bought in store ≤90
    days later (reference q12:186-214; theta predicate click < sale)."""
    item = tables("item", ["i_item_sk", "i_category"]).filter(
        F.col("i_category").isin(*categories)).select("i_item_sk")
    wcs = tables("web_clickstreams",
                 ["wcs_user_sk", "wcs_click_date_sk", "wcs_item_sk",
                  "wcs_sales_sk"], broadcast=False)
    clicks = (
        wcs.filter(
            F.col("wcs_user_sk").isNotNull()
            & F.col("wcs_item_sk").isNotNull()
            & F.col("wcs_sales_sk").isNull()
            & F.col("wcs_click_date_sk").between(
                click_start_sk, click_start_sk + click_window))
        .join(F.broadcast(item), F.col("wcs_item_sk") == item.i_item_sk,
              "left_semi")
        .select("wcs_user_sk", "wcs_click_date_sk")
        .distinct()
    )
    ss = tables("store_sales", ["ss_customer_sk", "ss_sold_date_sk",
                                "ss_item_sk"], broadcast=False)
    sales = (
        ss.filter(
            F.col("ss_customer_sk").isNotNull()
            & F.col("ss_sold_date_sk").between(
                click_start_sk, click_start_sk + sale_window))
        .join(F.broadcast(item), F.col("ss_item_sk") == item.i_item_sk,
              "left_semi")
        .select("ss_customer_sk", "ss_sold_date_sk")
        .distinct()
    )
    return (
        clicks.join(
            sales,
            (clicks.wcs_user_sk == sales.ss_customer_sk)
            & (clicks.wcs_click_date_sk < sales.ss_sold_date_sk))
        .select("wcs_user_sk")
        .distinct()
        .orderBy("wcs_user_sk")
    )


@register_q(13)
def q13(spark: SparkSession, tables: Tables, *, year=2001, limit=100) -> DataFrame:
    """Top-100 customers by web sales growth where web ratio > store ratio
    (reference q13:48-186; q13_Year=2001)."""
    dd = tables("date_dim", ["d_date_sk", "d_year"]).filter(
        F.col("d_year").isin(year, year + 1))

    def ratio(df, date_sk, cust_sk, net_paid, name):
        j = df.join(dd, F.col(date_sk) == dd.d_date_sk)
        g = j.groupBy(F.col(cust_sk).alias("c_customer_sk")).agg(
            F.sum(F.when(F.col("d_year") == year, F.col(net_paid))
                  .otherwise(0)).cast("double").alias("first_year_sales"),
            F.sum(F.when(F.col("d_year") == year + 1, F.col(net_paid))
                  .otherwise(0)).cast("double").alias("second_year_sales"),
        )
        return g.filter(F.col("first_year_sales") > 0).select(
            "c_customer_sk",
            (F.col("second_year_sales") / F.col("first_year_sales")).alias(name))

    store = ratio(
        tables("store_sales", ["ss_sold_date_sk", "ss_customer_sk",
                               "ss_net_paid"], broadcast=False),
        "ss_sold_date_sk", "ss_customer_sk", "ss_net_paid",
        "storeSalesIncreaseRatio")
    web = ratio(
        tables("web_sales", ["ws_sold_date_sk", "ws_bill_customer_sk",
                             "ws_net_paid"], broadcast=False),
        "ws_sold_date_sk", "ws_bill_customer_sk", "ws_net_paid",
        "webSalesIncreaseRatio")
    cust = tables("customer", ["c_customer_sk", "c_first_name", "c_last_name"])
    return (
        store.join(web, "c_customer_sk")
        .filter(F.col("webSalesIncreaseRatio")
                > F.col("storeSalesIncreaseRatio"))
        .join(cust, "c_customer_sk")
        .select("c_customer_sk", "c_first_name", "c_last_name",
                "storeSalesIncreaseRatio", "webSalesIncreaseRatio")
        .orderBy(F.desc("webSalesIncreaseRatio"), F.asc("c_customer_sk"),
                 F.asc("c_first_name"), F.asc("c_last_name"))
        .limit(limit)
    )


@register_q(14)
def q14(spark: SparkSession, tables: Tables, *, dependents=5,
        morning=(7, 8), evening=(19, 20), char_count=(5000, 6000)) -> DataFrame:
    """AM/PM web-sales ratio for high-dependent households on long content
    pages (reference q14:28-108). 1×1 (−1.0 when pm count is 0,
    reference q14:102-103)."""
    td = tables("time_dim", ["t_time_sk", "t_hour"])
    hd = tables("household_demographics", ["hd_demo_sk", "hd_dep_count"]).filter(
        F.col("hd_dep_count") == dependents)
    wp = tables("web_page", ["wp_web_page_sk", "wp_char_count"]).filter(
        F.col("wp_char_count").between(*char_count))
    ws = tables("web_sales", ["ws_sold_time_sk", "ws_ship_hdemo_sk",
                              "ws_web_page_sk"], broadcast=False)
    j = (
        ws.join(hd, ws.ws_ship_hdemo_sk == hd.hd_demo_sk)
        .join(wp, ws.ws_web_page_sk == wp.wp_web_page_sk)
        .join(td, ws.ws_sold_time_sk == td.t_time_sk)
    )
    agg = j.agg(
        F.sum(F.when(F.col("t_hour").between(*morning), 1).otherwise(0))
        .alias("am"),
        F.sum(F.when(F.col("t_hour").between(*evening), 1).otherwise(0))
        .alias("pm"),
    )
    return agg.select(
        F.when(F.col("pm") > 0,
               F.col("am").cast("double") / F.col("pm").cast("double"))
        .otherwise(F.lit(-1.0)).alias("am_pm_ratio"))


@register_q(15)
def q15(spark: SparkSession, tables: Tables, *, store_sk=10,
        start_date="2001-09-02", end_date="2002-09-02") -> DataFrame:
    """Store categories with declining sales: per-(category, day) sums →
    least-squares slope < 0 (reference q15:80-140, stats via
    operators/stats.py exact sufficient statistics)."""
    dd = (
        tables("date_dim", ["d_date_sk", "d_date"])
        .withColumn("d_days", date_to_days("d_date"))
        .filter(F.col("d_days").between(
            date_to_days(F.lit(start_date)), date_to_days(F.lit(end_date))))
        .select("d_date_sk", "d_days")
    )
    ss = tables("store_sales", ["ss_sold_date_sk", "ss_net_paid",
                                "ss_store_sk", "ss_item_sk"],
                broadcast=False).filter(F.col("ss_store_sk") == store_sk)
    item = tables("item", ["i_item_sk", "i_category_id"]).filter(
        F.col("i_category_id").isNotNull())
    daily = (
        ss.join(dd, ss.ss_sold_date_sk == dd.d_date_sk)
        .join(item, ss.ss_item_sk == item.i_item_sk)
        .groupBy("i_category_id", "d_days")
        .agg(F.sum(F.col("ss_net_paid").cast("decimal(14,4)")).alias("day_sum"))
    )
    sums = regression_sums(daily, ["i_category_id"], F.col("d_days"),
                           F.col("day_sum"))
    fitted = slope_intercept(sums)
    return (
        fitted.filter(F.col("slope") <= 0)
        .select(F.col("i_category_id").alias("cat"), "slope", "intercept")
        .orderBy("cat")
    )


@register_q(16)
def q16(spark: SparkSession, tables: Tables, *, pivot_date="2001-03-16",
        limit=100) -> DataFrame:
    """Web sales ± returns impact 30 days around a date, per (state, item)
    (reference q16:49-232; COALESCE q16:193-197; 'first 100 sorted
    groups' quirk q16:209-216)."""
    pivot_days = date_to_days(F.lit(pivot_date))
    dd = (
        tables("date_dim", ["d_date_sk", "d_date"])
        .withColumn("d_days", date_to_days("d_date"))
        .filter((F.col("d_days") >= pivot_days - 30)
                & (F.col("d_days") <= pivot_days + 30))
    )
    ws = tables("web_sales",
                ["ws_order_number", "ws_item_sk", "ws_warehouse_sk",
                 "ws_sold_date_sk", "ws_sales_price"], broadcast=False)
    wr = tables("web_returns",
                ["wr_order_number", "wr_item_sk", "wr_refunded_cash"],
                broadcast=False)
    item = tables("item", ["i_item_sk", "i_item_id"])
    wh = tables("warehouse", ["w_warehouse_sk", "w_state"])
    sales = (
        ws.join(dd, ws.ws_sold_date_sk == dd.d_date_sk)
        .join(wr, (ws.ws_order_number == wr.wr_order_number)
              & (ws.ws_item_sk == wr.wr_item_sk), "left")
        .join(item, ws.ws_item_sk == item.i_item_sk)
        .join(wh, ws.ws_warehouse_sk == wh.w_warehouse_sk)
        .withColumn("net",
                    F.col("ws_sales_price")
                    - F.coalesce(F.col("wr_refunded_cash"), F.lit(0)))
    )
    grouped = sales.groupBy("w_state", "i_item_id").agg(
        F.sum(F.when(F.col("d_days") < pivot_days, F.col("net")).otherwise(0))
        .cast("double").alias("sales_before"),
        F.sum(F.when(F.col("d_days") >= pivot_days, F.col("net")).otherwise(0))
        .cast("double").alias("sales_after"),
    )
    # reference takes the first 100 rows of the key-sorted groupby output
    return grouped.orderBy("w_state", "i_item_id").limit(limit)


@register_q(17)
def q17(spark: SparkSession, tables: Tables, *, year=2001, month=12,
        gmt_offset=-5.0) -> DataFrame:
    """Promoted vs total sales percentage (reference q17:55-124; left-semi
    joins utils.py:929-940 → native; fillna('None') on channel keys
    q17:122-124). 1 row."""
    dd = tables("date_dim", ["d_date_sk", "d_year", "d_moy"]).filter(
        (F.col("d_year") == year) & (F.col("d_moy") == month))
    store = tables("store", ["s_store_sk", "s_gmt_offset"]).filter(
        F.col("s_gmt_offset") == gmt_offset).select("s_store_sk")
    addr = tables("customer_address", ["ca_address_sk", "ca_gmt_offset"]).filter(
        F.col("ca_gmt_offset") == gmt_offset).select("ca_address_sk")
    cust = tables("customer", ["c_customer_sk", "c_current_addr_sk"])
    promo = tables("promotion",
                   ["p_promo_sk", "p_channel_email", "p_channel_dmail",
                    "p_channel_tv"])
    ss = tables("store_sales",
                ["ss_item_sk", "ss_store_sk", "ss_customer_sk", "ss_promo_sk",
                 "ss_sold_date_sk", "ss_ext_sales_price"], broadcast=False)
    filtered = (
        ss.join(dd, ss.ss_sold_date_sk == dd.d_date_sk)
        .join(F.broadcast(store), ss.ss_store_sk == store.s_store_sk, "left_semi")
        .join(cust, ss.ss_customer_sk == cust.c_customer_sk)
        .join(F.broadcast(addr), cust.c_current_addr_sk == addr.ca_address_sk,
              "left_semi")
        .join(promo, ss.ss_promo_sk == promo.p_promo_sk)
    )
    grouped = (
        filtered.na.fill("None", ["p_channel_email", "p_channel_dmail",
                                  "p_channel_tv"])
        .groupBy("p_channel_email", "p_channel_dmail", "p_channel_tv")
        .agg(F.sum("ss_ext_sales_price").cast("double").alias("total"))
        .withColumn(
            "promotional",
            F.when((F.col("p_channel_dmail") == "Y")
                   | (F.col("p_channel_email") == "Y")
                   | (F.col("p_channel_tv") == "Y"),
                   F.col("total")).otherwise(0.0))
    )
    return grouped.agg(
        F.sum("promotional").alias("promotional"),
        F.sum("total").alias("total"),
    ).select(
        "promotional", "total",
        F.when(F.col("total") > 0,
               F.col("promotional") * 100.0 / F.col("total"))
        .otherwise(0.0).alias("promo_percent"))


def _declining_stores(tables: Tables, start_date: str, end_date: str) -> DataFrame:
    """Stores with non-positive sales slope over the window (reference
    q18:72-108): per-(store, day) net_paid sums → slope ≤ 0."""
    dd = (
        tables("date_dim", ["d_date_sk", "d_date"])
        .withColumn("d_days", date_to_days("d_date"))
        .filter(F.col("d_days").between(
            date_to_days(F.lit(start_date)), date_to_days(F.lit(end_date))))
        .select("d_date_sk", "d_days")
    )
    ss = tables("store_sales", ["ss_sold_date_sk", "ss_store_sk",
                                "ss_net_paid"], broadcast=False)
    daily = (
        ss.join(dd, ss.ss_sold_date_sk == dd.d_date_sk)
        .groupBy("ss_store_sk", "d_days")
        .agg(F.sum(F.col("ss_net_paid").cast("decimal(14,4)")).alias("day_sum"))
    )
    sums = regression_sums(daily, ["ss_store_sk"], F.col("d_days"),
                           F.col("day_sum"))
    return slope_intercept(sums).filter(F.col("slope") <= 0).select(
        "ss_store_sk")


@register_q(18)
def q18(spark: SparkSession, tables: Tables, *, start_date="2001-05-02",
        end_date="2001-09-02", neg_words=DEFAULT_NEG) -> DataFrame:
    """Negative review sentences mentioning stores with declining sales
    (reference q18:72-221; store-name matching q18_utils.py:110-141 via
    native `contains` instead of the custom find_multiple kernel).
    Output: (s_name, r_date, sentence, sentiment, word)."""
    declining = _declining_stores(tables, start_date, end_date)
    stores = (
        tables("store", ["s_store_sk", "s_store_name"])
        .join(declining, F.col("s_store_sk") == declining.ss_store_sk,
              "left_semi")
        .select(F.lower(F.col("s_store_name")).alias("store_name"))
        .distinct()
    )
    reviews = tables("product_reviews",
                     ["pr_review_sk", "pr_review_date", "pr_review_content"],
                     broadcast=False).filter(
        F.col("pr_review_content").isNotNull())
    base = reviews.select(
        "pr_review_sk", "pr_review_date",
        F.lower(F.col("pr_review_content")).alias("content"))
    sent = split_sentences(base, "content", "pr_review_sk").join(
        base.select("pr_review_sk", "pr_review_date"), "pr_review_sk")
    mentioned = sent.join(
        F.broadcast(stores),
        F.col("sentence").contains(F.col("store_name")))
    w = split_words(mentioned, "sentence")
    neg = _lexicon(spark, neg_words, "NEG")
    return (
        w.join(neg, w.word == neg.sent_word)
        .select(
            F.col("store_name").alias("s_name"),
            F.col("pr_review_date").alias("r_date"),
            "sentence", "sentiment",
            F.col("word").alias("sentiment_word"),
        )
        .distinct()
        .orderBy("s_name", "r_date", "sentence", "sentiment_word")
    )


@register_q(19)
def q19(spark: SparkSession, tables: Tables, *,
        return_dates=("2004-03-08", "2004-08-02", "2004-11-15", "2004-12-20"),
        tolerance=0.1, neg_words=DEFAULT_NEG) -> DataFrame:
    """Negative sentiment for items with balanced store/web returns
    (reference q19:85-171): weeks containing the given dates, per-item
    return-quantity sums from both channels within 10% of each other →
    negative sentences for those items."""
    dd = tables("date_dim", ["d_date_sk", "d_date", "d_week_seq"],
                broadcast=False)
    weeks = (
        dd.filter(F.col("d_date").isin(*return_dates))
        .select("d_week_seq").distinct()
    )
    week_dates = F.broadcast(
        dd.join(weeks, "d_week_seq", "left_semi").select("d_date_sk"))

    sr = tables("store_returns",
                ["sr_returned_date_sk", "sr_item_sk", "sr_return_quantity"],
                broadcast=False)
    sr_qty = (
        sr.join(week_dates, sr.sr_returned_date_sk == week_dates.d_date_sk)
        .groupBy("sr_item_sk")
        .agg(F.sum("sr_return_quantity").alias("sr_item_qty"))
    )
    wr = tables("web_returns",
                ["wr_returned_date_sk", "wr_item_sk", "wr_return_quantity"],
                broadcast=False)
    wr_qty = (
        wr.join(week_dates, wr.wr_returned_date_sk == week_dates.d_date_sk)
        .groupBy("wr_item_sk")
        .agg(F.sum("wr_return_quantity").alias("wr_item_qty"))
    )
    balanced = (
        sr_qty.join(wr_qty, sr_qty.sr_item_sk == wr_qty.wr_item_sk)
        .filter(
            (F.abs(F.col("sr_item_qty") - F.col("wr_item_qty"))
             / ((F.col("sr_item_qty") + F.col("wr_item_qty")) / 2.0))
            <= tolerance)
        .select(F.col("sr_item_sk").alias("item_sk"))
    )
    reviews = tables("product_reviews",
                     ["pr_review_sk", "pr_item_sk", "pr_review_content"],
                     broadcast=False).filter(
        F.col("pr_review_content").isNotNull())
    relevant = reviews.join(
        F.broadcast(balanced), reviews.pr_item_sk == balanced.item_sk,
        "left_semi")
    w = _review_words(relevant)
    neg = _lexicon(spark, neg_words, "NEG")
    return (
        w.join(neg, w.word == neg.sent_word)
        .select(
            F.col("pr_item_sk").alias("item_sk"),
            "sentence", "sentiment",
            F.col("word").alias("sentiment_word"),
        )
        .distinct()
        .orderBy("item_sk", "sentence", "sentiment_word")
    )
