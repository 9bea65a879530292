"""Deterministic in-memory TPCx-BB fixture (FIXTURES.md §A shapes, tiny).

Generates all 23 tables as Spark DataFrames with full schemas
(gpu_bdb_spark.schemas). Sized for smoke/semantic tests: a few hundred fact
rows engineered so every query's join paths and filters are exercised and
most produce non-empty results.

Date surrogate convention: d_date_sk = epoch_days(d_date) + 25567, which
places 2001-09-02 at sk 37134 — matching the reference's hard-coded windows
(q12 BETWEEN 37134 AND 37134+30; q08 2001-09-02; q25 anchor 37621 =
2003-01-02).
"""

from __future__ import annotations

import datetime as dt
import decimal
import random

from pyspark.sql import DataFrame, SparkSession

from gpu_bdb_spark.schemas import TABLE_COLUMNS, schema_for

EPOCH = dt.date(1970, 1, 1)
SK_OFFSET = 25567


def days(d: str) -> int:
    return (dt.date.fromisoformat(d) - EPOCH).days


def sk(d: str) -> int:
    return days(d) + SK_OFFSET


CATEGORIES = ["Books", "Electronics", "Music", "Home", "Sports", "Toys", "Shoes"]
STATES = ["KY", "GA", "NM", "MT", "OR", "IN", "WI", "MO", "WV", "CA"]
EDUCATION = ["4 yr Degree", "College", "Advanced Degree", "2 yr Degree",
             "Unknown"]
STORE_NAMES = ["able", "ought", "bar", "cally", "eing", "anti"]
POS_WORDS = ["good", "great", "excellent", "love", "best"]
NEG_WORDS = ["bad", "terrible", "awful", "hate", "worst"]


def _row(table: str, **values) -> tuple:
    cols = TABLE_COLUMNS[table]
    unknown = set(values) - {c for c, _ in cols}
    assert not unknown, f"{table}: unknown columns {unknown}"
    out = []
    for col, typ in cols:
        v = values.get(col)
        if v is not None and typ.startswith("decimal"):
            scale = int(typ.rstrip(")").split(",")[1])
            v = decimal.Decimal(str(round(float(v), scale)))
        out.append(v)
    return tuple(out)


def build_fixture(spark: SparkSession) -> dict[str, DataFrame]:
    rng = random.Random(7)
    data: dict[str, list[tuple]] = {}

    # ---- date_dim: 2001-01-01 .. 2004-12-31
    rows = []
    d = dt.date(2001, 1, 1)
    while d <= dt.date(2004, 12, 31):
        dsk = (d - EPOCH).days + SK_OFFSET
        rows.append(_row(
            "date_dim", d_date_sk=dsk, d_date_id=f"D{dsk}",
            d_date=d.isoformat(), d_week_seq=dsk // 7, d_year=d.year,
            d_moy=d.month, d_dom=d.day, d_dow=d.weekday(),
            d_qoy=(d.month - 1) // 3 + 1))
        d += dt.timedelta(days=1)
    data["date_dim"] = rows

    # ---- time_dim: one row per hour (t_time_sk = hour)
    data["time_dim"] = [
        _row("time_dim", t_time_sk=h, t_time_id=f"T{h}", t_time=h * 3600,
             t_hour=h, t_minute=0, t_second=0,
             t_am_pm="AM" if h < 12 else "PM")
        for h in range(24)
    ]

    # ---- item: sks 1..60 + 10000/10001/10002
    item_sks = list(range(1, 61)) + [10000, 10001, 10002]
    rows = []
    for i, isk in enumerate(item_sks):
        cat_id = None if i % 29 == 7 else (i % 7) + 1
        rows.append(_row(
            "item", i_item_sk=isk, i_item_id=f"ITEM{isk:06d}",
            i_item_desc=f"desc of item {isk}",
            i_current_price=round(1.0 + (i % 40) * 0.11, 2),
            i_category_id=cat_id,
            i_category=CATEGORIES[cat_id - 1] if cat_id else None,
            i_class_id=(i % 15) + 1, i_class=f"class{(i % 15) + 1}",
            i_brand_id=(i % 5) + 1, i_brand=f"brand{(i % 5) + 1}",
            i_manager_id=i % 10))
    data["item"] = rows

    # ---- store: include sks 10,20,33,40,50
    store_sks = [10, 20, 33, 40, 50, 60]
    data["store"] = [
        _row("store", s_store_sk=ssk, s_store_id=f"S{ssk}",
             s_store_name=STORE_NAMES[i], s_number_employees=50 + i,
             s_gmt_offset=-5.0 if i % 2 == 0 else -6.0)
        for i, ssk in enumerate(store_sks)
    ]

    data["warehouse"] = [
        _row("warehouse", w_warehouse_sk=w, w_warehouse_id=f"W{w}",
             w_warehouse_name=f"warehouse {w}", w_state=STATES[w])
        for w in range(1, 4)
    ]

    # ---- web_page: types cycle; some long char counts
    wp_types = ["order", "dynamic", "review", "general", "feedback",
                "protected"]
    data["web_page"] = [
        _row("web_page", wp_web_page_sk=w, wp_web_page_id=f"WP{w}",
             wp_type=wp_types[w % len(wp_types)],
             wp_char_count=5500 if w % 3 == 0 else 2000,
             wp_link_count=w)
        for w in range(1, 13)
    ]

    # ---- small dims
    data["customer_address"] = [
        _row("customer_address", ca_address_sk=a, ca_address_id=f"A{a}",
             ca_state=None if a % 19 == 5 else STATES[a % len(STATES)],
             ca_country="United States", ca_gmt_offset=-5.0)
        for a in range(1, 31)
    ]
    data["customer_demographics"] = [
        _row("customer_demographics", cd_demo_sk=c,
             cd_gender="M" if c % 2 else "F",
             cd_marital_status="M" if c % 3 else "S",
             cd_education_status=EDUCATION[c % len(EDUCATION)],
             cd_purchase_estimate=500 * (c % 5), cd_dep_count=c % 4)
        for c in range(1, 25)
    ]
    data["household_demographics"] = [
        _row("household_demographics", hd_demo_sk=h, hd_income_band_sk=h % 5,
             hd_buy_potential="5001-10000", hd_dep_count=5 if h % 2 else 2,
             hd_vehicle_count=h % 3)
        for h in range(1, 11)
    ]
    data["income_band"] = [
        _row("income_band", ib_income_band_sk=b, ib_lower_bound=b * 10000,
             ib_upper_bound=(b + 1) * 10000)
        for b in range(5)
    ]
    data["promotion"] = [
        _row("promotion", p_promo_sk=p, p_promo_id=f"P{p}",
             p_channel_dmail=["Y", "N", None][p % 3],
             p_channel_email=["N", "Y", None][(p + 1) % 3],
             p_channel_tv=["N", None, "Y"][p % 3])
        for p in range(1, 9)
    ]
    data["reason"] = [_row("reason", r_reason_sk=1, r_reason_id="R1",
                           r_reason_desc="defective")]
    data["ship_mode"] = [_row("ship_mode", sm_ship_mode_sk=1,
                              sm_ship_mode_id="SM1", sm_type="EXPRESS")]
    data["web_site"] = [_row("web_site", web_site_sk=1, web_site_id="WS1",
                             web_name="site0")]

    # ---- customer: user sks shared with clickstream
    n_cust = 40
    data["customer"] = [
        _row("customer", c_customer_sk=c, c_customer_id=f"C{c:06d}",
             c_current_cdemo_sk=(c % 24) + 1, c_current_hdemo_sk=(c % 10) + 1,
             c_current_addr_sk=(c % 30) + 1, c_first_name=f"fn{c}",
             c_last_name=f"ln{c}", c_preferred_cust_flag="Y" if c % 2 else "N",
             c_birth_country="US", c_login=f"u{c}",
             c_email_address=f"u{c}@x.com")
        for c in range(1, n_cust + 1)
    ]

    # ---- store_sales: clustered tickets; 2001/2002 spread + 2004-07 block
    rows = []
    ticket = 0
    sale_days = ([f"2001-{m:02d}-15" for m in range(1, 13)]
                 + [f"2002-{m:02d}-15" for m in range(1, 13)]
                 + ["2004-07-05", "2004-07-12", "2004-07-19"]
                 + ["2003-01-10", "2003-01-20"])
    for day in sale_days:
        for _ in range(8):
            ticket += 1
            cust = rng.randint(1, n_cust)
            for _ in range(rng.randint(2, 5)):
                isk = rng.choice(item_sks)
                price = round(rng.uniform(20, 180), 2)
                rows.append(_row(
                    "store_sales", ss_sold_date_sk=sk(day),
                    ss_sold_time_sk=rng.randint(0, 23),
                    ss_item_sk=isk, ss_customer_sk=cust,
                    ss_cdemo_sk=(cust % 24) + 1, ss_hdemo_sk=(cust % 10) + 1,
                    ss_addr_sk=(cust % 30) + 1,
                    ss_store_sk=rng.choice([10, 20, 33, 40, 50, 60]),
                    ss_promo_sk=rng.randint(1, 8) if rng.random() < 0.8 else None,
                    ss_ticket_number=ticket, ss_quantity=rng.randint(1, 10),
                    ss_sales_price=price, ss_net_paid=price,
                    ss_ext_sales_price=price, ss_ext_list_price=price * 1.2,
                    ss_ext_wholesale_cost=price * 0.7,
                    ss_ext_discount_amt=price * 0.1,
                    ss_net_profit=round(rng.uniform(-50, 2500), 2)))
    # engineered q26 population: customers 1..8 are heavy 'Books' buyers
    # (>5 Books-class items each) so the per-class K-Means has real input
    books_items = [isk for i, isk in enumerate(item_sks)
                   if (i % 7) + 1 == 1 and i % 29 != 7][:6]
    for cust in range(1, 9):
        ticket += 1
        for isk in books_items:
            price = 30.0 + cust
            rows.append(_row(
                "store_sales", ss_sold_date_sk=sk("2002-03-15"),
                ss_sold_time_sk=10, ss_item_sk=isk, ss_customer_sk=cust,
                ss_store_sk=10, ss_ticket_number=ticket,
                ss_quantity=cust % 3 + 1, ss_sales_price=price,
                ss_net_paid=price, ss_ext_sales_price=price,
                ss_ext_list_price=price * 1.2,
                ss_ext_wholesale_cost=price * 0.7,
                ss_ext_discount_amt=price * 0.1, ss_net_profit=5.0))
    data["store_sales"] = rows

    # ---- web_sales: orders with >=2 categories; am/pm hours
    rows = []
    order = 0
    ws_days = ([f"2001-{m:02d}-20" for m in range(1, 13)]
               + [f"2002-{m:02d}-20" for m in range(1, 13)]
               + ["2003-01-15", "2003-01-25", "2001-03-01", "2001-03-20",
                  "2001-04-05"])
    web_orders: list[tuple[int, int]] = []  # (order_number, date_sk)
    for day in ws_days:
        for _ in range(6):
            order += 1
            cust = rng.randint(1, n_cust)
            web_orders.append((order, sk(day)))
            for _ in range(rng.randint(2, 4)):
                isk = rng.choice(item_sks)
                price = round(rng.uniform(15, 160), 2)
                rows.append(_row(
                    "web_sales", ws_sold_date_sk=sk(day),
                    ws_sold_time_sk=rng.choice([7, 8, 19, 20, 12]),
                    ws_item_sk=isk, ws_bill_customer_sk=cust,
                    ws_ship_customer_sk=cust,
                    ws_bill_hdemo_sk=(cust % 10) + 1,
                    ws_ship_hdemo_sk=(cust % 10) + 1,
                    ws_web_page_sk=rng.randint(1, 12),
                    ws_warehouse_sk=rng.randint(1, 3),
                    ws_order_number=order, ws_quantity=rng.randint(1, 8),
                    ws_sales_price=price, ws_net_paid=price,
                    ws_ext_list_price=price * 1.2,
                    ws_ext_wholesale_cost=price * 0.7,
                    ws_ext_discount_amt=price * 0.1,
                    ws_ext_sales_price=price))
    data["web_sales"] = rows

    # ---- store_returns: subset of store_sales triples, ~2 months later
    rows = []
    ss_rows = data["store_sales"]
    for srow in rng.sample(ss_rows, 90):
        vals = dict(zip([c for c, _ in TABLE_COLUMNS["store_sales"]], srow))
        rows.append(_row(
            "store_returns",
            sr_returned_date_sk=vals["ss_sold_date_sk"] + rng.randint(10, 150),
            sr_item_sk=vals["ss_item_sk"],
            sr_customer_sk=vals["ss_customer_sk"],
            sr_ticket_number=vals["ss_ticket_number"],
            sr_return_quantity=rng.randint(1, 4),
            sr_return_amt=round(rng.uniform(5, 80), 2),
            sr_store_sk=vals["ss_store_sk"], sr_reason_sk=1))
    # engineered q19 hits: items 1..3 returned in BOTH channels in the week
    # of 2001-06-10 with balanced quantities (items 1..3 carry reviews)
    for isk in (1, 2, 3):
        rows.append(_row(
            "store_returns", sr_returned_date_sk=sk("2001-06-10"),
            sr_item_sk=isk, sr_customer_sk=1, sr_ticket_number=999000 + isk,
            sr_return_quantity=10, sr_return_amt=25.0, sr_store_sk=10,
            sr_reason_sk=1))
    data["store_returns"] = rows

    # ---- web_returns: subset of web_sales pairs
    rows = []
    ws_rows = data["web_sales"]
    for wrow in rng.sample(ws_rows, 80):
        vals = dict(zip([c for c, _ in TABLE_COLUMNS["web_sales"]], wrow))
        rows.append(_row(
            "web_returns",
            wr_returned_date_sk=vals["ws_sold_date_sk"] + rng.randint(5, 60),
            wr_item_sk=vals["ws_item_sk"],
            wr_refunded_customer_sk=vals["ws_bill_customer_sk"],
            wr_order_number=vals["ws_order_number"],
            wr_return_quantity=rng.randint(1, 4),
            wr_refunded_cash=(round(rng.uniform(5, 60), 2)
                              if rng.random() < 0.7 else None)))
    for isk in (1, 2, 3):
        rows.append(_row(
            "web_returns", wr_returned_date_sk=sk("2001-06-10"),
            wr_item_sk=isk, wr_refunded_customer_sk=2,
            wr_order_number=888000 + isk, wr_return_quantity=10,
            wr_refunded_cash=20.0))
    data["web_returns"] = rows

    # ---- web_clickstreams: per-user bursts with engineered patterns
    rows = []

    def click(user, day_sk, tod, item, page=None, sale=None):
        rows.append(_row(
            "web_clickstreams", wcs_click_date_sk=day_sk,
            wcs_click_time_sk=tod, wcs_sales_sk=sale, wcs_item_sk=item,
            wcs_web_page_sk=page or rng.randint(1, 12), wcs_user_sk=user))

    base_day = sk("2001-09-10")  # inside q08/q12 windows
    for user in range(1, 26):
        day = base_day + (user % 20)
        # burst 1: views incl item 10001, then purchase of 10001
        tod = 1000
        for i in range(6):
            click(user, day, tod + i * 60, rng.choice(item_sks[:40]))
        click(user, day, tod + 400, 10001)
        if user % 2 == 0:
            order_no, _ = rng.choice(web_orders)
            click(user, day, tod + 500, 10001, sale=order_no)
        # burst 2 (> 1h later): review page then purchase (q08), cat pairs
        tod2 = tod + 3600 * 3
        click(user, day, tod2, rng.choice(item_sks), page=3)  # wp 3 = review
        click(user, day, tod2 + 120, rng.choice(item_sks))
        if user % 3 == 0:
            order_no, _ = rng.choice(web_orders)
            click(user, day, tod2 + 600, rng.choice(item_sks),
                  page=1, sale=order_no)
        # sparse noise clicks (null user sometimes)
        if user % 7 == 0:
            click(None, day, tod2 + 900, rng.choice(item_sks))
    data["web_clickstreams"] = rows

    # ---- inventory: Jan+Feb 2001; engineered high-variance pairs
    rows = []
    for w in range(1, 4):
        for isk in item_sks[:20]:
            for month, base in (("2001-01", 100), ("2001-02", 90)):
                for j, dom in enumerate((5, 12, 19, 26)):
                    high_var = (w == 1 and isk <= 6)
                    # deterministic high-variance pattern (cov ≈ 1.5) so
                    # q23 hits don't depend on the shared rng stream
                    qty = ([0, 1200, 5, 300][j] if high_var
                           else base + rng.randint(-5, 5))
                    rows.append(_row(
                        "inventory", inv_date_sk=sk(f"{month}-{dom:02d}"),
                        inv_item_sk=isk, inv_warehouse_sk=w,
                        inv_quantity_on_hand=qty))
    data["inventory"] = rows

    # ---- product_reviews: sentiment words + store names + ORG names
    rows = []
    rid = 0
    for isk in [1, 2, 3, 10, 11, 10002, 10002, 10002] + item_sks[20:40]:
        rid += 1
        senti = rng.choice(POS_WORDS + NEG_WORDS)
        store_name = rng.choice(STORE_NAMES)
        org = "Acme Corp" if isk == 10002 else "Rival Inc"
        content = (
            f"This product is {senti} and I bought it at {store_name}. "
            f"Compare with {org} products! The item is "
            f"{rng.choice(NEG_WORDS)} overall.")
        rows.append(_row(
            "product_reviews", pr_review_sk=rid,
            pr_review_date=f"2001-{(rid % 12) + 1:02d}-10",
            pr_review_time="12:00:00",
            pr_review_rating=(rid % 5) + 1, pr_item_sk=isk,
            pr_user_sk=(rid % 40) + 1, pr_order_sk=rid,
            pr_review_content=content))
    data["product_reviews"] = rows

    # ---- item_marketprices: >=4 periods for item 10000
    rows = []
    imp = 0
    for isk in (10000, 10000, 10000, 10000, 1, 2):
        imp += 1
        start = sk("2001-03-01") + imp * 40
        rows.append(_row(
            "item_marketprices", imp_sk=imp, imp_item_sk=isk,
            imp_competitor="comp", imp_competitor_price=round(2.0 + imp, 2),
            imp_start_date=start, imp_end_date=start + 30))
    data["item_marketprices"] = rows

    return {
        name: spark.createDataFrame(rows_, schema_for(name))
        for name, rows_ in data.items()
    }
