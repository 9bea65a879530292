"""TPCx-BB query results vs independent DuckDB oracles on the same fixture
data (written to parquet once, read by both engines). Comparison uses the
reference's own pseudo-equality semantics (verify.pseudo_equal: order
insensitive, ~6 significant digits) — the strongest parity statement we can
make without the official kit's golden outputs.

Covers the SQL-expressible subset; sessionization/text/ML queries are
verified semantically in test_tpcxbb.py / test_runner_verify.py.
"""

from __future__ import annotations

import duckdb
import pytest

from gpu_bdb_spark.queries.tpcxbb import Tables, tpcxbb_query
from gpu_bdb_spark.schemas import ALL_TABLES
from gpu_bdb_spark.verify import pseudo_equal

from .tpcxbb_fixture import build_fixture

from gpu_bdb_spark.queries.tpcxbb.q10_q19 import DEFAULT_NEG, DEFAULT_POS

NEG_SQL = ", ".join(f"('{w}', 'NEG')" for w in sorted(set(DEFAULT_NEG)))
POS_SQL = ", ".join(f"('{w}', 'POS')" for w in sorted(set(DEFAULT_POS)))

#: review text → (review, sentence) rows, lowercased (reference text.py)
SENTENCES_SQL = r"""
  SELECT pr_review_sk, pr_item_sk, pr_review_date,
         unnest(list_filter(list_transform(
             string_split_regex(lower(pr_review_content), '[.?!]'),
             x -> trim(x)), x -> x <> '')) AS sentence
  FROM product_reviews
  WHERE pr_review_content IS NOT NULL
"""

AMOUNT =("(ws_ext_list_price - ws_ext_wholesale_cost - ws_ext_discount_amt"
          " + ws_ext_sales_price) / 2")
SS_AMOUNT = ("(ss_ext_list_price - ss_ext_wholesale_cost - ss_ext_discount_amt"
             " + ss_ext_sales_price) / 2")

ORACLES: dict[int, tuple[str, dict]] = {
    2: ("""
WITH clicks AS (
  SELECT wcs_user_sk AS u, wcs_item_sk AS item,
         wcs_click_date_sk * 86400 + wcs_click_time_sk AS ts
  FROM web_clickstreams
  WHERE wcs_user_sk IS NOT NULL AND wcs_item_sk IS NOT NULL
),
flagged AS (
  SELECT u, item, ts,
    CASE WHEN lag(ts) OVER w IS NULL OR ts - lag(ts) OVER w > 3600
         THEN 1 ELSE 0 END AS ns
  FROM clicks WINDOW w AS (PARTITION BY u ORDER BY ts, item)
),
sess AS (
  SELECT u, item,
    SUM(ns) OVER (PARTITION BY u ORDER BY ts, item
                  ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
),
dist AS (SELECT DISTINCT u, sid, item FROM sess),
target AS (SELECT DISTINCT u, sid FROM dist WHERE item = 10001)
SELECT d.item AS item_sk_1, CAST(10001 AS BIGINT) AS item_sk_2,
       COUNT(*) AS cnt
FROM dist d JOIN target t ON d.u = t.u AND d.sid = t.sid
WHERE d.item <> 10001
GROUP BY 1
ORDER BY cnt DESC, item_sk_1 LIMIT 30
""", {}),
    4: ("""
WITH clicks AS (
  SELECT wcs_user_sk AS u,
         wcs_click_date_sk * 86400 + wcs_click_time_sk AS ts,
         wcs_web_page_sk AS wp, wp_type
  FROM web_clickstreams JOIN web_page ON wcs_web_page_sk = wp_web_page_sk
  WHERE wcs_web_page_sk IS NOT NULL AND wcs_user_sk IS NOT NULL
    AND wcs_sales_sk IS NULL
),
flagged AS (
  SELECT u, ts, wp, wp_type,
    CASE WHEN lag(ts) OVER w IS NULL OR ts - lag(ts) OVER w > 3600
         THEN 1 ELSE 0 END AS ns
  FROM clicks WINDOW w AS (PARTITION BY u ORDER BY ts, wp)
),
sess AS (
  SELECT u, ts, wp_type,
    SUM(ns) OVER (PARTITION BY u ORDER BY ts, wp
                  ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
),
per AS (
  SELECT u, sid, COUNT(*) AS pagecount,
    arg_max(CASE WHEN wp_type IN ('order','dynamic') THEN wp_type END,
            CASE WHEN wp_type IN ('order','dynamic')
                 THEN ts * 2 + CASE WHEN wp_type = 'order' THEN 1 ELSE 0 END
            END) AS last_cart_type
  FROM sess GROUP BY 1, 2
)
SELECT CAST(SUM(pagecount) AS DOUBLE) / COUNT(*) AS "sum(pagecount)/count(*)"
FROM per WHERE last_cart_type = 'dynamic'
""", {}),
    8: ("""
WITH dd AS (
  SELECT d_date_sk FROM date_dim
  WHERE CAST(d_date AS DATE) BETWEEN DATE '2001-09-02' AND DATE '2002-09-02'
),
clicks AS (
  SELECT wcs_user_sk AS u,
         wcs_click_date_sk * 86400 + wcs_click_time_sk AS ts,
         wcs_sales_sk AS sale, wp_type,
         (wp_type = 'review') AS is_review
  FROM web_clickstreams
  JOIN dd ON wcs_click_date_sk = d_date_sk
  JOIN web_page ON wcs_web_page_sk = wp_web_page_sk
  WHERE wcs_user_sk IS NOT NULL
),
w AS (
  SELECT u, ts, sale, is_review,
    MIN(CASE WHEN is_review THEN ts END) OVER (PARTITION BY u)
      AS first_review_ts,
    MAX(CASE WHEN is_review THEN ts END) OVER (
      PARTITION BY u ORDER BY ts, COALESCE(sale, 0), wp_type
      ROWS UNBOUNDED PRECEDING) AS session_start
  FROM clicks
),
rs AS (
  SELECT DISTINCT sale FROM w
  WHERE ts >= first_review_ts AND sale IS NOT NULL AND sale <> 0
    AND NOT is_review AND ts - session_start <= 259200
),
sales AS (
  SELECT ws_order_number AS o, ws_net_paid
  FROM web_sales JOIN dd ON ws_sold_date_sk = d_date_sk
)
SELECT
  CAST(trunc(CAST(COALESCE(SUM(CASE WHEN o IN (SELECT sale FROM rs)
             THEN ws_net_paid END), 0) AS DOUBLE)) AS BIGINT)
    AS q08_review_sales_amount,
  CAST(trunc(CAST(COALESCE(SUM(ws_net_paid), 0)
             - COALESCE(SUM(CASE WHEN o IN (SELECT sale FROM rs)
                        THEN ws_net_paid END), 0) AS DOUBLE)) AS BIGINT)
    AS no_q08_review_sales_amount
FROM sales
""", {}),
    15: ("""
WITH dd AS (
  SELECT d_date_sk,
         date_diff('day', DATE '1970-01-01', CAST(d_date AS DATE)) AS d_days
  FROM date_dim
  WHERE CAST(d_date AS DATE) BETWEEN DATE '2001-09-02' AND DATE '2002-09-02'
),
daily AS (
  SELECT i.i_category_id, dd.d_days,
         SUM(CAST(ss.ss_net_paid AS DECIMAL(14,4))) AS day_sum
  FROM store_sales ss
  JOIN dd ON ss.ss_sold_date_sk = dd.d_date_sk
  JOIN item i ON ss.ss_item_sk = i.i_item_sk
  WHERE ss.ss_store_sk = 10 AND i.i_category_id IS NOT NULL
  GROUP BY 1, 2
),
sums AS (
  SELECT i_category_id, COUNT(*) AS n,
    SUM(CAST(d_days AS DECIMAL(10,2))) AS sx,
    SUM(CAST(day_sum AS DECIMAL(14,4))) AS sy,
    SUM(CAST(d_days AS DECIMAL(10,2)) * CAST(day_sum AS DECIMAL(14,4))) AS sxy,
    SUM(CAST(d_days AS DECIMAL(10,2)) * CAST(d_days AS DECIMAL(10,2))) AS sxx
  FROM daily GROUP BY 1
),
fitted AS (
  SELECT i_category_id AS cat,
    ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
           - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
          / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS slope,
    ROUND((CAST(sy AS DOUBLE)
           - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
              / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
             * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 6) AS intercept
  FROM sums
)
SELECT cat, slope, intercept FROM fitted WHERE slope <= 0 ORDER BY cat
""", {}),
    30: ("""
WITH clicks AS (
  SELECT wcs_user_sk AS u, wcs_item_sk AS item, i.i_category_id AS cat,
         wcs_click_date_sk * 86400 + wcs_click_time_sk AS ts
  FROM web_clickstreams JOIN item i ON wcs_item_sk = i.i_item_sk
  WHERE wcs_user_sk IS NOT NULL AND wcs_item_sk IS NOT NULL
    AND i.i_category_id IS NOT NULL
),
flagged AS (
  SELECT u, item, cat, ts,
    CASE WHEN lag(ts) OVER w IS NULL OR ts - lag(ts) OVER w > 3600
         THEN 1 ELSE 0 END AS ns
  FROM clicks WINDOW w AS (PARTITION BY u ORDER BY ts, item)
),
sess AS (
  SELECT u, cat,
    SUM(ns) OVER (PARTITION BY u ORDER BY ts, item
                  ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
),
dist AS (SELECT DISTINCT u, sid, cat FROM sess)
SELECT a.cat AS category_id_1, b.cat AS category_id_2, COUNT(*) AS cnt
FROM dist a JOIN dist b ON a.u = b.u AND a.sid = b.sid AND a.cat < b.cat
GROUP BY 1, 2
ORDER BY cnt DESC, 1, 2 LIMIT 40
""", {}),
    3: ("""
WITH clicks AS (
  SELECT wcs_user_sk AS u, wcs_item_sk AS item, wcs_sales_sk AS sale,
         wcs_click_date_sk * 86400 + wcs_click_time_sk AS ts
  FROM web_clickstreams
  WHERE wcs_user_sk IS NOT NULL AND wcs_item_sk IS NOT NULL
),
numbered AS (
  SELECT *, row_number() OVER (PARTITION BY u ORDER BY ts, item) AS rn
  FROM clicks
),
purch AS (
  SELECT * FROM numbered WHERE sale IS NOT NULL AND item = 10001
),
pairs AS (
  SELECT p.u, v.item AS viewed
  FROM purch p JOIN numbered v
    ON v.u = p.u AND v.rn BETWEEN p.rn - 5 AND p.rn - 1
  WHERE p.ts - v.ts <= 864000
)
SELECT CAST(10001 AS BIGINT) AS purchased_item, viewed AS lastviewed_item,
       COUNT(*) AS cnt
FROM pairs JOIN item i ON viewed = i.i_item_sk
WHERE i.i_category_id IN (2, 3)
GROUP BY viewed
ORDER BY cnt DESC, lastviewed_item LIMIT 100
""", {}),
    10: (f"""
WITH sent AS ({SENTENCES_SQL}),
words AS (
  SELECT pr_item_sk, sentence,
         unnest(list_filter(string_split_regex(sentence, '\\s+'),
                            x -> x <> '')) AS word
  FROM sent WHERE pr_item_sk IS NOT NULL
),
lex(sent_word, sentiment) AS (VALUES {POS_SQL}, {NEG_SQL})
SELECT DISTINCT pr_item_sk AS item_sk, sentence AS review_sentence,
       sentiment, word AS sentiment_word
FROM words JOIN lex ON word = sent_word
ORDER BY item_sk, review_sentence, sentiment_word
""", {}),
    11: ("""
WITH dd AS (
  SELECT d_date_sk FROM date_dim
  WHERE CAST(d_date AS DATE) BETWEEN DATE '2003-01-02' AND DATE '2003-02-02'
),
sold AS (
  SELECT DISTINCT ws_item_sk FROM web_sales
  JOIN dd ON ws_sold_date_sk = d_date_sk
  WHERE ws_item_sk IS NOT NULL
),
per_item AS (
  SELECT pr_item_sk, COUNT(pr_review_rating) AS reviews_count,
         AVG(pr_review_rating) AS avg_rating
  FROM product_reviews WHERE pr_item_sk IS NOT NULL GROUP BY 1
)
SELECT corr(reviews_count, avg_rating) AS "corr(reviews_count, avg_rating)"
FROM sold JOIN per_item ON ws_item_sk = pr_item_sk
""", {}),
    18: (f"""
WITH dd AS (
  SELECT d_date_sk,
         date_diff('day', DATE '1970-01-01', CAST(d_date AS DATE)) AS d_days
  FROM date_dim
  WHERE CAST(d_date AS DATE) BETWEEN DATE '2001-05-02' AND DATE '2001-09-02'
),
daily AS (
  SELECT ss_store_sk, dd.d_days,
         SUM(CAST(ss_net_paid AS DECIMAL(14,4))) AS day_sum
  FROM store_sales JOIN dd ON ss_sold_date_sk = dd.d_date_sk
  GROUP BY 1, 2
),
sums AS (
  SELECT ss_store_sk, COUNT(*) AS n,
    SUM(CAST(d_days AS DECIMAL(10,2))) AS sx,
    SUM(CAST(day_sum AS DECIMAL(14,4))) AS sy,
    SUM(CAST(d_days AS DECIMAL(10,2)) * CAST(day_sum AS DECIMAL(14,4))) AS sxy,
    SUM(CAST(d_days AS DECIMAL(10,2)) * CAST(d_days AS DECIMAL(10,2))) AS sxx
  FROM daily GROUP BY 1
),
declining AS (
  SELECT ss_store_sk FROM sums
  WHERE ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
         - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) <= 0
),
stores AS (
  SELECT DISTINCT lower(s_store_name) AS store_name FROM store
  WHERE s_store_sk IN (SELECT ss_store_sk FROM declining)
),
sent AS ({SENTENCES_SQL}),
mentioned AS (
  SELECT st.store_name, s.pr_review_date, s.sentence
  FROM sent s JOIN stores st ON contains(s.sentence, st.store_name)
),
words AS (
  SELECT store_name, pr_review_date, sentence,
         unnest(list_filter(string_split_regex(sentence, '\\s+'),
                            x -> x <> '')) AS word
  FROM mentioned
),
lex(sent_word, sentiment) AS (VALUES {NEG_SQL})
SELECT DISTINCT store_name AS s_name, pr_review_date AS r_date, sentence,
       sentiment, word AS sentiment_word
FROM words JOIN lex ON word = sent_word
ORDER BY s_name, r_date, sentence, sentiment_word
""", {}),
    19: (f"""
WITH weeks AS (
  SELECT DISTINCT d_week_seq FROM date_dim
  WHERE d_date IN ('2001-06-10', '2001-07-10')
),
wd AS (
  SELECT d_date_sk FROM date_dim
  WHERE d_week_seq IN (SELECT d_week_seq FROM weeks)
),
sr AS (
  SELECT sr_item_sk, SUM(sr_return_quantity) AS sr_item_qty
  FROM store_returns JOIN wd ON sr_returned_date_sk = d_date_sk
  GROUP BY 1
),
wr AS (
  SELECT wr_item_sk, SUM(wr_return_quantity) AS wr_item_qty
  FROM web_returns JOIN wd ON wr_returned_date_sk = d_date_sk
  GROUP BY 1
),
balanced AS (
  SELECT sr_item_sk AS item_sk
  FROM sr JOIN wr ON sr_item_sk = wr_item_sk
  WHERE abs(sr_item_qty - wr_item_qty)
        / ((sr_item_qty + wr_item_qty) / 2.0) <= 1.0
),
sent AS ({SENTENCES_SQL}),
words AS (
  SELECT pr_item_sk, sentence,
         unnest(list_filter(string_split_regex(sentence, '\\s+'),
                            x -> x <> '')) AS word
  FROM sent WHERE pr_item_sk IN (SELECT item_sk FROM balanced)
),
lex(sent_word, sentiment) AS (VALUES {NEG_SQL})
SELECT DISTINCT pr_item_sk AS item_sk, sentence, sentiment,
       word AS sentiment_word
FROM words JOIN lex ON word = sent_word
ORDER BY item_sk, sentence, sentiment_word
""", {"return_dates": ("2001-06-10", "2001-07-10"), "tolerance": 1.0}),
    24: ("""
WITH periods AS (
  SELECT imp.imp_sk, imp.imp_start_date,
         CAST((i.i_current_price - imp.imp_competitor_price)
              / imp.imp_competitor_price AS DOUBLE) AS price_change,
         imp.imp_end_date - imp.imp_start_date AS nd
  FROM item i JOIN item_marketprices imp ON i.i_item_sk = imp.imp_item_sk
  WHERE i.i_item_sk = 10000
),
ws_day AS (
  SELECT ws_sold_date_sk AS d, SUM(ws_quantity) AS q
  FROM web_sales WHERE ws_item_sk = 10000 GROUP BY 1
),
ss_day AS (
  SELECT ss_sold_date_sk AS d, SUM(ss_quantity) AS q
  FROM store_sales WHERE ss_item_sk = 10000 GROUP BY 1
),
w AS (
  SELECT p.imp_sk, p.imp_start_date, p.price_change,
    COALESCE(SUM(CASE WHEN wd.d >= p.imp_start_date
             AND wd.d < p.imp_start_date + p.nd THEN wd.q ELSE 0 END), 0)
      AS current_ws_quant,
    COALESCE(SUM(CASE WHEN wd.d >= p.imp_start_date - p.nd
             AND wd.d < p.imp_start_date THEN wd.q ELSE 0 END), 0)
      AS prev_ws_quant
  FROM periods p LEFT JOIN ws_day wd ON TRUE
  GROUP BY 1, 2, 3
),
s AS (
  SELECT p.imp_sk, p.imp_start_date, p.price_change,
    COALESCE(SUM(CASE WHEN sd.d >= p.imp_start_date
             AND sd.d < p.imp_start_date + p.nd THEN sd.q ELSE 0 END), 0)
      AS current_ss_quant,
    COALESCE(SUM(CASE WHEN sd.d >= p.imp_start_date - p.nd
             AND sd.d < p.imp_start_date THEN sd.q ELSE 0 END), 0)
      AS prev_ss_quant
  FROM periods p LEFT JOIN ss_day sd ON TRUE
  GROUP BY 1, 2, 3
),
m AS (
  SELECT w.imp_sk, w.price_change,
         w.current_ws_quant, w.prev_ws_quant,
         s.current_ss_quant, s.prev_ss_quant
  FROM w JOIN s ON w.imp_sk = s.imp_sk
)
SELECT CAST(10000 AS BIGINT) AS ws_item_sk,
  AVG(CASE WHEN (prev_ss_quant + prev_ws_quant) * price_change <> 0
      THEN CAST(current_ss_quant + current_ws_quant
                - prev_ss_quant - prev_ws_quant AS DOUBLE)
           / ((prev_ss_quant + prev_ws_quant) * price_change)
      END) AS cross_price_elasticity
FROM m
""", {}),
    1: ("""
WITH baskets AS (
  SELECT DISTINCT ss.ss_ticket_number, ss.ss_item_sk
  FROM store_sales ss JOIN item i ON ss.ss_item_sk = i.i_item_sk
  WHERE ss.ss_store_sk IN (10,20,33,40,50) AND i.i_category_id IN (1,2,3)
)
SELECT a.ss_item_sk AS item_sk_1, b.ss_item_sk AS item_sk_2, COUNT(*) AS cnt
FROM baskets a JOIN baskets b
  ON a.ss_ticket_number = b.ss_ticket_number AND a.ss_item_sk < b.ss_item_sk
GROUP BY 1, 2
""", {"min_count": 0, "limit": 10_000}),
    6: ("""
WITH ws_y AS (
  SELECT ws_bill_customer_sk AS customer_sk,
    CAST(SUM(CASE WHEN d_year = 2001 THEN {A} ELSE 0 END) AS DOUBLE) AS wf,
    CAST(SUM(CASE WHEN d_year = 2002 THEN {A} ELSE 0 END) AS DOUBLE) AS ws2
  FROM web_sales JOIN date_dim ON ws_sold_date_sk = d_date_sk
  WHERE d_year IN (2001, 2002) GROUP BY 1
),
ss_y AS (
  SELECT ss_customer_sk AS customer_sk,
    CAST(SUM(CASE WHEN d_year = 2001 THEN {S} ELSE 0 END) AS DOUBLE) AS sf,
    CAST(SUM(CASE WHEN d_year = 2002 THEN {S} ELSE 0 END) AS DOUBLE) AS ss2
  FROM store_sales JOIN date_dim ON ss_sold_date_sk = d_date_sk
  WHERE d_year IN (2001, 2002) GROUP BY 1
)
SELECT w.ws2 / w.wf AS web_sales_increase_ratio,
       c.c_customer_sk, c.c_first_name, c.c_last_name,
       c.c_preferred_cust_flag, c.c_birth_country, c.c_login,
       c.c_email_address
FROM ws_y w JOIN ss_y s ON w.customer_sk = s.customer_sk
JOIN customer c ON w.customer_sk = c.c_customer_sk
WHERE w.wf > 0 AND s.sf > 0
ORDER BY web_sales_increase_ratio DESC, c.c_customer_sk
LIMIT 100
""".replace("{A}", AMOUNT).replace("{S}", SS_AMOUNT), {}),
    7: ("""
WITH avg_p AS (
  SELECT i_category, AVG(i_current_price) AS ap FROM item GROUP BY 1
),
pricey AS (
  SELECT i.i_item_sk FROM item i JOIN avg_p a ON i.i_category = a.i_category
  WHERE i.i_current_price > a.ap * 1.2
)
SELECT ca.ca_state, COUNT(*) AS cnt
FROM store_sales ss
JOIN date_dim d ON ss.ss_sold_date_sk = d.d_date_sk
 AND d.d_year = 2004 AND d.d_moy = 7
JOIN pricey p ON ss.ss_item_sk = p.i_item_sk
JOIN customer c ON ss.ss_customer_sk = c.c_customer_sk
JOIN customer_address ca ON c.c_current_addr_sk = ca.ca_address_sk
WHERE ca.ca_state IS NOT NULL
GROUP BY 1 HAVING COUNT(*) >= 1
ORDER BY cnt DESC, ca_state LIMIT 10
""", {"having_count": 1}),
    9: ("""
SELECT CAST(SUM(ss_quantity) AS BIGINT) AS "sum(ss_quantity)"
FROM store_sales ss
JOIN date_dim d ON ss.ss_sold_date_sk = d.d_date_sk AND d.d_year = 2001
JOIN customer_demographics cd ON ss.ss_cdemo_sk = cd.cd_demo_sk
JOIN customer_address ca ON ss.ss_addr_sk = ca.ca_address_sk
WHERE (
 (cd.cd_marital_status = 'M' AND cd.cd_education_status = '4 yr Degree'
  AND ss.ss_sales_price BETWEEN 100 AND 150
  AND ca.ca_country = 'United States' AND ca.ca_state IN ('KY','GA','NM')
  AND ss.ss_net_profit BETWEEN 0 AND 2000)
 OR
 (cd.cd_marital_status = 'M' AND cd.cd_education_status = '4 yr Degree'
  AND ss.ss_sales_price BETWEEN 50 AND 200
  AND ca.ca_country = 'United States' AND ca.ca_state IN ('MT','OR','IN')
  AND ss.ss_net_profit BETWEEN 150 AND 3000)
 OR
 (cd.cd_marital_status = 'M' AND cd.cd_education_status = '4 yr Degree'
  AND ss.ss_sales_price BETWEEN 150 AND 200
  AND ca.ca_country = 'United States' AND ca.ca_state IN ('WI','MO','WV')
  AND ss.ss_net_profit BETWEEN 50 AND 25000)
)
""", {}),
    12: ("""
WITH cat_items AS (
  SELECT i_item_sk FROM item WHERE i_category IN ('Books','Electronics')
),
clicks AS (
  SELECT DISTINCT wcs_user_sk, wcs_click_date_sk
  FROM web_clickstreams
  WHERE wcs_user_sk IS NOT NULL AND wcs_item_sk IS NOT NULL
    AND wcs_sales_sk IS NULL
    AND wcs_click_date_sk BETWEEN 37134 AND 37164
    AND wcs_item_sk IN (SELECT i_item_sk FROM cat_items)
),
sales AS (
  SELECT DISTINCT ss_customer_sk, ss_sold_date_sk
  FROM store_sales
  WHERE ss_customer_sk IS NOT NULL
    AND ss_sold_date_sk BETWEEN 37134 AND 37224
    AND ss_item_sk IN (SELECT i_item_sk FROM cat_items)
)
SELECT DISTINCT c.wcs_user_sk
FROM clicks c JOIN sales s
  ON c.wcs_user_sk = s.ss_customer_sk
 AND c.wcs_click_date_sk < s.ss_sold_date_sk
ORDER BY wcs_user_sk
""", {}),
    13: ("""
WITH s AS (
  SELECT ss_customer_sk AS c_customer_sk,
    CAST(SUM(CASE WHEN d_year = 2001 THEN ss_net_paid ELSE 0 END) AS DOUBLE) AS f,
    CAST(SUM(CASE WHEN d_year = 2002 THEN ss_net_paid ELSE 0 END) AS DOUBLE) AS s2
  FROM store_sales JOIN date_dim ON ss_sold_date_sk = d_date_sk
  WHERE d_year IN (2001, 2002) GROUP BY 1 HAVING SUM(CASE WHEN d_year = 2001 THEN ss_net_paid ELSE 0 END) > 0
),
w AS (
  SELECT ws_bill_customer_sk AS c_customer_sk,
    CAST(SUM(CASE WHEN d_year = 2001 THEN ws_net_paid ELSE 0 END) AS DOUBLE) AS f,
    CAST(SUM(CASE WHEN d_year = 2002 THEN ws_net_paid ELSE 0 END) AS DOUBLE) AS s2
  FROM web_sales JOIN date_dim ON ws_sold_date_sk = d_date_sk
  WHERE d_year IN (2001, 2002) GROUP BY 1 HAVING SUM(CASE WHEN d_year = 2001 THEN ws_net_paid ELSE 0 END) > 0
)
SELECT s.c_customer_sk, c.c_first_name, c.c_last_name,
       s.s2 / s.f AS "storeSalesIncreaseRatio",
       w.s2 / w.f AS "webSalesIncreaseRatio"
FROM s JOIN w ON s.c_customer_sk = w.c_customer_sk
JOIN customer c ON s.c_customer_sk = c.c_customer_sk
WHERE w.s2 / w.f > s.s2 / s.f
ORDER BY "webSalesIncreaseRatio" DESC, s.c_customer_sk, c.c_first_name,
         c.c_last_name
LIMIT 100
""", {}),
    14: ("""
WITH j AS (
  SELECT t.t_hour
  FROM web_sales ws
  JOIN household_demographics hd
    ON ws.ws_ship_hdemo_sk = hd.hd_demo_sk AND hd.hd_dep_count = 5
  JOIN web_page wp
    ON ws.ws_web_page_sk = wp.wp_web_page_sk
   AND wp.wp_char_count BETWEEN 5000 AND 6000
  JOIN time_dim t ON ws.ws_sold_time_sk = t.t_time_sk
)
SELECT CASE WHEN SUM(CASE WHEN t_hour BETWEEN 19 AND 20 THEN 1 ELSE 0 END) > 0
  THEN CAST(SUM(CASE WHEN t_hour BETWEEN 7 AND 8 THEN 1 ELSE 0 END) AS DOUBLE)
       / SUM(CASE WHEN t_hour BETWEEN 19 AND 20 THEN 1 ELSE 0 END)
  ELSE -1.0 END AS am_pm_ratio
FROM j
""", {}),
    16: ("""
WITH dd AS (
  SELECT d_date_sk,
         date_diff('day', DATE '1970-01-01', CAST(d_date AS DATE)) AS d_days
  FROM date_dim
  WHERE date_diff('day', DATE '1970-01-01', CAST(d_date AS DATE))
        BETWEEN date_diff('day', DATE '1970-01-01', DATE '2001-03-16') - 30
            AND date_diff('day', DATE '1970-01-01', DATE '2001-03-16') + 30
)
SELECT w.w_state, i.i_item_id,
  CAST(SUM(CASE WHEN dd.d_days < date_diff('day', DATE '1970-01-01', DATE '2001-03-16')
       THEN ws.ws_sales_price - COALESCE(wr.wr_refunded_cash, 0) ELSE 0 END)
       AS DOUBLE) AS sales_before,
  CAST(SUM(CASE WHEN dd.d_days >= date_diff('day', DATE '1970-01-01', DATE '2001-03-16')
       THEN ws.ws_sales_price - COALESCE(wr.wr_refunded_cash, 0) ELSE 0 END)
       AS DOUBLE) AS sales_after
FROM web_sales ws
JOIN dd ON ws.ws_sold_date_sk = dd.d_date_sk
LEFT JOIN web_returns wr
  ON ws.ws_order_number = wr.wr_order_number AND ws.ws_item_sk = wr.wr_item_sk
JOIN item i ON ws.ws_item_sk = i.i_item_sk
JOIN warehouse w ON ws.ws_warehouse_sk = w.w_warehouse_sk
GROUP BY 1, 2
ORDER BY 1, 2 LIMIT 100
""", {}),
    17: ("""
WITH f AS (
  SELECT COALESCE(p.p_channel_email, 'None') AS e,
         COALESCE(p.p_channel_dmail, 'None') AS dm,
         COALESCE(p.p_channel_tv, 'None') AS tv,
         ss.ss_ext_sales_price AS price
  FROM store_sales ss
  JOIN date_dim d ON ss.ss_sold_date_sk = d.d_date_sk
   AND d.d_year = 2001 AND d.d_moy = 12
  JOIN promotion p ON ss.ss_promo_sk = p.p_promo_sk
  JOIN customer c ON ss.ss_customer_sk = c.c_customer_sk
  WHERE ss.ss_store_sk IN
      (SELECT s_store_sk FROM store WHERE s_gmt_offset = -5.0)
    AND c.c_current_addr_sk IN
      (SELECT ca_address_sk FROM customer_address WHERE ca_gmt_offset = -5.0)
),
g AS (
  SELECT e, dm, tv, CAST(SUM(price) AS DOUBLE) AS total FROM f GROUP BY 1, 2, 3
)
SELECT CAST(SUM(CASE WHEN dm = 'Y' OR e = 'Y' OR tv = 'Y' THEN total
                ELSE 0 END) AS DOUBLE) AS promotional,
       CAST(SUM(total) AS DOUBLE) AS total,
       CASE WHEN SUM(total) > 0
            THEN SUM(CASE WHEN dm = 'Y' OR e = 'Y' OR tv = 'Y' THEN total
                     ELSE 0 END) * 100.0 / SUM(total)
            ELSE 0.0 END AS promo_percent
FROM g
""", {}),
    21: ("""
SELECT i.i_item_id, i.i_item_desc, st.s_store_id, st.s_store_name,
  CAST(SUM(ss.ss_quantity) AS BIGINT) AS store_sales_quantity,
  CAST(SUM(sr.sr_return_quantity) AS BIGINT) AS store_returns_quantity,
  CAST(SUM(ws.ws_quantity) AS BIGINT) AS web_sales_quantity
FROM store_sales ss
JOIN date_dim d1 ON ss.ss_sold_date_sk = d1.d_date_sk
 AND d1.d_year = 2003 AND d1.d_moy = 1
JOIN store_returns sr
  ON ss.ss_item_sk = sr.sr_item_sk AND ss.ss_customer_sk = sr.sr_customer_sk
 AND ss.ss_ticket_number = sr.sr_ticket_number
JOIN date_dim d2 ON sr.sr_returned_date_sk = d2.d_date_sk
 AND d2.d_year = 2003 AND d2.d_moy BETWEEN 1 AND 7
JOIN web_sales ws
  ON sr.sr_item_sk = ws.ws_item_sk
 AND sr.sr_customer_sk = ws.ws_bill_customer_sk
JOIN date_dim d3 ON ws.ws_sold_date_sk = d3.d_date_sk
 AND d3.d_year BETWEEN 2003 AND 2005
JOIN store st ON ss.ss_store_sk = st.s_store_sk
JOIN item i ON ss.ss_item_sk = i.i_item_sk
GROUP BY 1, 2, 3, 4
ORDER BY 1, 2, 3, 4 LIMIT 100
""", {}),
    22: ("""
WITH dd AS (
  SELECT d_date_sk,
         date_diff('day', DATE '1970-01-01', CAST(d_date AS DATE)) AS d_days
  FROM date_dim
),
pvt AS (SELECT date_diff('day', DATE '1970-01-01', DATE '2001-02-01') AS p)
SELECT w.w_warehouse_name, i.i_item_id,
  CAST(SUM(CASE WHEN dd.d_days < pvt.p THEN inv.inv_quantity_on_hand
           ELSE 0 END) AS BIGINT) AS inv_before,
  CAST(SUM(CASE WHEN dd.d_days >= pvt.p THEN inv.inv_quantity_on_hand
           ELSE 0 END) AS BIGINT) AS inv_after
FROM inventory inv
JOIN dd ON inv.inv_date_sk = dd.d_date_sk
CROSS JOIN pvt
JOIN item i ON inv.inv_item_sk = i.i_item_sk
 AND i.i_current_price BETWEEN 0.98 AND 1.5
JOIN warehouse w ON inv.inv_warehouse_sk = w.w_warehouse_sk
WHERE dd.d_days BETWEEN pvt.p - 30 AND pvt.p + 30
GROUP BY 1, 2
HAVING SUM(CASE WHEN dd.d_days < pvt.p THEN inv.inv_quantity_on_hand
           ELSE 0 END) > 0
   AND CAST(SUM(CASE WHEN dd.d_days >= pvt.p THEN inv.inv_quantity_on_hand
            ELSE 0 END) AS DOUBLE)
       / SUM(CASE WHEN dd.d_days < pvt.p THEN inv.inv_quantity_on_hand
             ELSE 0 END) BETWEEN 2.0/3.0 AND 3.0/2.0
ORDER BY 1, 2 LIMIT 100
""", {"pivot_date": "2001-02-01"}),
    23: ("""
WITH cov AS (
  SELECT inv_warehouse_sk, inv_item_sk, d_moy,
         AVG(inv_quantity_on_hand) AS m,
         STDDEV_SAMP(inv_quantity_on_hand) AS s
  FROM inventory JOIN date_dim ON inv_date_sk = d_date_sk
  WHERE d_year = 2001 AND d_moy BETWEEN 1 AND 2
  GROUP BY 1, 2, 3
  HAVING AVG(inv_quantity_on_hand) > 0
     AND STDDEV_SAMP(inv_quantity_on_hand) / AVG(inv_quantity_on_hand) >= 1.3
)
SELECT a.inv_warehouse_sk, a.inv_item_sk, a.d_moy,
       a.s / a.m AS cov, b.s / b.m AS cov_consecutive
FROM cov a JOIN cov b
  ON a.inv_warehouse_sk = b.inv_warehouse_sk
 AND a.inv_item_sk = b.inv_item_sk
WHERE a.d_moy = 1 AND b.d_moy = 2
ORDER BY 1, 2
""", {}),
    29: ("""
WITH baskets AS (
  SELECT DISTINCT ws.ws_order_number, i.i_category_id
  FROM web_sales ws JOIN item i ON ws.ws_item_sk = i.i_item_sk
  WHERE i.i_category_id IS NOT NULL
)
SELECT a.i_category_id AS category_id_1, b.i_category_id AS category_id_2,
       COUNT(*) AS cnt
FROM baskets a JOIN baskets b
  ON a.ws_order_number = b.ws_order_number
 AND a.i_category_id < b.i_category_id
GROUP BY 1, 2
ORDER BY cnt DESC, 1, 2 LIMIT 100
""", {}),
}


@pytest.fixture(scope="module")
def ducked(spark, tmp_path_factory):
    """Fixture written to parquet once; DuckDB views + Spark Tables over
    the SAME files."""
    frames = build_fixture(spark)
    data_dir = str(tmp_path_factory.mktemp("tpcxbb_oracle"))
    con = duckdb.connect()
    for name in ALL_TABLES:
        frames[name].coalesce(1).write.mode("overwrite").parquet(
            f"{data_dir}/{name}")
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"parquet_scan('{data_dir}/{name}/*.parquet')")
    tables = Tables(spark, data_dir=data_dir)
    yield tables, con
    con.close()


@pytest.mark.parametrize("n", sorted(ORACLES))
def test_tpcxbb_vs_duckdb_oracle(n, spark, ducked):
    tables, con = ducked
    sql, overrides = ORACLES[n]
    got = tpcxbb_query(n)(spark, tables, **overrides).toPandas()
    expected = con.execute(sql).df()
    assert pseudo_equal(got, expected), (
        f"q{n}: spark {len(got)} rows vs oracle {len(expected)} rows\n"
        f"spark:\n{got.head(10)}\noracle:\n{expected.head(10)}")


#: feature-frame oracles for the ML queries' deterministic ETL half
FEATURE_ORACLES: dict[int, tuple[str, dict]] = {
    5: ("""
WITH clicks AS (
  SELECT wcs_user_sk, i_category, i_category_id
  FROM web_clickstreams JOIN item ON wcs_item_sk = i_item_sk
  WHERE wcs_user_sk IS NOT NULL AND wcs_item_sk IS NOT NULL
),
per_user AS (
  SELECT wcs_user_sk,
    {cat_counts}
  FROM clicks GROUP BY 1
),
cic AS (
  SELECT wcs_user_sk, COUNT(*) AS clicks_in_category
  FROM clicks WHERE i_category = 'Books' GROUP BY 1
),
feats AS (
  SELECT p.*,
         COALESCE(c.clicks_in_category, 0) AS clicks_in_category,
         CASE WHEN cd_education_status IN
              ('Advanced Degree', 'College', '4 yr Degree', '2 yr Degree')
              THEN 1.0 ELSE 0.0 END AS college_education,
         CASE WHEN cd_gender = 'M' THEN 1.0 ELSE 0.0 END AS male
  FROM per_user p
  LEFT JOIN cic c USING (wcs_user_sk)
  JOIN customer cu ON p.wcs_user_sk = cu.c_customer_sk
  JOIN customer_demographics d ON cu.c_current_cdemo_sk = d.cd_demo_sk
)
SELECT *, CASE WHEN clicks_in_category >
                    (SELECT AVG(clicks_in_category) FROM feats)
               THEN 1.0 ELSE 0.0 END AS label
FROM feats
""".format(cat_counts=",\n    ".join(
        f'COUNT(*) FILTER (WHERE i_category_id = {c}) AS "{c}"'
        for c in range(1, 8))), {}),
    28: ("""
SELECT pr_review_sk,
       CASE WHEN pr_review_rating < 3 THEN 'NEG'
            WHEN pr_review_rating = 3 THEN 'NEUT'
            ELSE 'POS' END AS sentiment,
       CAST(len(toks) AS BIGINT) AS n_tokens,
       list_aggregate(toks, 'string_agg', ' ') AS token_str
FROM (
  SELECT pr_review_sk, pr_review_rating,
         list_filter(string_split_regex(lower(pr_review_content), '\\s+'),
                     x -> x <> '') AS toks
  FROM product_reviews
  WHERE pr_review_content IS NOT NULL AND pr_review_rating IS NOT NULL
)
""", {}),
    20: ("""
WITH o AS (
  SELECT ss_customer_sk AS user_sk,
         COUNT(DISTINCT ss_ticket_number) AS orders_count,
         COUNT(ss_item_sk) AS orders_items,
         CAST(SUM(ss_net_paid) AS DOUBLE) AS orders_money
  FROM store_sales WHERE ss_customer_sk IS NOT NULL GROUP BY 1
),
r AS (
  SELECT sr_customer_sk AS user_sk,
         COUNT(DISTINCT sr_ticket_number) AS returns_count,
         COUNT(sr_item_sk) AS returns_items,
         CAST(SUM(sr_return_amt) AS DOUBLE) AS returns_money
  FROM store_returns WHERE sr_customer_sk IS NOT NULL GROUP BY 1
)
SELECT o.user_sk,
  CASE WHEN o.orders_count <> 0
       THEN CAST(COALESCE(r.returns_count, 0) AS DOUBLE) / o.orders_count
       ELSE 0.0 END AS "orderRatio",
  CASE WHEN o.orders_items <> 0
       THEN CAST(COALESCE(r.returns_items, 0) AS DOUBLE) / o.orders_items
       ELSE 0.0 END AS "itemsRatio",
  CASE WHEN o.orders_money <> 0
       THEN COALESCE(r.returns_money, 0.0) / o.orders_money
       ELSE 0.0 END AS "monetaryRatio",
  CAST(COALESCE(r.returns_count, 0) AS DOUBLE) AS frequency
FROM o LEFT JOIN r ON o.user_sk = r.user_sk
""", {}),
    25: ("""
WITH dd AS (
  SELECT d_date_sk FROM date_dim WHERE CAST(d_date AS DATE) > DATE '2002-01-02'
),
ch AS (
  SELECT ss_customer_sk AS cid, MAX(ss_sold_date_sk) AS mrd,
         COUNT(DISTINCT ss_ticket_number) AS freq,
         CAST(SUM(ss_net_paid) AS DOUBLE) AS amount
  FROM store_sales JOIN dd ON ss_sold_date_sk = d_date_sk
  WHERE ss_customer_sk IS NOT NULL GROUP BY 1
  UNION ALL
  SELECT ws_bill_customer_sk, MAX(ws_sold_date_sk),
         COUNT(DISTINCT ws_order_number),
         CAST(SUM(ws_net_paid) AS DOUBLE)
  FROM web_sales JOIN dd ON ws_sold_date_sk = d_date_sk
  WHERE ws_bill_customer_sk IS NOT NULL GROUP BY 1
)
SELECT cid,
  CAST(CASE WHEN 37621 - MAX(mrd) < 60 THEN 1 ELSE 0 END AS DOUBLE)
    AS recency,
  CAST(CAST(SUM(freq) AS BIGINT) AS DOUBLE) AS frequency,
  SUM(amount) AS amount
FROM ch GROUP BY cid
""", {}),
    26: ("""
WITH j AS (
  SELECT ss_customer_sk, i_class_id
  FROM store_sales JOIN item ON ss_item_sk = i_item_sk
  WHERE ss_customer_sk IS NOT NULL AND i_category = 'Books'
),
piv AS (
  SELECT ss_customer_sk,
    {cols}
  FROM j GROUP BY 1
)
SELECT * EXCLUDE (total) FROM (
  SELECT ss_customer_sk, {ids}, ({total}) AS total FROM piv
) WHERE total > 5
""".format(
        cols=",\n    ".join(
            f"CAST(COUNT(*) FILTER (WHERE i_class_id = {c}) AS DOUBLE) AS c{c}"
            for c in range(1, 16)),
        ids=", ".join(f"c{c} AS id{c}" for c in range(1, 16)),
        total=" + ".join(f"c{c}" for c in range(1, 16)),
    ), {}),
}


@pytest.mark.parametrize("n", sorted(FEATURE_ORACLES))
def test_ml_feature_frames_vs_duckdb_oracle(n, spark, ducked):
    tables, con = ducked
    sql, overrides = FEATURE_ORACLES[n]
    got = tpcxbb_query(n)(spark, tables, features_only=True,
                          **overrides).toPandas()
    expected = con.execute(sql).df()
    assert pseudo_equal(got, expected), (
        f"q{n} features: {len(got)} vs {len(expected)} rows\n"
        f"{got.head()}\n{expected.head()}")


#: q22 templated by (pivot_date, price band) — the sweep asserts the
#: PARAMETER surface (reference queries take CLI params; one fixed oracle
#: would leave param plumbing untested).
Q22_SWEEP_SQL = """
WITH dd AS (
  SELECT d_date_sk,
         date_diff('day', DATE '1970-01-01', CAST(d_date AS DATE)) AS d_days
  FROM date_dim
),
pvt AS (SELECT date_diff('day', DATE '1970-01-01', DATE '{pivot}') AS p)
SELECT w.w_warehouse_name, i.i_item_id,
  CAST(SUM(CASE WHEN dd.d_days < pvt.p THEN inv.inv_quantity_on_hand
           ELSE 0 END) AS BIGINT) AS inv_before,
  CAST(SUM(CASE WHEN dd.d_days >= pvt.p THEN inv.inv_quantity_on_hand
           ELSE 0 END) AS BIGINT) AS inv_after
FROM inventory inv
JOIN dd ON inv.inv_date_sk = dd.d_date_sk
CROSS JOIN pvt
JOIN item i ON inv.inv_item_sk = i.i_item_sk
 AND i.i_current_price BETWEEN {lo} AND {hi}
JOIN warehouse w ON inv.inv_warehouse_sk = w.w_warehouse_sk
WHERE dd.d_days BETWEEN pvt.p - 30 AND pvt.p + 30
GROUP BY 1, 2
HAVING SUM(CASE WHEN dd.d_days < pvt.p THEN inv.inv_quantity_on_hand
           ELSE 0 END) > 0
   AND CAST(SUM(CASE WHEN dd.d_days >= pvt.p THEN inv.inv_quantity_on_hand
            ELSE 0 END) AS DOUBLE)
       / SUM(CASE WHEN dd.d_days < pvt.p THEN inv.inv_quantity_on_hand
             ELSE 0 END) BETWEEN 2.0/3.0 AND 3.0/2.0
ORDER BY 1, 2 LIMIT 100
"""

#: pivots inside the fixture's inventory window (Jan–Feb 2001) with
#: distinct price bands; the driver-testdata datagen separately covers
#: the q22 DEFAULT window (test_datagen.py)
Q22_SWEEP = [
    ("2001-02-01", 0.90, 1.20),
    ("2001-01-28", 0.98, 1.50),
    ("2001-02-05", 1.00, 2.50),
]


@pytest.mark.parametrize("pivot,lo,hi", Q22_SWEEP)
def test_q22_param_sweep_vs_oracle(pivot, lo, hi, spark, ducked):
    tables, con = ducked
    got = tpcxbb_query(22)(
        spark, tables, pivot_date=pivot, price_min=lo, price_max=hi
    ).toPandas()
    expected = con.execute(
        Q22_SWEEP_SQL.format(pivot=pivot, lo=lo, hi=hi)).df()
    assert len(expected) > 0, f"vacuous sweep point {pivot} [{lo},{hi}]"
    assert pseudo_equal(got, expected), (
        f"q22@{pivot}[{lo},{hi}]: {len(got)} vs {len(expected)} rows")
