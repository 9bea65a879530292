"""Smoke + semantic checks for the 30 TPCx-BB queries on the tiny
deterministic fixture (tpcxbb_fixture.py).

Every query must execute and return its documented shape; queries whose
fixture engineering guarantees hits additionally assert non-empty results
or known invariants. ML payloads are checked metric-wise (reference policy,
utils.py:517-581).
"""

from __future__ import annotations

import pytest
from pyspark.sql import DataFrame

from gpu_bdb_spark.queries.tpcxbb import Tables, tpcxbb_query

from .tpcxbb_fixture import build_fixture

#: expected output columns for DataFrame-returning queries
EXPECTED_COLS = {
    1: ["item_sk_1", "item_sk_2", "cnt"],
    2: ["item_sk_1", "item_sk_2", "cnt"],
    3: ["purchased_item", "lastviewed_item", "cnt"],
    4: ["sum(pagecount)/count(*)"],
    6: None, 7: ["ca_state", "cnt"],
    8: ["q08_review_sales_amount", "no_q08_review_sales_amount"],
    9: ["sum(ss_quantity)"],
    10: ["item_sk", "review_sentence", "sentiment", "sentiment_word"],
    11: ["corr(reviews_count, avg_rating)"],
    12: ["wcs_user_sk"], 13: None, 14: ["am_pm_ratio"],
    15: ["cat", "slope", "intercept"],
    16: ["w_state", "i_item_id", "sales_before", "sales_after"],
    17: ["promotional", "total", "promo_percent"],
    18: ["s_name", "r_date", "sentence", "sentiment", "sentiment_word"],
    19: ["item_sk", "sentence", "sentiment", "sentiment_word"],
    21: None, 22: ["w_warehouse_name", "i_item_id", "inv_before", "inv_after"],
    23: ["inv_warehouse_sk", "inv_item_sk", "d_moy", "cov", "cov_consecutive"],
    24: ["ws_item_sk", "cross_price_elasticity"],
    27: ["pr_review_sk", "pr_item_sk", "company_name", "sentence"],
    29: ["category_id_1", "category_id_2", "cnt"],
    30: ["category_id_1", "category_id_2", "cnt"],
}

#: queries the fixture engineers to be non-empty
NONEMPTY = {1, 2, 4, 7, 9, 10, 11, 12, 14, 16, 17, 19, 22, 23, 24, 27, 29, 30}

ML_QUERIES = {5, 20, 25, 26, 28}


@pytest.fixture(scope="module")
def tables(spark):
    return Tables(spark, frames=build_fixture(spark))


#: parameter overrides sized for the tiny fixture (reference defaults are
#: SF1000-scale thresholds/dates; the fixture spans 2001-2004 with ~1k facts)
PARAM_OVERRIDES: dict[int, dict] = {
    1: {"min_count": 0},
    7: {"having_count": 1},
    19: {"return_dates": ("2001-06-10", "2001-07-10"), "tolerance": 1.0},
    22: {"pivot_date": "2001-02-01"},
}


@pytest.mark.parametrize("n", sorted(set(range(1, 31)) - ML_QUERIES))
def test_tpcxbb_query_runs(n, spark, tables):
    result = tpcxbb_query(n)(spark, tables, **PARAM_OVERRIDES.get(n, {}))
    assert isinstance(result, DataFrame)
    cols = EXPECTED_COLS.get(n)
    if cols:
        assert result.columns == cols, f"q{n}: {result.columns}"
    rows = result.collect()
    if n in NONEMPTY:
        assert rows, f"q{n} expected non-empty result on fixture"


@pytest.mark.parametrize("n", sorted(ML_QUERIES))
def test_tpcxbb_ml_query_payloads(n, spark, tables):
    payload = tpcxbb_query(n)(spark, tables)
    assert isinstance(payload, dict)
    if n in (20, 25, 26):
        labels = payload["labels"].collect()
        assert payload["wssse"] >= 0.0
        assert len(labels) > 0
        assert len({r.cluster for r in labels}) <= 8
    elif n == 5:
        assert payload["metrics"].collect()[0].auc >= 0.0
    elif n == 28:
        assert 0.0 <= payload["accuracy"] <= 1.0
        assert payload["predictions"].count() >= 0


def test_q02_pairs_items_with_target(spark, tables):
    rows = tpcxbb_query(2)(spark, tables).collect()
    assert all(r.item_sk_2 == 10001 for r in rows)
    assert all(r.item_sk_1 != 10001 for r in rows)


def test_q23_cov_months_are_consecutive(spark, tables):
    rows = tpcxbb_query(23)(spark, tables).collect()
    assert rows, "fixture engineered high-variance inventory pairs"
    assert all(r.d_moy == 1 for r in rows)
    assert all(r.cov >= 1.3 and r.cov_consecutive >= 1.3 for r in rows)


def test_tables_from_parquet_data_dir(spark, tables, tmp_path_factory):
    """The production Tables path: fixture written as parquet in the
    reference layout ({data_dir}/{table}/), read back with explicit
    schemas, and a query produces identical results to the in-memory
    path."""
    data_dir = str(tmp_path_factory.mktemp("tpcxbb_parquet"))
    for name in ("store_sales", "item", "date_dim", "customer",
                 "customer_address"):
        tables(name, broadcast=False).write.mode("overwrite").parquet(
            f"{data_dir}/{name}")
    pq_tables = Tables(spark, data_dir=data_dir)
    mem = tpcxbb_query(7)(spark, tables, having_count=1).collect()
    pq = tpcxbb_query(7)(spark, pq_tables, having_count=1).collect()
    assert sorted(map(tuple, mem)) == sorted(map(tuple, pq))


def test_pair_counts_variants_agree(spark, tables):
    from gpu_bdb_spark.operators.pairs import pair_counts, pair_counts_compact

    ss = tables("store_sales", ["ss_ticket_number", "ss_item_sk"],
                broadcast=False)
    a = {(r.item_sk_1, r.item_sk_2, r.cnt) for r in pair_counts(
        ss, "ss_ticket_number", "ss_item_sk", "item_sk").collect()}
    b = {(r.item_sk_1, r.item_sk_2, r.cnt) for r in pair_counts_compact(
        ss, "ss_ticket_number", "ss_item_sk", "item_sk").collect()}
    assert a == b and a


def test_q27_bert_variant_matches_q27_fallback(spark, tables):
    """The BERT-variant NER (reference q27_bert_utils.py shape) without
    transformers installed applies the same heuristic as q27 through the
    streaming mapInPandas plumbing — outputs must agree exactly."""
    from gpu_bdb_spark.queries.tpcxbb.q20_q30 import q27_bert

    base = tpcxbb_query(27)(spark, tables).collect()
    bert = q27_bert(spark, tables).collect()
    assert sorted(map(tuple, bert)) == sorted(map(tuple, base))
    assert len(bert) > 0
