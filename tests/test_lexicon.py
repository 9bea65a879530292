"""Realistic-scale sentiment lexicons for the text family (q10/q18/q19).

The reference ships external word-list files of a few thousand words
(reference q10:35-44, README.md:37-44) that are not redistributed here;
the queries default to a 10-word built-in. These tests run the same
pipeline with a ~1.5k-word-per-side deterministic lexicon — including
words that actually occur in review text, so the join fan-out is real —
and assert (a) exact oracle parity vs DuckDB with the identical lexicon,
(b) the lexicon join stays broadcast at that size, (c) the
`sources.load_word_list` file path feeds the same pipeline.
"""

from __future__ import annotations

import duckdb
import pytest

from gpu_bdb_spark.queries.tpcxbb import Tables, tpcxbb_query
from gpu_bdb_spark.schemas import ALL_TABLES
from gpu_bdb_spark.sources import load_word_list
from gpu_bdb_spark.verify import pseudo_equal

from .tpcxbb_fixture import build_fixture

#: seed words the fixture reviews actually contain
from gpu_bdb_spark.queries.tpcxbb.q10_q19 import DEFAULT_NEG, DEFAULT_POS


def synth_lexicon(seeds, extra_in_text, prefix, n=1500) -> tuple[str, ...]:
    """Deterministic lexicon: real seeds + words present in review text
    (so matches and fan-out are exercised) + generated filler up to n."""
    words = list(dict.fromkeys(list(seeds) + list(extra_in_text)))
    words += [f"{prefix}{i:05d}" for i in range(n - len(words))]
    return tuple(words)


POS_LEX = synth_lexicon(DEFAULT_POS, ("product", "bought"), "poslex")
NEG_LEX = synth_lexicon(DEFAULT_NEG, ("item", "compare"), "neglex")


def _values(words: tuple[str, ...], sentiment: str) -> str:
    return ", ".join(f"('{w}', '{sentiment}')" for w in sorted(set(words)))


SENTENCES_SQL = r"""
  SELECT pr_review_sk, pr_item_sk, pr_review_date,
         unnest(list_filter(list_transform(
             string_split_regex(lower(pr_review_content), '[.?!]'),
             x -> trim(x)), x -> x <> '')) AS sentence
  FROM product_reviews
  WHERE pr_review_content IS NOT NULL
"""

Q10_SQL = f"""
WITH sent AS ({SENTENCES_SQL}),
words AS (
  SELECT pr_item_sk, sentence,
         unnest(list_filter(string_split_regex(sentence, '\\s+'),
                            x -> x <> '')) AS word
  FROM sent WHERE pr_item_sk IS NOT NULL
),
lex(sent_word, sentiment) AS (
  VALUES {_values(POS_LEX, 'POS')}, {_values(NEG_LEX, 'NEG')})
SELECT DISTINCT pr_item_sk AS item_sk, sentence AS review_sentence,
       sentiment, word AS sentiment_word
FROM words JOIN lex ON word = sent_word
ORDER BY item_sk, review_sentence, sentiment_word
"""


@pytest.fixture(scope="module")
def ducked(spark, tmp_path_factory):
    frames = build_fixture(spark)
    data_dir = str(tmp_path_factory.mktemp("lexicon_oracle"))
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


def test_q10_large_lexicon_oracle(spark, ducked):
    tables, con = ducked
    got_df = tpcxbb_query(10)(spark, tables, pos_words=POS_LEX,
                              neg_words=NEG_LEX)
    got = got_df.toPandas()
    expected = con.execute(Q10_SQL).df()
    # the in-text words guarantee the big lexicon changes the output
    assert len(got) > 0
    assert pseudo_equal(got, expected), (
        f"q10 large-lexicon: {len(got)} vs {len(expected)} rows")


def test_q10_lexicon_join_stays_broadcast(spark, ducked):
    tables, _ = ducked
    plan = tpcxbb_query(10)(
        spark, tables, pos_words=POS_LEX,
        neg_words=NEG_LEX)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, (
        "a 3k-word lexicon must not demote the words⋈lexicon join to a "
        "shuffle join")


def test_q18_large_lexicon_oracle(spark, ducked):
    tables, con = ducked
    sql = f"""
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
lex(sent_word, sentiment) AS (VALUES {_values(NEG_LEX, 'NEG')})
SELECT DISTINCT store_name AS s_name, pr_review_date AS r_date, sentence,
       sentiment, word AS sentiment_word
FROM words JOIN lex ON word = sent_word
ORDER BY s_name, r_date, sentence, sentiment_word
"""
    got = tpcxbb_query(18)(spark, tables, neg_words=NEG_LEX).toPandas()
    expected = con.execute(sql).df()
    assert len(got) > 0
    assert pseudo_equal(got, expected), (
        f"q18 large-lexicon: {len(got)} vs {len(expected)} rows")


def test_load_word_list_feeds_pipeline(spark, ducked, tmp_path):
    """File-sourced lexicon (reference sentiment_files layout): one word
    per line with blanks/dups → deduped broadcast frame; q10 over the
    loaded words matches q10 over the in-memory tuple."""
    tables, _ = ducked
    path = tmp_path / "neg_words.txt"
    path.write_text("\n".join(NEG_LEX + ("", "  ", NEG_LEX[0])) + "\n")
    loaded = load_word_list(spark, str(path), "NEG")
    assert loaded.count() == len(set(NEG_LEX))
    words = tuple(r["word"] for r in loaded.collect())
    got = tpcxbb_query(10)(spark, tables, pos_words=POS_LEX,
                           neg_words=words).toPandas()
    ref = tpcxbb_query(10)(spark, tables, pos_words=POS_LEX,
                           neg_words=NEG_LEX).toPandas()
    assert pseudo_equal(got, ref)
