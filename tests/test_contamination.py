"""Behavior tests for the contamination / repetition / PII operators
(the registered queries get oracle-parity coverage automatically via
tests/test_oracle_parity.py — these pin the operator semantics on
hand-built fixtures where the expected values are computable by eye)."""

from __future__ import annotations

from gpu_bdb_spark.operators.contamination import (
    ngram_contamination,
    pii_scrub,
    repetition_stats,
)


def test_ngram_contamination_flags_only_overlapping_docs(spark):
    corpus = spark.createDataFrame(
        [
            (1, "a b c d e"),          # shares the eval 4-gram "a b c d"
            (2, "x y z w v"),          # no overlap
            (3, "c d"),                # too short for a 4-gram → dropped
        ],
        ["doc_id", "text"],
    )
    eval_df = spark.createDataFrame(
        [(100, "a b c d q r s")], ["doc_id", "text"])
    out = {
        r["doc_id"]: r
        for r in ngram_contamination(corpus, eval_df, n=4).collect()
    }
    assert set(out) == {1, 2}
    assert out[1]["n_grams"] == 2  # "a b c d", "b c d e"
    assert out[1]["n_contaminated"] == 1
    assert out[1]["is_contaminated"] == 1
    assert out[1]["contamination_ratio"] == 0.5
    assert out[2]["n_contaminated"] == 0
    assert out[2]["is_contaminated"] == 0


def test_ngram_contamination_counts_distinct_grams_once(spark):
    # the shared gram appears twice in the corpus doc but counts once
    corpus = spark.createDataFrame(
        [(1, "a b a b a b")], ["doc_id", "text"])
    eval_df = spark.createDataFrame([(9, "a b x")], ["doc_id", "text"])
    row = ngram_contamination(corpus, eval_df, n=2).collect()[0]
    assert row["n_grams"] == 2  # distinct bigrams: {"a b", "b a"}
    assert row["n_contaminated"] == 1  # only "a b" is in the eval set
    assert row["contamination_ratio"] == 0.5


def test_repetition_stats_exact_fractions(spark):
    df = spark.createDataFrame(
        [
            (1, "a b a b a b"),  # bigrams: ab ba ab ba ab → 5 total, 2 distinct
            (2, "u v w x"),      # 3 bigrams, all distinct
            (3, "solo"),         # no bigram → dropped
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in repetition_stats(df, n=2).collect()}
    assert set(out) == {1, 2}
    assert out[1]["n_ngrams"] == 5
    assert out[1]["n_distinct"] == 2
    assert out[1]["dup_frac"] == 0.6
    assert out[1]["top_frac"] == 0.6  # "a b" ×3 of 5
    assert out[2]["dup_frac"] == 0.0
    assert round(out[2]["top_frac"], 6) == round(1 / 3, 6)


def test_pii_scrub_redacts_all_rule_types(spark):
    df = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@example.co.uk call 555-867-5309 id 4711"),
            (2, "clean text, short num 42"),
        ],
        ["row_id", "body"],
    )
    out = {r["row_id"]: r for r in pii_scrub(df, "body").collect()}
    assert out[1]["n_email"] == 1
    assert out[1]["n_phone"] == 1
    assert out[1]["n_number"] == 1  # 4711 (phone digits already replaced)
    assert out[1]["body_scrubbed"] == \
        "mail [EMAIL] call [PHONE] id [NUMBER]"
    assert out[2]["n_email"] == 0
    assert out[2]["n_phone"] == 0
    assert out[2]["n_number"] == 0  # "42" is under the 3-digit floor
    assert out[2]["body_scrubbed"] == "clean text, short num 42"


def test_pii_scrub_counts_follow_rule_order(spark):
    # the email's digits must NOT be re-counted by the number rule
    df = spark.createDataFrame(
        [(1, "a123456@test.org")], ["row_id", "body"])
    row = pii_scrub(df, "body").collect()[0]
    assert row["n_email"] == 1
    assert row["n_number"] == 0
    assert row["body_scrubbed"] == "[EMAIL]"


def test_scrub_spans_planted(spark):
    """Span-level decontamination: eval-overlapping 4-gram spans are cut
    from training docs, unique text survives, eval-only grams never
    touch non-overlapping docs, and a fully-contaminated doc empties."""
    from pyspark.sql import functions as F

    from gpu_bdb_spark.operators.text import scrub_spans

    bench = "the quick brown fox jumps high"            # 6-token eval doc
    train = [
        (1, f"alpha beta {bench} gamma delta"),         # contaminated
        (2, "all alone words nothing shared here"),     # clean
        (3, bench),                                     # verbatim eval copy
    ]
    corpus = spark.createDataFrame(train, "doc_id bigint, text string")
    eval_df = spark.createDataFrame(
        [(100, bench)], "doc_id bigint, text string")
    out = {r["doc_id"]: r for r in
           scrub_spans(corpus, eval_df, "text", "doc_id",
                       gram_tokens=4).collect()}
    assert out[1]["clean_text"] == "alpha beta gamma delta"
    assert out[1]["n_removed"] == 6 and out[1]["n_spans"] == 1
    assert out[2]["clean_text"] == train[1][1]
    assert out[2]["n_removed"] == 0
    assert out[3]["clean_text"] == "" and out[3]["n_kept"] == 0
