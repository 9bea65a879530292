"""Benchmark decontamination: flag training documents that share word
n-grams with an evaluation/benchmark set.

This is the standard LLM-corpus hygiene pass (n-gram collision against
held-out benchmarks — the GPT-3 appendix-C / PaLM decontamination shape):
the eval set is tiny, the corpus is the 100 TB side, so the layout is

  eval side:   tokenize → distinct n-grams (one shuffle over a tiny set)
  corpus side: tokenize → distinct n-grams per doc → explode →
               BROADCAST join against the eval-gram set →
               hash-aggregate per doc (map-side partial counts)

The corpus is scanned once, never shuffled on text — only the exploded
(id, gram) stream reduces on doc id, and the join is broadcast because a
benchmark suite is dimension-sized by construction. All expressions are
codegen'd built-ins (split / zip_with shingles / explode / hash agg);
no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gpu_bdb_spark.functions import tokenize
from gpu_bdb_spark.operators.text import ngrams


def eval_gram_set(
    eval_df: DataFrame, text_col: str = "text", n: int = 4
) -> DataFrame:
    """Distinct word n-grams of the evaluation set: one `gram` column."""
    return (
        eval_df.select(
            F.explode(F.array_distinct(ngrams(tokenize(text_col), n)))
            .alias("gram")
        )
        .distinct()
    )


def ngram_contamination(
    corpus: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 4,
) -> DataFrame:
    """Per-corpus-document overlap with the eval set's n-grams.

    Returns (doc_id, n_grams, n_contaminated, contamination_ratio,
    is_contaminated) for every corpus doc with at least one n-gram;
    `n_contaminated` counts the doc's DISTINCT n-grams that appear
    anywhere in the eval set, `is_contaminated` is the any-overlap flag
    (INT for cross-engine hash stability).
    """
    ev = eval_gram_set(eval_df, text_col, n).withColumn("_hit", F.lit(1))
    g = corpus.select(
        F.col(id_col).alias("doc_id"),
        F.array_distinct(ngrams(tokenize(text_col), n)).alias("grams"),
    ).filter(F.size("grams") > 0)
    exploded = g.select(
        "doc_id",
        F.size("grams").cast("long").alias("n_grams"),
        F.explode("grams").alias("gram"),
    )
    hits = exploded.join(F.broadcast(ev), "gram", "left")
    return (
        hits.groupBy("doc_id", "n_grams")
        .agg(F.count("_hit").alias("n_contaminated"))
        .select(
            "doc_id",
            "n_grams",
            "n_contaminated",
            F.round(
                F.col("n_contaminated").cast("double")
                / F.col("n_grams").cast("double"),
                6,
            ).alias("contamination_ratio"),
            (F.col("n_contaminated") > 0).cast("int")
            .alias("is_contaminated"),
        )
    )


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
) -> DataFrame:
    """Intra-document repetition signals: duplicate-n-gram fraction and
    top-n-gram fraction per document (the Gopher/MassiveText repetition
    filters).

    Shape: explode raw (non-distinct) n-grams once, then TWO hash
    aggregates — (doc, gram) counts, then per-doc total / distinct /
    max — both codegen'd with map-side partials. The per-doc max of
    per-gram counts is what rules out a pure array formulation (a
    value_counts inside a higher-order function runs interpreted).

    Returns (doc_id, n_ngrams, n_distinct, dup_frac, top_frac); docs
    shorter than n tokens are dropped (no n-grams → no signal).
    """
    exploded = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(ngrams(tokenize(text_col), n)).alias("gram"),
    )
    per_gram = exploded.groupBy("doc_id", "gram").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return (
        per_gram.groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("long").alias("n_ngrams"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.max("cnt").alias("_top"),
        )
        .select(
            "doc_id",
            "n_ngrams",
            "n_distinct",
            F.round(
                F.lit(1.0)
                - F.col("n_distinct").cast("double")
                / F.col("n_ngrams").cast("double"),
                6,
            ).alias("dup_frac"),
            F.round(
                F.col("_top").cast("double")
                / F.col("n_ngrams").cast("double"),
                6,
            ).alias("top_frac"),
        )
    )


#: (name, pattern) redaction rules. Patterns are deliberately restricted
#: to syntax that Java regex (Spark) and RE2-ish engines (DuckDB) parse
#: identically: character classes, +/{m,}, no backrefs or lookaround.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("phone", r"[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}"),
    ("number", r"[0-9]{3,}"),
)


def pii_scrub(
    df: DataFrame,
    text_col: str,
    patterns: tuple[tuple[str, str], ...] = PII_PATTERNS,
) -> DataFrame:
    """Redact PII-shaped substrings and count redactions per rule.

    Adds `{text_col}_scrubbed` (each rule's matches replaced by
    `[NAME]`, applied in declaration order) and one `n_{name}` count per
    rule, counted BEFORE that rule's own replacement but after earlier
    rules' (so an email's digits aren't double-counted as numbers when
    email precedes number). Pure `regexp_replace`/`regexp_count` column
    expressions — codegen'd, scan-shaped, no shuffle at all.
    """
    scrubbed = F.col(text_col)
    counts = []
    for name, pat in patterns:
        counts.append(F.regexp_count(scrubbed, F.lit(pat))
                      .cast("long").alias(f"n_{name}"))
        scrubbed = F.regexp_replace(scrubbed, pat, f"[{name.upper()}]")
    return df.select(
        "*", *counts, scrubbed.alias(f"{text_col}_scrubbed")
    )
