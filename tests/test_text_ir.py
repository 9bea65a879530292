"""Semantic checks on the IR-scoring operators (BM25) — the oracle tests
prove cross-engine exactness; these prove the *ranking* means what it
claims on planted corpora."""

from __future__ import annotations

from pyspark.sql import functions as F


def _bm25(spark, docs, queries, **kw):
    from gpu_bdb_spark.operators.text import bm25_scores

    d = spark.createDataFrame(docs, "doc_id long, text string")
    q = spark.createDataFrame(queries, "query_id int, term string")
    return bm25_scores(d, q, "text", "doc_id", **kw).collect()


def test_bm25_ranks_hit_above_miss_and_tf_monotone(spark):
    rows = _bm25(
        spark,
        [(1, "cat dog fish"), (2, "cat cat cat dog"), (3, "bird tree")],
        [(1, "cat")],
        k=10,
    )
    got = {(r.doc_id): (r.rank, r.score) for r in rows}
    assert 3 not in got, "zero-hit doc must not score"
    # doc 2 has higher tf but is longer; with b=0.75 and these lengths the
    # saturation term still favors tf=3/len=4 over tf=1/len=3
    assert got[2][0] == 1 and got[1][0] == 2
    assert got[2][1] > got[1][1] > 0


def test_bm25_rare_term_outweighs_common(spark):
    # 'rare' appears in 1 of 4 docs, 'common' in all 4 — one hit of the
    # rare term must outrank one hit of the common term (idf dominance)
    docs = [(i, "common filler words here") for i in range(1, 4)]
    docs.append((4, "common rare"))
    rows = _bm25(spark, docs, [(1, "rare"), (2, "common")], k=1)
    top = {r.query_id: r.doc_id for r in rows if r.rank == 1}
    assert top[1] == 4
    scores = {(r.query_id, r.doc_id): r.score for r in rows}
    assert scores[(1, 4)] > scores[(2, top[2])]


def test_bm25_topk_truncates_with_deterministic_ties(spark):
    docs = [(i, "x") for i in range(1, 8)]  # identical single-term docs
    rows = _bm25(spark, docs, [(1, "x")], k=3)
    assert [r.doc_id for r in sorted(rows, key=lambda r: r.rank)] == [1, 2, 3]


def test_quality_gate_cuts_per_language_not_globally(spark):
    """Each language keeps its own distribution: a doc that would pass a
    global cut still drops if it is the worst of ITS language."""
    from pyspark.sql import Window

    from gpu_bdb_spark.functions import r6
    from gpu_bdb_spark.operators.text import unigram_nll

    # lang A: 10 docs of common words + 1 gibberish; lang B: all gibberish
    docs = [(i, "the cat sat on the mat", "A") for i in range(1, 11)]
    docs += [(11, "zq xv qqj", "A")]
    docs += [(20 + i, f"uniq{i} uniq{i}x woble{i}", "B") for i in range(5)]
    d = spark.createDataFrame(docs, "doc_id long, text string, lang string")
    nll = unigram_nll(d, "text", "doc_id").join(
        d.select("doc_id", "lang"), "doc_id")
    w = Window.partitionBy("lang").orderBy("avg_nll")
    kept = {
        r.doc_id
        for r in nll.withColumn("pct", r6(F.percent_rank().over(w)))
        .filter(F.col("pct") <= 0.9).collect()
    }
    assert 11 not in kept, "worst-of-lang-A must be cut"
    assert all(i in kept for i in range(1, 11))
    # lang B survivors are judged only against lang B
    assert len([i for i in kept if i >= 20]) >= 4
