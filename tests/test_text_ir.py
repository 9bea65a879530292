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


class TestWinnowPositions:
    """Positional rightmost-min winnowing (round 5)."""

    def test_matches_sequential_reference(self, spark):
        import hashlib
        import random

        rng = random.Random(11)
        docs = []
        for i in range(30):
            # tiny alphabet → plenty of hash ties to exercise the
            # rightmost tie-break
            docs.append((i, " ".join(
                rng.choice("aa bb cc dd".split())
                for _ in range(rng.randint(1, 25)))))
        k, w = 3, 4

        def hashes(text):
            toks = text.split()
            grams = [" ".join(toks[j:j + k])
                     for j in range(len(toks) - k + 1)]
            return [int(hashlib.md5(g.encode()).hexdigest()[:8], 16)
                    for g in grams]

        want = set()
        for i, text in docs:
            h = hashes(text)
            for s in range(0, len(h) - w + 1):
                window = h[s:s + w]
                m = min(window)
                p = s + max(j for j, v in enumerate(window) if v == m)
                want.add((i, p, h[p]))

        from gpu_bdb_spark.operators.text import winnow_positions

        df = spark.createDataFrame(docs, "doc_id bigint, text string")
        got = {(r["doc_id"], r["pos"], r["fingerprint"])
               for r in winnow_positions(df, k=k, w=w).collect()}
        assert got == want

    def test_value_set_equals_standard_winnowing(self, spark, sf_dir):
        from gpu_bdb_spark.io import read_table
        from gpu_bdb_spark.operators.text import (winnow_fingerprints,
                                                  winnow_positions)

        d = read_table(spark, sf_dir, "documents", ["doc_id", "text"],
                       hint_broadcast=False)
        std = {(r["doc_id"], r["fingerprint"])
               for r in winnow_fingerprints(d, k=3, w=4).collect()}
        pos = {(r["doc_id"], r["fingerprint"])
               for r in winnow_positions(d, k=3, w=4).collect()}
        # every window's min VALUE is recorded by both selection rules
        assert pos == std


class TestLearnBpeMerges:
    """Distributed BPE vocabulary training (round 5)."""

    @staticmethod
    def _ref_bpe(words, n_merges):
        """Sennrich get_stats/merge loop with the operator's exact
        tie-break (count desc, then (left, right) ascending)."""
        from collections import Counter

        freq = Counter(words)
        vocab = {w: tuple(list(w) + ["</w>"]) for w in freq}
        out = []
        for rank in range(1, n_merges + 1):
            stats = Counter()
            for w, f in freq.items():
                syms = vocab[w]
                for a, b in zip(syms, syms[1:]):
                    stats[(a, b)] += f
            if not stats:
                break
            (l, r), n = min(
                stats.items(), key=lambda kv: (-kv[1], kv[0]))
            out.append((rank, l, r, l + r, n))
            for w in vocab:
                syms = vocab[w]
                new = []
                i = 0
                while i < len(syms):
                    if (i + 1 < len(syms) and syms[i] == l
                            and syms[i + 1] == r):
                        new.append(l + r)
                        i += 2
                    else:
                        new.append(syms[i])
                        i += 1
                vocab[w] = tuple(new)
        return out

    def test_matches_reference_on_documents(self, spark, sf_dir):
        import re

        import pyarrow.parquet as pq

        from gpu_bdb_spark.io import read_table
        from gpu_bdb_spark.operators.text import learn_bpe_merges

        d = read_table(spark, sf_dir, "documents", ["doc_id", "text"],
                       hint_broadcast=False)
        got = [(r["rank"], r["left"], r["right"], r["merged"], r["freq"])
               for r in learn_bpe_merges(d, n_merges=10).collect()]

        texts = pq.read_table(f"{sf_dir}/documents.parquet",
                              columns=["text"])["text"].to_pylist()
        words = [w for t in texts
                 for w in re.split(r"\s+", t.lower()) if w]
        assert got == self._ref_bpe(words, 10)

    def test_greedy_overlap_handling(self, spark):
        # "aaaa" merges to two "aa" units in one round, not three
        from gpu_bdb_spark.operators.text import learn_bpe_merges

        df = spark.createDataFrame([(1, "aaaa aaaa")],
                                   "doc_id bigint, text string")
        merges = learn_bpe_merges(df, n_merges=2).collect()
        # greedy application: (a,a) counts 3 overlapping positions ×
        # freq 2 = 6, but merging yields [aa, aa, </w>] — two units
        assert (merges[0]["left"], merges[0]["right"], merges[0]["freq"]) \
            == ("a", "a", 6)
        # round 2: (aa,aa) and (aa,</w>) tie at 2; the ascending
        # lexicographic tie-break picks (aa, </w>) since '<' < 'a'
        assert (merges[1]["left"], merges[1]["right"]) == ("aa", "</w>")

    def test_encode_reassembles_words(self, spark, sf_dir):
        from gpu_bdb_spark.io import read_table
        from gpu_bdb_spark.operators.text import bpe_encode
        from pyspark.sql import functions as F

        d = read_table(spark, sf_dir, "documents", ["doc_id", "text"],
                       hint_broadcast=False)
        enc = bpe_encode(d, n_merges=8)
        bad = enc.filter(
            F.concat_ws("", F.col("tokens"))
            != F.concat(F.col("word"), F.lit("</w>"))).count()
        assert bad == 0
        # every corpus word occurrence is segmented (join loses none)
        n_words = d.select(
            F.explode(F.split(F.lower("text"), r"\s+")).alias("w")
        ).filter(F.col("w") != "").count()
        assert enc.count() == n_words


class TestRobustWinnowing:
    """True robust winnowing (history tie-break) vs the stateless rule."""

    def test_subset_coverage_and_density(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from gpu_bdb_spark.io import read_table
        from gpu_bdb_spark.operators.text import (winnow_positions,
                                                  winnow_positions_robust)

        d = read_table(spark, sf_dir, "documents", ["doc_id", "text"],
                       hint_broadcast=False)
        strict = {(r["doc_id"], r["pos"], r["fingerprint"])
                  for r in winnow_positions(d, k=3, w=4).collect()}
        robust = {(r["doc_id"], r["pos"], r["fingerprint"])
                  for r in winnow_positions_robust(d, k=3, w=4).collect()}
        assert robust, "no selections"
        # every robust selection was the rightmost min of its window
        assert robust <= strict
        # coverage guarantee: every full window contains a selection
        toks = d.select(
            "doc_id",
            F.size(F.filter(F.split(F.lower("text"), r"\s+"),
                            lambda t: t != "")).alias("n")).collect()
        sel_by_doc = {}
        for i, p, _ in robust:
            sel_by_doc.setdefault(i, set()).add(p)
        for row in toks:
            m = row["n"] - 2      # grams for k=3
            if m < 4:
                continue
            ps = sel_by_doc.get(row["doc_id"], set())
            for s in range(0, m - 3):
                assert any(s <= p <= s + 3 for p in ps), \
                    f"uncovered window {s} in doc {row['doc_id']}"

    def test_history_rule_thins_ties(self, spark):
        from gpu_bdb_spark.operators.text import (winnow_positions,
                                                  winnow_positions_robust)

        # heavy repetition → many tied minima → history rule records less
        df = spark.createDataFrame(
            [(1, " ".join(["a b c"] * 20))], "doc_id bigint, text string")
        n_strict = winnow_positions(df, k=3, w=4).count()
        n_robust = winnow_positions_robust(df, k=3, w=4).count()
        assert n_robust < n_strict


def test_unicode_normalization_on_planted_forms(spark):
    """Composed vs decomposed accents: NFC folds them to one form, the
    changed flag marks rewrites, and dedup-after-normalize collapses
    what dedup-before-normalize misses."""
    import unicodedata

    from gpu_bdb_spark.operators.text import normalize_unicode

    composed = "café résumé"
    decomposed = unicodedata.normalize("NFD", composed)
    assert composed != decomposed
    df = spark.createDataFrame(
        [(1, composed), (2, decomposed), (3, "plain ascii")],
        "doc_id bigint, text string")
    got = {r["doc_id"]: (r["text_nfc"], r["changed"])
           for r in normalize_unicode(df).collect()}
    assert got[1] == (composed, 0)
    assert got[2] == (composed, 1)   # decomposed → rewritten
    assert got[3] == ("plain ascii", 0)
    # the canonical forms now hash identically
    assert got[1][0] == got[2][0]
