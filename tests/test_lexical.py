"""Inverted index + PMI co-occurrence: semantics on hand corpora and
the scale-relevant plan property (df cap applied before postings)."""

from __future__ import annotations

import math

from gpu_bdb_spark.operators.text import cooccurrence_pmi, inverted_index
from gpu_bdb_spark.plans import formatted_plan


def _docs(spark, texts):
    return spark.createDataFrame(
        list(enumerate(texts)), "doc_id LONG, text STRING")


def test_inverted_index_semantics(spark):
    d = _docs(spark, [
        "apple banana apple",   # apple deduped within doc
        "banana cherry",
        "cherry apple",
        "the the the",          # df=1 < min_df → dropped
    ])
    out = {r.token: (r.df, r.postings)
           for r in inverted_index(d, min_df=2, max_df_frac=1.0).collect()}
    assert out["apple"] == (2, "0,2")
    assert out["banana"] == (2, "0,1")
    assert out["cherry"] == (2, "1,2")
    assert "the" not in out


def test_inverted_index_max_df_cap(spark):
    d = _docs(spark, ["x y", "x z", "x w", "x q"])
    out = {r.token for r in
           inverted_index(d, min_df=1, max_df_frac=0.5).collect()}
    assert "x" not in out  # df=4 > 2 = floor(0.5·4)
    assert {"y", "z", "w", "q"} <= out


def test_inverted_index_filters_before_collect(spark, sf_dir):
    from gpu_bdb_spark.io import read_table

    d = read_table(spark, sf_dir, "documents", ["doc_id", "text"],
                   hint_broadcast=False)
    plan = formatted_plan(inverted_index(d))
    # the survivor-vocab join must sit UNDER the collect_list aggregate:
    # the last (outermost) aggregate mentions collect_list, and a
    # broadcast join of the df-filtered vocab feeds it
    assert "collect_list" in plan
    assert "BroadcastHashJoin" in plan
    head = plan.split("collect_list")[0]
    assert "BroadcastHashJoin" in head, (
        "df-filter join must run before postings are collected")


def test_inverted_index_chunked_reassembles(spark):
    """Round-17 1B-token class: per-group postings state is unbounded
    in n_docs × max_df_frac (one near-cap token = a ~40MB cell at 10M
    docs — measured OOM, probe_lexical_1b.py). chunk_docs splits each
    token's postings into bounded chunks keyed doc_id % ceil(df/chunk):
    chunks must carry the SAME (df, doc-id multiset) as the unchunked
    form, each chunk sorted, chunk count = ceil(df/chunk_docs), and
    the deterministic chunk assignment must be replayable."""
    texts = [f"tok{j} filler{i}" for i in range(50)
             for j in range(i % 5 + 1)]
    d = _docs(spark, [" ".join(t.split()) for t in texts])
    flat = {r.token: (r.df, r.postings) for r in
            inverted_index(d, min_df=1, max_df_frac=1.0).collect()}
    chunked = inverted_index(d, min_df=1, max_df_frac=1.0,
                             chunk_docs=7).collect()
    by_tok: dict = {}
    for r in chunked:
        by_tok.setdefault(r.token, []).append(r)
    assert set(by_tok) == set(flat)
    for tok, rows in by_tok.items():
        df_flat, postings_flat = flat[tok]
        n_chunks = -(-df_flat // 7)  # ceil
        assert all(r.df == df_flat for r in rows)
        assert sorted(r.chunk for r in rows) == sorted(
            {int(p) % n_chunks for p in postings_flat.split(",")})
        merged: list[int] = []
        for r in rows:
            ids = [int(p) for p in r.postings.split(",")]
            assert ids == sorted(ids)  # each chunk sorted
            assert all(i % n_chunks == r.chunk for i in ids)
            merged.extend(ids)
        assert sorted(merged) == [int(p)
                                  for p in postings_flat.split(",")]


def test_inverted_index_shuffle_parts_output_invariant(spark):
    """shuffle_parts only sizes the postings exchange (round-17 1B
    class: AQE cannot split an aggregate reduce slice, so slice row
    count is caller-sizeable) — output is identical with and without,
    in both flat and chunked forms."""
    d = _docs(spark, [f"a b c{i % 7} d{i}" for i in range(40)])
    base = sorted(map(tuple, inverted_index(
        d, min_df=1, max_df_frac=1.0).collect()))
    sized = sorted(map(tuple, inverted_index(
        d, min_df=1, max_df_frac=1.0, shuffle_parts=5).collect()))
    assert base == sized
    cbase = sorted(map(tuple, inverted_index(
        d, min_df=1, max_df_frac=1.0, chunk_docs=4).collect()))
    csized = sorted(map(tuple, inverted_index(
        d, min_df=1, max_df_frac=1.0, chunk_docs=4,
        shuffle_parts=5).collect()))
    assert cbase == csized


def test_tfidf_shuffle_parts_output_invariant(spark):
    """Same round-17 sizing knob on term_scores_tfidf: explicit
    exchange sizing (aggregate + both windows) must not change a
    single output row."""
    from gpu_bdb_spark.operators.text import term_scores_tfidf

    d = _docs(spark, [f"alpha beta w{i % 11} w{i % 3} gamma{i}"
                      for i in range(60)])
    base = sorted(map(tuple, term_scores_tfidf(d, k=3).collect()))
    sized = sorted(map(tuple, term_scores_tfidf(
        d, k=3, shuffle_parts=5).collect()))
    assert base == sized


def test_cooccurrence_pmi_semantics(spark):
    # one doc "a b a b": window=1 pairs: (a,b),(a,b),(a,b) → n_ab=3
    d = _docs(spark, ["a b a b"])
    out = {(r.token_a, r.token_b): r for r in
           cooccurrence_pmi(d, window=1, min_pair_count=1).collect()}
    r = out[("a", "b")]
    assert (r.n_ab, r.n_a, r.n_b) == (3, 2, 2)
    # T=4 tokens, P=3 pairs total → pmi = ln(3·16/(3·4)) = ln(4)
    assert r.pmi == round(math.log(4.0), 6)
    # self-pair a-a at window 1 does not exist in "a b a b"
    assert ("a", "a") not in out


def test_cooccurrence_window_reach(spark):
    d = _docs(spark, ["a x x b"])
    near = {(r.token_a, r.token_b)
            for r in cooccurrence_pmi(d, window=1, min_pair_count=1)
            .collect()}
    far = {(r.token_a, r.token_b)
           for r in cooccurrence_pmi(d, window=3, min_pair_count=1)
           .collect()}
    assert ("a", "b") not in near
    assert ("a", "b") in far


def test_registry_has_lexical_entries():
    from gpu_bdb_spark.queries.registry import all_specs, oracle_sql

    for name in ("inverted_index", "cooccurrence_pmi"):
        assert name in all_specs()
        assert oracle_sql()[name]


def test_mask_tokens_mlm_rng_replay_and_rate(spark, sf_dir):
    import hashlib

    from gpu_bdb_spark.queries.registry import all_specs

    out = all_specs()["mask_tokens_mlm"].fn(spark, sf_dir).toPandas()
    # replay the coin for a sample of rows
    for _, r in out.head(200).iterrows():
        h = int(hashlib.md5(
            f"mlm:{r.doc_id}:{r.pos}".encode()).hexdigest()[:8], 16)
        assert (h % 100 < 15) == bool(r.is_masked)
        if r.is_masked:
            assert r.token_out == "[MASK]" and r.target is not None
        else:
            assert r.token_out != "[MASK]" or r.target is None
    rate = out["is_masked"].mean()
    assert 0.10 < rate < 0.20  # 15% coin over tens of thousands of tokens


def test_label_centroids_match_numpy(spark, sf_dir):
    import numpy as np

    from gpu_bdb_spark.io import read_table
    from gpu_bdb_spark.queries.registry import all_specs

    out = all_specs()["label_centroids"].fn(spark, sf_dir).toPandas()
    e = read_table(spark, sf_dir, "embeddings",
                   ["embedding", "label"]).toPandas()
    for lbl, grp in e.groupby("label"):
        V = np.round(np.vstack(grp["embedding"].to_numpy())
                     .astype(np.float64), 9)
        mean = V.mean(axis=0)
        sub = out[out.label == lbl].sort_values("dim")
        assert (sub["n"] == len(grp)).all()
        assert np.allclose(sub["centroid"].to_numpy(), mean, atol=2e-6)


def test_remove_boilerplate_semantics(spark):
    """Shared segments drop at max_df=1, unique segments survive in
    order, and an all-boilerplate document keeps a row with empty
    text."""
    from gpu_bdb_spark.operators.text import remove_boilerplate

    d = _docs(spark, [
        "a b c d x1 x2 x3 x4 u1 u2",   # boiler, unique, short-tail
        "a b c d y1 y2 y3 y4",          # boiler + unique
        "a b c d",                      # all boilerplate
        "q r s t q r s t q r",          # self-repeat within ONE doc only
    ])
    out = {r.doc_id: (r.clean_text, r.n_kept, r.n_dropped)
           for r in remove_boilerplate(d, seg_tokens=4, max_df=1)
           .collect()}
    assert out[0] == ("x1 x2 x3 x4 u1 u2", 2, 1)
    assert out[1] == ("y1 y2 y3 y4", 1, 1)
    assert out[2] == ("", 0, 1)
    # within-doc repetition is NOT cross-document boilerplate (df=1),
    # but two identical segments inside one doc share a hash: df counts
    # distinct docs, so both copies survive
    assert out[3] == ("q r s t q r s t q r", 3, 0)
    assert len(out) == 4


def test_remove_boilerplate_middle_segment_order(spark):
    """Reassembly preserves original segment order when the dropped
    segment sits in the middle."""
    from gpu_bdb_spark.operators.text import remove_boilerplate

    d = _docs(spark, [
        "h1 h2 h3 h4 a b c d t1 t2 t3 t4",
        "x1 x2 x3 x4 a b c d z1 z2 z3 z4",
    ])
    out = {r.doc_id: r.clean_text
           for r in remove_boilerplate(d, seg_tokens=4, max_df=1)
           .collect()}
    assert out[0] == "h1 h2 h3 h4 t1 t2 t3 t4"
    assert out[1] == "x1 x2 x3 x4 z1 z2 z3 z4"
