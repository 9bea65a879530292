"""LSH ANN recall against the brute-force ground truth, and cosine
correctness against numpy."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from gpu_bdb_spark.io import read_table
from gpu_bdb_spark.operators.similarity import brute_force_topk, lsh_topk


def test_brute_force_matches_numpy(spark, sf_dir):
    e = read_table(spark, sf_dir, "embeddings", ["vec_id", "embedding"],
                   hint_broadcast=False)
    rows = e.collect()
    ids = np.array([r.vec_id for r in rows])
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)

    queries = e.filter(F.col("vec_id") % 50 == 0)
    got = brute_force_topk(queries, e, k=3).collect()
    by_query: dict[int, list[int]] = {}
    for r in sorted(got, key=lambda r: (r.query_id, r.rank)):
        by_query.setdefault(r.query_id, []).append(r.neighbor_id)

    for qid, neighbors in by_query.items():
        qi = int(np.where(ids == qid)[0][0])
        sims = (mat @ mat[qi]) / (norms * norms[qi])
        sims[qi] = -np.inf
        # numpy ground truth with the same (sim desc, id asc) tiebreak
        order = sorted(range(len(ids)), key=lambda j: (-sims[j], ids[j]))
        expect = [int(ids[j]) for j in order[:3]]
        assert neighbors == expect, f"query {qid}: {neighbors} != {expect}"


def test_lsh_recall_vs_brute_force(spark, sf_dir):
    e = read_table(spark, sf_dir, "embeddings", ["vec_id", "embedding"],
                   hint_broadcast=False)
    exact = {(r.query_id, r.neighbor_id)
             for r in brute_force_topk(e, e, k=5).collect()}
    approx = {(r.query_id, r.neighbor_id)
              for r in lsh_topk(e, k=5, dim=64, n_planes=4, n_tables=8, seed=42).collect()}
    recall = len(approx & exact) / len(exact)
    # These synthetic embeddings are uniformly random (top-5 cosine ≈0.32,
    # angle ≈71°); 8 tables × 4 planes gives expected recall
    # 1-(1-0.605^4)^8 ≈ 0.68. Clustered real-world data does far better.
    assert recall >= 0.5, f"recall {recall:.3f} unexpectedly low"
    assert all(q != n for q, n in approx)


def _clustered(spark, n_centers=8, per_center=120, dim=32, seed=11):
    """Deterministic clustered corpus: centers on coordinate axes, points
    = center + small noise — the shape real embedding corpora have."""
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_centers, dim)) * 3.0
    rows = []
    for c in range(n_centers):
        noise = rng.standard_normal((per_center, dim)) * 0.3
        for i, v in enumerate(centers[c] + noise):
            rows.append((c * per_center + i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_ivf_recall_on_clustered_data(spark):
    from gpu_bdb_spark.operators.similarity import ivf_topk

    corpus = _clustered(spark)
    queries = corpus.filter(F.col("vec_id") % 40 == 0)
    exact = {(r.query_id, r.neighbor_id)
             for r in brute_force_topk(queries, corpus, k=5).collect()}
    approx_rows = ivf_topk(queries, corpus, k=5, n_lists=8, n_probe=2,
                           seed=7).collect()
    approx = {(r.query_id, r.neighbor_id) for r in approx_rows}
    recall = len(approx & exact) / len(exact)
    # neighbors live in the query's own cluster; probing 2 of 8 lists
    # must recover nearly all of them
    assert recall >= 0.9, f"IVF recall {recall:.3f}"
    assert all(q != n for q, n in approx)
    # ranks are 1..k per query, exact ordering inside probed lists
    per_q: dict[int, list[int]] = {}
    for r in sorted(approx_rows, key=lambda r: (r.query_id, r.rank)):
        per_q.setdefault(r.query_id, []).append(r.rank)
    assert all(ranks == list(range(1, len(ranks) + 1))
               for ranks in per_q.values())


def test_ivf_runs_on_real_embeddings(spark, sf_dir):
    from gpu_bdb_spark.operators.similarity import ivf_topk

    e = read_table(spark, sf_dir, "embeddings", ["vec_id", "embedding"],
                   hint_broadcast=False)
    q = e.filter(F.col("vec_id") % 100 == 0)
    got = ivf_topk(q, e, k=3, n_lists=8, n_probe=3).collect()
    assert len(got) > 0
    assert all(r.rank <= 3 for r in got)


def test_ivf_persisted_index_matches_inline_and_skips_shuffle(spark):
    from gpu_bdb_spark.operators.similarity import (ivf_build_index,
                                                    ivf_search_index,
                                                    ivf_topk)
    from gpu_bdb_spark.plans import formatted_plan

    corpus = _clustered(spark, seed=13)
    queries = corpus.filter(F.col("vec_id") % 40 == 0)
    try:
        centroids = ivf_build_index(corpus, "ivf_idx_t", n_lists=8, seed=7)
        got = ivf_search_index(spark, "ivf_idx_t", centroids, queries,
                               k=5, n_probe=2)
        # explain BEFORE executing: post-execution AQE explain re-lists
        # materialized stage subtrees and double-counts exchanges
        plan = formatted_plan(got)
        # bucketed corpus read is exchange-free: only the query batch and
        # the final top-k window repartition
        assert "Bucketed: true" in plan, plan
        import re
        assert len(re.findall(r"\(\d+\) Exchange", plan)) == 2, plan
        inline = ivf_topk(queries, corpus, k=5, n_lists=8, n_probe=2, seed=7)
        a = {(r.query_id, r.neighbor_id, r.rank) for r in got.collect()}
        b = {(r.query_id, r.neighbor_id, r.rank) for r in inline.collect()}
        assert a == b
    finally:
        spark.sql("DROP TABLE IF EXISTS ivf_idx_t")


def test_bucket_udf_bit_identical_to_hof_expression(spark, sf_dir):
    """The vectorized bucket UDF must reproduce the r1/r2
    aggregate(zip_with) column expression BIT-FOR-BIT (same planes, same
    left-to-right float64 accumulation order), so candidate sets and
    recall are unchanged by the compile-cost rewrite."""
    from functools import reduce

    from gpu_bdb_spark.operators.similarity import hyperplane_buckets

    e = read_table(spark, sf_dir, "embeddings", ["vec_id", "embedding"],
                   hint_broadcast=False)
    rng = np.random.default_rng(42)
    planes = rng.standard_normal((12, 64))

    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    bits = []
    for i, row in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in row])
        dot = F.aggregate(F.zip_with(v, plane, lambda a, b: a * b),
                          F.lit(0.0), lambda acc, x: acc + x)
        bits.append(F.when(dot >= 0, F.lit(1 << i).cast("long"))
                    .otherwise(F.lit(0).cast("long")))
    old = {(r.vec_id, r.bucket) for r in e.select(
        "vec_id", reduce(lambda a, b: a + b, bits).alias("bucket")
    ).collect()}
    new = {(r.vec_id, r.bucket) for r in
           hyperplane_buckets(e, "embedding", dim=64, n_planes=12,
                              seed=42).select("vec_id", "bucket").collect()}
    assert new == old


def test_knn_graph_recall_on_clustered_data(spark):
    """Corpus-as-queries k-NN graph: every vector gets its top-k; recall
    vs brute force stays high on clustered data, no self-edges, each
    node has ≤k neighbors with dense ranks."""
    from gpu_bdb_spark.operators.similarity import ivf_topk

    corpus = _clustered(spark, n_centers=6, per_center=60)
    exact = {(r.query_id, r.neighbor_id)
             for r in brute_force_topk(corpus, corpus, k=3).collect()}
    rows = ivf_topk(corpus, corpus, k=3, n_lists=6, n_probe=2,
                    seed=7).collect()
    approx = {(r.query_id, r.neighbor_id) for r in rows}
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.9, f"knn-graph recall {recall:.3f}"
    assert all(q != n for q, n in approx)
    n_nodes = corpus.count()
    assert len({r.query_id for r in rows}) == n_nodes  # every node present


def test_quantize_reconstruction_error_bounded(spark, sf_dir):
    """Dequantized vectors must sit within range/255/2 of the original
    in EVERY dimension (the scalar-quantization guarantee the ANN
    candidate tier depends on), and codes must span the full 0..255
    budget at the dimension extremes."""
    from gpu_bdb_spark.operators.similarity import (dequantize_embeddings,
                                                    embedding_dim_stats,
                                                    quantize_embeddings)

    e = read_table(spark, sf_dir, "embeddings", ["vec_id", "embedding"],
                   hint_broadcast=False)
    stats = embedding_dim_stats(e, "embedding")
    q = quantize_embeddings(e, "embedding", "vec_id", bits=8)
    deq = dequantize_embeddings(q, stats, "codes", "vec_id", bits=8)
    joined = e.join(deq, "vec_id").select(
        F.max(F.expr(
            "array_max(zip_with(embedding, vec,"
            " (a, b) -> abs(cast(a as double) - b)))")).alias("max_err"))
    max_err = joined.collect()[0].max_err
    row = stats.collect()[0]
    worst_range = max(mx - mn for mn, mx in zip(row.mins, row.maxs))
    assert max_err <= worst_range / 255.0 / 2.0 + 1e-12, max_err
    lo, hi = q.select(
        F.min(F.expr("array_min(codes)")).alias("lo"),
        F.max(F.expr("array_max(codes)")).alias("hi")).collect()[0]
    assert lo == 0 and hi == 255, (lo, hi)


def test_knn_classify_recovers_planted_clusters(spark):
    """On two well-separated clusters, leave-one-out 5-NN majority vote
    must recover every label (the corpus labels are random, so the
    oracle proves exactness and THIS proves the classifier means
    something)."""
    import numpy as np

    from pyspark.sql import Window

    from gpu_bdb_spark.operators.similarity import brute_force_topk

    rng = np.random.RandomState(7)
    rows = []
    for i in range(30):
        rows.append((i, (rng.randn(8) * 0.05 + 5.0).tolist(), 0))
    for i in range(30, 60):
        rows.append((i, (rng.randn(8) * 0.05 - 5.0).tolist(), 1))
    e = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int")
    nn = brute_force_topk(e.select("vec_id", "embedding"),
                          e.select("vec_id", "embedding"), k=5)
    votes = (
        nn.join(e.select(F.col("vec_id").alias("neighbor_id"), "label"),
                "neighbor_id")
        .groupBy("query_id", "label")
        .agg(F.count(F.lit(1)).alias("n_votes"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("n_votes"), "label")
    pred = votes.withColumn("rn", F.row_number().over(w)) \
                .filter("rn = 1") \
                .join(e.select(F.col("vec_id").alias("query_id"),
                               F.col("label").alias("truth")), "query_id")
    bad = pred.filter(F.col("label") != F.col("truth")).count()
    assert bad == 0, f"{bad} misclassified"


def test_signed_random_projection_jl_properties(spark):
    """Seeded SRP: deterministic per (j,d); duplicate vectors collapse
    to identical projections; and over many planes the projected dot
    product estimates the original (JL in expectation)."""
    import random

    from gpu_bdb_spark.operators.similarity import signed_random_projection

    rng = random.Random(3)
    v1 = [rng.uniform(-1, 1) for _ in range(64)]
    v2 = list(v1)                      # exact duplicate
    v3 = [-x for x in v1]              # antipode
    df = spark.createDataFrame(
        [(1, v1), (2, v2), (3, v3)], "vec_id bigint, embedding array<float>")
    proj = signed_random_projection(df, k=64)
    rows = {(r["vec_id"], r["j"]): r["proj"] for r in proj.collect()}
    assert all(rows[(1, j)] == rows[(2, j)] for j in range(64))
    assert all(rows[(1, j)] == -rows[(3, j)] for j in range(64))
    # JL: (1/k)·Σ_j proj_j(u)·proj_j(w) estimates ⟨u,w⟩; with u=w the
    # estimate of ||u||² should land within ±50% at k=64
    import struct
    f32 = [struct.unpack("f", struct.pack("f", x))[0] for x in v1]
    true_sq = sum(x * x for x in f32)
    est = sum(rows[(1, j)] ** 2 for j in range(64)) / 64
    assert 0.5 * true_sq < est < 1.5 * true_sq


def test_hard_negative_topk_label_mask(spark):
    import numpy as np

    from gpu_bdb_spark.operators.similarity import hard_negative_topk

    # query 0 (label 0) is nearly identical to vectors 1,2 (label 0) and
    # less similar to 3,4 (label 1): same-label near-dups must NOT
    # appear; the top negatives are exactly 3 then 4.
    rows = [
        (0, [1.0, 0.0, 0.0], 0),
        (1, [0.99, 0.01, 0.0], 0),
        (2, [0.98, 0.02, 0.0], 0),
        (3, [0.8, 0.6, 0.0], 1),
        (4, [0.6, 0.8, 0.0], 1),
        (5, [0.0, 0.0, 1.0], 2),
    ]
    df = spark.createDataFrame(
        rows, "vec_id LONG, embedding ARRAY<FLOAT>, label INT")
    q = df.filter("vec_id = 0")
    got = [(r.neighbor_id, r.rank)
           for r in hard_negative_topk(q, df, k=3)
           .orderBy("rank").collect()]
    assert got == [(3, 1), (4, 2), (5, 3)]


def test_hard_negative_topk_matches_bruteforce(spark):
    import numpy as np

    from gpu_bdb_spark.operators.similarity import hard_negative_topk

    rng = np.random.default_rng(11)
    n, d = 80, 8
    V = rng.normal(size=(n, d))
    labels = (np.arange(n) % 4).astype(int)
    rows = [(int(i), [float(x) for x in V[i]], int(labels[i]))
            for i in range(n)]
    df = spark.createDataFrame(
        rows, "vec_id LONG, embedding ARRAY<FLOAT>, label INT")
    q = df.filter("vec_id % 7 = 0")
    got = {(r.query_id, r.rank): r.neighbor_id
           for r in hard_negative_topk(q, df, k=4, n_groups=8).collect()}
    Vf = V.astype(np.float32).astype(np.float64)
    S = (Vf @ Vf.T) / np.outer(np.linalg.norm(Vf, axis=1),
                               np.linalg.norm(Vf, axis=1))
    for qi in range(0, n, 7):
        mask = labels != labels[qi]
        cand = np.flatnonzero(mask)
        order = cand[np.lexsort((cand, -S[qi][cand]))][:4]
        for rank, nb in enumerate(order, 1):
            assert got[(qi, rank)] == nb


def test_rrf_fuse_semantics(spark):
    from gpu_bdb_spark.operators.similarity import rrf_fuse

    lex = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)],
        "query_id LONG, doc_id LONG, rank LONG")
    sem = spark.createDataFrame(
        [(1, 11, 1), (1, 13, 2)],
        "query_id LONG, doc_id LONG, rank LONG")
    out = {r.doc_id: (r.rrf_score, r.rank)
           for r in rrf_fuse(lex, sem, rrf_k=60, topk=10).collect()}
    # doc 11 appears in both lists: 1/62 + 1/61 ≈ 0.032524 → rank 1
    assert out[11][1] == 1
    assert out[11][0] == round(round(1 / 62, 9) + round(1 / 61, 9), 6)
    # singles order by reciprocal rank: 10 (1/61) > 13 (1/62) > 12 (1/63)
    assert out[10][1] == 2 and out[13][1] == 3 and out[12][1] == 4


def test_mutual_knn_semantics(spark):
    """Reciprocity filter: a hub vector sits in everyone's top-k but
    only its own true neighbors reciprocate — verified against a numpy
    brute-force mutual computation."""
    import numpy as np

    from gpu_bdb_spark.operators.similarity import mutual_knn

    rng = np.random.RandomState(5)
    # 3 tight clusters of 4 + 8 scattered points, dim 16
    base = rng.randn(3, 16)
    vecs = []
    for c in range(3):
        for _ in range(4):
            vecs.append(base[c] + 0.01 * rng.randn(16))
    vecs.extend(rng.randn(8, 16))
    vecs = np.array(vecs, dtype=np.float32)
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vec_id LONG, embedding ARRAY<FLOAT>")
    k = 3
    got = {(r.id_a, r.id_b): (r.rank_ab, r.rank_ba)
           for r in mutual_knn(df, k=k, n_groups=4).collect()}
    # numpy reference
    x = vecs.astype(np.float64)
    x = x / np.linalg.norm(x, axis=1, keepdims=True)
    sim = x @ x.T
    np.fill_diagonal(sim, -np.inf)
    expect = {}
    topk = {}
    for i in range(len(vecs)):
        order = sorted(range(len(vecs)),
                       key=lambda j: (-sim[i, j], j))[:k]
        topk[i] = {j: r + 1 for r, j in enumerate(order)}
    for i in range(len(vecs)):
        for j, r_ij in topk[i].items():
            if i < j and i in topk[j]:
                expect[(i, j)] = (r_ij, topk[j][i])
    assert got == expect
    assert len(expect) >= 6  # the planted clusters actually reciprocate


def test_ivf_quantizer_training_sample_above_bound(spark):
    """Above IVF_TRAIN_BOUND the coarse quantizer fits on a
    deterministic md5 sample (Spark KMeans caches its training frame —
    a full-corpus fit at 1M vectors starves a default heap, SCALE.md
    round 16). Below the bound behavior is bit-identical (train_bound
    ignored); above it the sampled quantizer must still separate
    planted clusters."""
    import numpy as np

    from gpu_bdb_spark.operators.similarity import _fit_centroids

    corpus = _clustered(spark)  # 4 clusters x 50 vectors
    full = _fit_centroids(corpus, 4, "embedding", 7, 5,
                          id_col="vec_id", train_bound=None)
    sampled = _fit_centroids(corpus, 4, "embedding", 7, 5,
                             id_col="vec_id", train_bound=60)
    assert full.shape == sampled.shape
    # the sampled quantizer still assigns the 4 planted cluster means
    # to 4 DISTINCT centroids (separation survives sampling)
    rows = corpus.collect()
    means = {}
    for r in rows:
        means.setdefault(r.vec_id // 50, []).append(r.embedding)
    assigned = set()
    for c, vs in means.items():
        m = np.mean(np.array(vs, dtype=np.float64), axis=0)
        assigned.add(int(np.argmin(((sampled - m) ** 2).sum(axis=1))))
    assert len(assigned) == 4, assigned


def test_ivf_quantizer_n_rows_hint_and_cut_clamp(spark):
    """ADVICE r09: (a) a caller-supplied n_rows skips the sizing
    count() but must pick the SAME deterministic sample (the cut
    depends only on n, not on how it was obtained); (b) a huge
    train_bound with n just above it must clamp the md5 cut below
    16**8 — an unclamped cut formats to the 9-char '100000000' and
    lexicographically under-samples to ~1/16 instead of ~100%."""
    from gpu_bdb_spark.operators.similarity import _fit_centroids

    corpus = _clustered(spark)
    n = corpus.count()
    counted = _fit_centroids(corpus, 4, "embedding", 7, 5,
                             id_col="vec_id", train_bound=60)
    hinted = _fit_centroids(corpus, 4, "embedding", 7, 5,
                            id_col="vec_id", train_bound=60, n_rows=n)
    assert (counted == hinted).all()

    # clamp: ratio rounds to 1.0 -> cut must be 16**8-1 ("ffffffff"),
    # which keeps essentially the whole corpus -> quantizer == the
    # full-corpus fit (every md5 prefix < "ffffffff" w.h.p. here)
    clamped = _fit_centroids(corpus, 4, "embedding", 7, 5,
                             id_col="vec_id", train_bound=10**12,
                             n_rows=10**12 + 1)
    full = _fit_centroids(corpus, 4, "embedding", 7, 5,
                          id_col="vec_id", train_bound=None)
    assert (clamped == full).all()
