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
