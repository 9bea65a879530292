"""Unit/property tests for the round-5 operators: PageRank, greedy
k-center sampling, leakage-safe splitting, char entropy. The driver-grade
oracle parity is covered by test_oracle_parity (auto-discovered); these
pin algorithmic properties a hash can't explain."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from gpu_bdb_spark.operators.graph import pagerank
from gpu_bdb_spark.operators.sampling import (farthest_point_sample,
                                              leakage_safe_split)
from gpu_bdb_spark.operators.text import char_entropy


def _ref_pagerank(edges, iters=6, d=0.85):
    """Driver-side reference implementing the identical quantization."""
    out: dict[int, list[int]] = {}
    for a, b in edges:
        out.setdefault(a, []).append(b)
        out.setdefault(b, []).append(a)
    n = len(out)
    rank = {v: round(1.0 / n, 9) for v in out}
    for _ in range(iters):
        acc = {v: 0.0 for v in out}
        for u, nbrs in out.items():
            c = round(rank[u] / len(nbrs), 12)
            for v in nbrs:
                acc[v] = round(acc[v] + c, 12)  # decimal-exact at 1e-12
        rank = {v: round((1.0 - d) / n + d * acc[v], 9) for v in out}
    return rank


def test_pagerank_matches_reference_chain_plus_clique(spark):
    # path 1-2-3 attached to a triangle 3-4-5: asymmetric degrees.
    edges = [(1, 2), (2, 3), (3, 4), (3, 5), (4, 5)]
    pairs = spark.createDataFrame(edges, "id_1 bigint, id_2 bigint")
    got = {r["id"]: r["rank"] for r in pagerank(pairs, iters=6).collect()}
    want = _ref_pagerank(edges)
    assert got.keys() == want.keys()
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9)
    # mass conservation: no dangling loss on a symmetrized graph
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-6)
    # the chain-and-triangle hub has the top rank
    assert max(got, key=got.get) == 3


def test_pagerank_uniform_on_regular_graph(spark):
    # a 4-cycle is 2-regular: PageRank must stay exactly uniform
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1)], "id_1 bigint, id_2 bigint")
    got = {r["id"]: r["rank"] for r in pagerank(pairs, iters=4).collect()}
    assert set(got.values()) == {0.25}


def _ref_fps(vecs, k):
    ids = sorted(vecs)
    sel = [ids[0]]
    d = {i: round(math.dist(vecs[i], vecs[sel[0]]), 6) for i in ids}
    out = [(1, sel[0], 0.0)]
    for rank in range(2, k + 1):
        nxt = max(ids, key=lambda i: (d[i], -i))
        out.append((rank, nxt, d[nxt]))
        for i in ids:
            d[i] = min(d[i], round(math.dist(vecs[i], vecs[nxt]), 6))
    return out


def test_farthest_point_sample_matches_reference(spark):
    import random

    rng = random.Random(7)
    vecs = {i: [rng.uniform(-1, 1) for _ in range(8)] for i in range(40)}
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs.items()],
        "vec_id bigint, embedding array<float>")
    # float32 storage: reference must see the same float32-rounded values
    import struct

    f32 = {i: [struct.unpack("f", struct.pack("f", x))[0] for x in v]
           for i, v in vecs.items()}
    got = [(r["rank"], r["vec_id"], r["dist"])
           for r in farthest_point_sample(df, k=5).collect()]
    assert sorted(got) == _ref_fps(f32, 5)


def test_fps_parallel_coverage_within_2x_of_exact(spark):
    """strategy='parallel' (log-round oversampled pool + exact FPS over
    the pool) must cover the dataset within 2× the exact greedy FPS
    coverage radius — the scale path trades driver round-trips for a
    bounded approximation loss."""
    import math
    import random

    rng = random.Random(11)
    # 6 well-separated cluster centers + noise: far-structure that a
    # bad pool would miss
    centers = [[rng.uniform(-10, 10) for _ in range(6)] for _ in range(6)]
    vecs = {}
    for i in range(120):
        c = centers[i % 6]
        vecs[i] = [x + rng.uniform(-0.5, 0.5) for x in c]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs.items()],
        "vec_id bigint, embedding array<double>")

    def radius(center_ids):
        cs = [vecs[i] for i in center_ids]
        return max(
            min(math.dist(v, c) for c in cs) for v in vecs.values())

    exact = [r["vec_id"]
             for r in farthest_point_sample(df, k=6).collect()]
    par = [r["vec_id"]
           for r in farthest_point_sample(
               df, k=6, strategy="parallel").collect()]
    assert len(par) == 6
    assert radius(par) <= 2.0 * radius(exact), (radius(par), radius(exact))


def test_fps_parallel_round_bound_is_log_k(spark):
    """The distributed round count is ⌈log₂k⌉ — the structural O(log k)
    bound that replaces exact FPS's k driver round-trips — and the
    candidate pool stays ≈ oversample·k."""
    import math

    from gpu_bdb_spark.operators.sampling import parallel_fps_schedule

    for k in (2, 6, 8, 64, 1024):
        rounds, ell = parallel_fps_schedule(k)
        assert rounds == max(1, math.ceil(math.log2(k)))
        assert rounds * ell <= 4.0 * k + rounds  # pool ≈ oversample·k


def test_farthest_point_selection_dists_decrease(spark, sf_dir):
    from gpu_bdb_spark.io import read_table

    e = read_table(spark, sf_dir, "embeddings", ["vec_id", "embedding"],
                   hint_broadcast=False)
    rows = sorted(
        (r["rank"], r["dist"])
        for r in farthest_point_sample(e, k=5).collect())
    dists = [d for _, d in rows[1:]]
    # greedy k-center invariant: selection distances are non-increasing
    assert all(a >= b for a, b in zip(dists, dists[1:]))
    assert dists[0] > 0.0


def test_leakage_split_keeps_clusters_together(spark, sf_dir):
    from gpu_bdb_spark.io import read_table
    from gpu_bdb_spark.operators.dedup import (duplicate_clusters,
                                               jaccard_pairs, shingle_sets)

    d = read_table(spark, sf_dir, "documents", ["doc_id", "text"],
                   hint_broadcast=False)
    pairs = jaccard_pairs(shingle_sets(d, "text", "doc_id", n=2), 0.6)
    split = leakage_safe_split(d, duplicate_clusters(pairs), 0.9)
    # no near-dup pair may cross the split boundary
    s1 = split.select(F.col("doc_id").alias("id_1"),
                      F.col("split").alias("split_1"))
    s2 = split.select(F.col("doc_id").alias("id_2"),
                      F.col("split").alias("split_2"))
    crossing = (pairs.join(s1, "id_1").join(s2, "id_2")
                .filter(F.col("split_1") != F.col("split_2")).count())
    assert crossing == 0
    # both sides populated and roughly 90/10
    frac = (split.filter(F.col("split") == "train").count()
            / split.count())
    assert 0.8 < frac < 0.97


def test_char_entropy_known_values(spark):
    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "ab"), (3, "abcd")], "doc_id bigint, text string")
    got = {r["doc_id"]: (r["n_chars"], r["entropy"])
           for r in char_entropy(df).collect()}
    assert got[1] == (4, 0.0)
    assert got[2] == (2, round(math.log(2), 6))
    assert got[3] == (4, round(math.log(4), 6))


def test_weighted_sample_properties(spark, sf_dir):
    """ES weighted sampling: the weighted sample skews heavy, a
    dominant weight is always included, and the top-k compiles to a
    distributed TakeOrderedAndProject (no global sort)."""
    from pyspark.sql import functions as F

    from gpu_bdb_spark.io import read_table
    from gpu_bdb_spark.operators.sampling import weighted_sample_topk
    from gpu_bdb_spark.plans import formatted_plan, has_top_k

    d = read_table(spark, sf_dir, "documents", ["doc_id", "n_chars"],
                   hint_broadcast=False)
    samp = weighted_sample_topk(d, 50, F.col("n_chars"))
    assert has_top_k(formatted_plan(samp))
    mean_all = d.agg(F.avg("n_chars")).collect()[0][0]
    mean_samp = samp.agg(F.avg("weight")).collect()[0][0]
    assert mean_samp > mean_all, "weighted sample must skew heavy"
    # a dominant weight wins regardless of its hash draw
    boosted = d.withColumn(
        "n_chars",
        F.when(F.col("doc_id") == 7, F.lit(10_000_000))
        .otherwise(F.col("n_chars")))
    top = weighted_sample_topk(boosted, 5, F.col("n_chars")).collect()
    assert 7 in {r["doc_id"] for r in top}


def test_triangle_count_known_graphs(spark):
    from gpu_bdb_spark.operators.graph import triangle_count

    # K4: every node is in C(3,2)=3 triangles
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    df = spark.createDataFrame(k4, "id_1 LONG, id_2 LONG")
    got = {r.node: r.n_triangles for r in triangle_count(df).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}

    # path graph: no triangles at all
    path = spark.createDataFrame(
        [(i, i + 1) for i in range(5)], "id_1 LONG, id_2 LONG")
    assert triangle_count(path).count() == 0

    # duplicate / reversed / self-loop edges are canonicalized away
    messy = spark.createDataFrame(
        [(0, 1), (1, 0), (1, 2), (2, 0), (0, 0), (1, 2)],
        "id_1 LONG, id_2 LONG")
    got = {r.node: r.n_triangles for r in triangle_count(messy).collect()}
    assert got == {0: 1, 1: 1, 2: 1}


def test_triangle_count_matches_bruteforce(spark):
    import itertools
    import random

    from gpu_bdb_spark.operators.graph import triangle_count

    rng = random.Random(3)
    n = 16
    edges = [(a, b) for a in range(n) for b in range(a + 1, n)
             if rng.random() < 0.35]
    adj = {v: set() for v in range(n)}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    expected = {}
    for x, y, z in itertools.combinations(range(n), 3):
        if y in adj[x] and z in adj[x] and z in adj[y]:
            for v in (x, y, z):
                expected[v] = expected.get(v, 0) + 1
    df = spark.createDataFrame(edges, "id_1 LONG, id_2 LONG")
    got = {r.node: r.n_triangles for r in triangle_count(df).collect()}
    assert got == expected


def test_triangle_count_plan_equi_joins_only(spark, sf_dir):
    from gpu_bdb_spark.io import read_table
    from gpu_bdb_spark.operators.graph import triangle_count
    from gpu_bdb_spark.plans import formatted_plan

    li = read_table(spark, sf_dir, "lineitem", ["l_orderkey", "l_partkey"],
                    hint_broadcast=False)
    l2 = li.withColumnsRenamed({"l_partkey": "p2"})
    edges = (
        li.join(l2, "l_orderkey")
        .filter(F.col("l_partkey") < F.col("p2"))
        .select(F.col("l_partkey").alias("id_1"),
                F.col("p2").alias("id_2"))
    )
    plan = formatted_plan(triangle_count(edges))
    assert "Cartesian" not in plan and "NestedLoop" not in plan


def test_random_walks_follow_edges_and_are_deterministic(spark):
    import hashlib

    from gpu_bdb_spark.operators.graph import random_walks

    edges = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)]
    df = spark.createDataFrame(edges, "id_1 LONG, id_2 LONG")
    out = {r.walk_id: r.path
           for r in random_walks(df, walk_length=3, seed="s").collect()}
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    assert set(out) == set(adj)
    for wid, path in out.items():
        nodes = [int(x) for x in path.split(",")]
        assert nodes[0] == wid and len(nodes) == 4
        for u, v in zip(nodes, nodes[1:]):
            assert v in adj[u], f"walk used a non-edge {u}->{v}"

    # replay the portable RNG in plain python: identical chains
    for wid in adj:
        cur, expect = wid, [wid]
        for t in range(1, 4):
            nbrs = sorted(adj[cur])
            h = int(hashlib.md5(
                f"s:{wid}:{t}:{cur}".encode()).hexdigest()[:8], 16)
            cur = nbrs[h % len(nbrs)]
            expect.append(cur)
        assert out[wid] == ",".join(str(x) for x in expect)

    again = {r.walk_id: r.path
             for r in random_walks(df, walk_length=3, seed="s").collect()}
    assert again == out
    other_seed = {r.walk_id: r.path
                  for r in random_walks(df, walk_length=3, seed="t")
                  .collect()}
    assert other_seed != out


def test_kcore_converges_and_is_true_core(spark, sf_dir):
    """The 8-round bounded peel has converged on the fixture graph
    (round 9 changes nothing ⇒ output IS the true 3-core), and every
    surviving node has degree ≥ 3 within the core."""
    from gpu_bdb_spark.operators.graph import kcore
    from gpu_bdb_spark.queries.dedup_ops import _copurchase_edges

    edges = _copurchase_edges(spark, sf_dir)
    r8 = {(r["node"], r["degree"])
          for r in kcore(edges, k=3, rounds=8).collect()}
    r9 = {(r["node"], r["degree"])
          for r in kcore(edges, k=3, rounds=9).collect()}
    assert r8 == r9
    assert r8 and all(d >= 3 for _, d in r8)
