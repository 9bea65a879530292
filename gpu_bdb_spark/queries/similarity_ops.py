"""Similarity-search operator coverage (extension surface: brute-force
cosine top-k baseline + LSH-bucketed ANN — BASELINE.json north star).

The brute-force oracle compares neighbor IDs and ranks only: cosine scores
are floats whose last bits differ across engines, but with random vectors
the induced *ordering* is stable (ties broken by neighbor id on both
sides).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gpu_bdb_spark.io import read_table
from gpu_bdb_spark.operators.similarity import (brute_force_topk, ivf_topk,
                                                lsh_topk)
from gpu_bdb_spark.queries.registry import register

ANN_BRUTE_ORACLE = """
WITH q AS (
  SELECT vec_id AS query_id, embedding AS q_vec
  FROM embeddings WHERE vec_id % 10 = 0
),
c AS (
  SELECT vec_id AS neighbor_id, embedding AS c_vec FROM embeddings
),
scored AS (
  SELECT query_id, neighbor_id,
         list_cosine_similarity(CAST(q_vec AS DOUBLE[]),
                                CAST(c_vec AS DOUBLE[])) AS cosine
  FROM q, c
  WHERE query_id <> neighbor_id
),
ranked AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank FROM ranked WHERE rank <= 5
"""


@register("ann_cosine_topk", oracle=ANN_BRUTE_ORACLE,
          tags=("similarity", "ann", "brute-force"), bench=True)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 neighbors for every 10th vector.

    Dot products run in zip_with/aggregate higher-order expressions
    (JVM-side); the per-query top-k is a window heap. The broadcast side is
    the query batch, so the corpus streams once regardless of size.
    """
    e = read_table(spark, sf_dir, "embeddings", ["vec_id", "embedding"],
                   hint_broadcast=False)
    q = e.filter(F.col("vec_id") % 10 == 0)
    return brute_force_topk(q, e, k=5).select("query_id", "neighbor_id", "rank")


@register("ann_ivf_topk", tags=("similarity", "ann", "ivf"))
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-3 for every 100th vector: seeded k-means
    coarse quantizer, 3-of-8 probed lists, grouped-matmul scoring. No
    oracle — k-means centroids are engine-internal float state; recall on
    clustered data is asserted in tests/test_similarity.py; the driver
    records a rows-only check."""
    e = read_table(spark, sf_dir, "embeddings", ["vec_id", "embedding"],
                   hint_broadcast=False)
    q = e.filter(F.col("vec_id") % 100 == 0)
    return ivf_topk(q, e, k=3, n_lists=8, n_probe=3, seed=42).select(
        "query_id", "neighbor_id", "rank")


@register("ann_lsh_topk", tags=("similarity", "ann", "lsh"), bench=True)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate all-pairs top-5 via multi-table random-hyperplane LSH
    (seeded, deterministic). No oracle — recall vs the brute-force ground
    truth is asserted in tests/test_similarity.py; the driver records a
    rows-only check."""
    e = read_table(spark, sf_dir, "embeddings", ["vec_id", "embedding"],
                   hint_broadcast=False)
    return lsh_topk(e, k=5, dim=64, n_planes=4, n_tables=8, seed=42).select(
        "query_id", "neighbor_id", "rank")


@register("knn_graph", tags=("similarity", "ann", "knn-graph"))
def knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN GRAPH over the embedding corpus: every vector's approximate
    top-3 neighbors (corpus-as-queries IVF — the input to SemDeDup-style
    semantic dedup, embedding-space diversity sampling, and
    cluster-connectivity analysis at scales where exact all-pairs is
    impossible). Self-matches excluded. Same IVF machinery as
    `ann_ivf_topk`, so the scale argument carries over: each vector
    probes 3 of 8 lists, scoring is grouped numpy matmul, and the big
    side never shuffles more than its list assignment. No oracle —
    k-means centroids are engine-internal float state; graph recall is
    asserted against brute force in tests/test_similarity.py; the
    driver records a rows-only check."""
    e = read_table(spark, sf_dir, "embeddings", ["vec_id", "embedding"],
                   hint_broadcast=False)
    return ivf_topk(e, e, k=3, n_lists=8, n_probe=3, seed=42).select(
        "query_id", "neighbor_id", "rank")


# ---------------------------------------------------------------------------
# Scalar quantization (float32 -> int8 codes) — vector-storage tier
# ---------------------------------------------------------------------------

QUANTIZE_ORACLE = r"""
WITH x AS (
  SELECT vec_id, i AS dim, CAST(embedding[i] AS DOUBLE) AS x
  FROM embeddings, unnest(generate_series(1, len(embedding))) r(i)
),
s AS (SELECT dim, min(x) AS mn, max(x) AS mx FROM x GROUP BY dim),
c AS (
  SELECT x.vec_id, x.dim,
         CAST(CASE WHEN s.mx - s.mn = 0 THEN 0
              ELSE floor((x.x - s.mn) / (s.mx - s.mn) * 255.0 + 0.5)
              END AS INT) AS code
  FROM x JOIN s USING (dim)
)
SELECT vec_id, array_to_string(list(code ORDER BY dim), ',') AS codes
FROM c GROUP BY vec_id
"""


@register("quantize_embeddings", oracle=QUANTIZE_ORACLE,
          tags=("similarity", "quantization", "storage"))
def quantize_embeddings_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar min/max quantization of the embedding corpus to 8-bit codes
    (float32→uint8 = 4× less for every vector shuffle/scan to carry at
    100 TB, with reconstruction error ≤ range/255/2 per dimension —
    bound pinned in tests/test_similarity.py). The per-dim codebook is
    one broadcast row; codes are chained zip_with passes, fixed double
    evaluation order, so the integer codes are bit-identical
    cross-engine. Serialized to a comma string for the hash compare
    (same pattern as encode_documents)."""
    from gpu_bdb_spark.operators.similarity import quantize_embeddings

    e = read_table(spark, sf_dir, "embeddings", ["vec_id", "embedding"],
                   hint_broadcast=False)
    q = quantize_embeddings(e, "embedding", "vec_id", bits=8)
    return q.select(
        "vec_id", F.array_join("codes", ",").alias("codes"))


# ---------------------------------------------------------------------------
# k-NN classification (leave-one-out majority vote) — exact oracle
# ---------------------------------------------------------------------------

KNN_CLASSIFY_ORACLE = """
WITH scored AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, b.label,
         list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                CAST(b.embedding AS DOUBLE[])) AS cosine
  FROM embeddings a, embeddings b
  WHERE a.vec_id <> b.vec_id
),
ranked AS (
  SELECT query_id, label,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
),
votes AS (
  SELECT query_id, label, CAST(count(*) AS BIGINT) AS n_votes
  FROM ranked WHERE rank <= 5 GROUP BY 1, 2
),
best AS (
  SELECT query_id, label, n_votes,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY n_votes DESC, label) AS rn
  FROM votes
)
SELECT b.query_id AS vec_id, b.label AS pred_label, b.n_votes,
       e.label AS true_label
FROM best b JOIN embeddings e ON e.vec_id = b.query_id
WHERE b.rn = 1
"""


@register("knn_classify", oracle=KNN_CLASSIFY_ORACLE,
          tags=("similarity", "knn", "classification"))
def knn_classify_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out k-NN classification over the embedding corpus:
    every vector's label predicted as the majority label of its 5
    nearest (cosine) other vectors, ties broken toward the smaller
    label id. Exactly oracled end-to-end — neighbor sets, vote counts,
    and the argmax all integer-deterministic on top of the
    already-hash-verified brute-force ranking. The label side joins on
    neighbor_id AFTER the top-k cut, so the shuffle carries N·k rows,
    never N² (at real scale swap `brute_force_topk` for `ivf_topk`
    candidates — same vote/argmax tail)."""
    from pyspark.sql import Window

    from gpu_bdb_spark.operators.similarity import brute_force_topk

    e = read_table(spark, sf_dir, "embeddings",
                   ["vec_id", "embedding", "label"], hint_broadcast=False)
    vecs = e.select("vec_id", "embedding")
    nn = brute_force_topk(vecs, vecs, k=5)
    lab = e.select(F.col("vec_id").alias("neighbor_id"), "label")
    votes = (
        nn.join(lab, "neighbor_id")
        .groupBy("query_id", "label")
        .agg(F.count(F.lit(1)).cast("long").alias("n_votes"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("n_votes"),
                                               F.asc("label"))
    best = votes.withColumn("rn", F.row_number().over(w)) \
                .filter(F.col("rn") == 1)
    truth = e.select("vec_id", F.col("label").alias("true_label"))
    return (
        best.select(F.col("query_id").alias("vec_id"),
                    F.col("label").alias("pred_label"), "n_votes")
        .join(truth, "vec_id")
    )


SRP_ORACLE = """
WITH planes AS (
  SELECT CAST(j AS BIGINT) AS j, CAST(d AS BIGINT) AS d,
         CAST(1 - 2 * (CAST(concat('0x',
              substr(md5(j || ':' || d), 1, 8)) AS BIGINT) % 2) AS DOUBLE)
           AS s
  FROM generate_series(0, 7) t1(j), generate_series(0, 63) t2(d)
),
comps AS (
  SELECT vec_id, d - 1 AS d, CAST(embedding[d] AS DOUBLE) AS v
  FROM embeddings, unnest(generate_series(1, len(embedding))) r(d)
)
SELECT c.vec_id, p.j,
       CAST(SUM(CAST(round(p.s * c.v, 9) AS DECIMAL(28,9))) AS DOUBLE)
         AS proj
FROM comps c JOIN planes p USING (d)
GROUP BY c.vec_id, p.j
"""


@register("project_embeddings_srp", oracle=SRP_ORACLE,
          tags=("similarity", "embedding", "projection", "jl"))
def project_embeddings_srp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded signed-random-projection (JL) reduction of the embedding
    corpus to k=8 components: explode → broadcast sign-table join →
    decimal-quantized hash aggregate; exact cross-engine (the sign table
    derives from portable md5, the sums from quantized decimals)."""
    from gpu_bdb_spark.operators.similarity import signed_random_projection

    e = read_table(spark, sf_dir, "embeddings", ["vec_id", "embedding"],
                   hint_broadcast=False)
    return signed_random_projection(e, k=8)


HARD_NEG_ORACLE = """
WITH q AS (
  SELECT vec_id AS query_id, embedding AS q_vec, label AS q_label
  FROM embeddings WHERE vec_id % 10 = 0
),
c AS (
  SELECT vec_id AS neighbor_id, embedding AS c_vec, label AS c_label
  FROM embeddings
),
scored AS (
  SELECT query_id, neighbor_id,
         list_cosine_similarity(CAST(q_vec AS DOUBLE[]),
                                CAST(c_vec AS DOUBLE[])) AS cosine
  FROM q, c
  WHERE q_label <> c_label
),
ranked AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank FROM ranked WHERE rank <= 5
"""


@register("hard_negatives", oracle=HARD_NEG_ORACLE,
          tags=("similarity", "contrastive", "ann"))
def hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive hard-negative mining: exact cosine top-5 among
    DIFFERENT-label vectors for every 10th embedding. The label mask is
    applied inside the per-shard scorer before its local top-k (a
    label-blind local top-k could evict true cross-label winners);
    ids/ranks hash-compared, floats excluded as in ann_cosine_topk."""
    from gpu_bdb_spark.operators.similarity import hard_negative_topk

    e = read_table(spark, sf_dir, "embeddings",
                   ["vec_id", "embedding", "label"], hint_broadcast=False)
    q = e.filter(F.col("vec_id") % 10 == 0)
    return hard_negative_topk(q, e, k=5).select(
        "query_id", "neighbor_id", "rank")


def _hybrid_oracle() -> str:
    from gpu_bdb_spark.queries.text_ops import BM25_ORACLE

    return f"""
WITH l AS (
  SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, rank
  FROM ({BM25_ORACLE})
),
s AS (
  WITH q2 AS (
    SELECT vec_id AS query_id, embedding AS q_vec
    FROM embeddings WHERE vec_id IN (1, 2, 3)
  ),
  c2 AS (
    SELECT vec_id AS neighbor_id, embedding AS c_vec FROM embeddings
  ),
  sc2 AS (
    SELECT query_id, neighbor_id,
           list_cosine_similarity(CAST(q_vec AS DOUBLE[]),
                                  CAST(c_vec AS DOUBLE[])) AS cosine
    FROM q2, c2 WHERE query_id <> neighbor_id
  )
  SELECT query_id, neighbor_id AS doc_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id) AS rank
  FROM sc2 QUALIFY rank <= 10
),
f AS (
  SELECT COALESCE(l.query_id, s.query_id) AS query_id,
         COALESCE(l.doc_id, s.doc_id) AS doc_id,
         COALESCE(CAST(round(1.0 / (60 + l.rank), 9) AS DECIMAL(28,9)),
                  CAST(0 AS DECIMAL(28,9)))
         + COALESCE(CAST(round(1.0 / (60 + s.rank), 9) AS DECIMAL(28,9)),
                    CAST(0 AS DECIMAL(28,9))) AS ssum
  FROM l FULL OUTER JOIN s
    ON l.query_id = s.query_id AND l.doc_id = s.doc_id
)
SELECT query_id, doc_id, round(CAST(ssum AS DOUBLE), 6) AS rrf_score,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY ssum DESC, doc_id) AS BIGINT)
         AS rank
FROM f QUALIFY rank <= 10
"""


@register("hybrid_search_rrf", oracle=_hybrid_oracle(),
          tags=("similarity", "ir", "rrf", "hybrid"))
def hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 term ranking fused with exact cosine
    ranking by reciprocal-rank fusion (k=60). Only integer ranks cross
    the fusion boundary, so engine-variant float scores never touch the
    hash; reciprocal terms are 1e-9-quantized and decimal-summed. Query
    ids 1-3 anchor on embeddings 1-3 and the fixed BM25 term sets."""
    from gpu_bdb_spark.operators.similarity import (brute_force_topk,
                                                    rrf_fuse)
    from gpu_bdb_spark.operators.text import bm25_scores
    from gpu_bdb_spark.queries.text_ops import BM25_QUERIES

    d = read_table(spark, sf_dir, "documents", ["doc_id", "text"],
                   hint_broadcast=False)
    qterms = spark.createDataFrame(
        list(BM25_QUERIES), "query_id int, term string")
    lexical = bm25_scores(d, qterms, "text", "doc_id", k1=1.2, b=0.75,
                          k=10).select(
        F.col("query_id").cast("long").alias("query_id"),
        "doc_id", "rank")
    e = read_table(spark, sf_dir, "embeddings", ["vec_id", "embedding"],
                   hint_broadcast=False)
    anchors = e.filter(F.col("vec_id").isin(1, 2, 3))
    semantic = brute_force_topk(anchors, e, k=10).select(
        "query_id", F.col("neighbor_id").alias("doc_id"), "rank")
    return rrf_fuse(lexical, semantic, rrf_k=60, topk=10)


CENTROIDS_ORACLE = """
WITH u AS (
  SELECT label, i - 1 AS dim,
         CAST(ROUND(CAST(embedding[i] AS DOUBLE), 9) AS DECIMAL(28,9))
           AS v
  FROM embeddings, unnest(generate_series(1, len(embedding))) t(i)
)
SELECT CAST(label AS INT) AS label, CAST(dim AS INT) AS dim,
       COUNT(*) AS n,
       ROUND(CAST(SUM(v) AS DOUBLE) / COUNT(*), 6) AS centroid
FROM u GROUP BY label, dim
"""


@register("label_centroids", oracle=CENTROIDS_ORACLE,
          tags=("similarity", "vector-agg", "centroid"))
def label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-label embedding centroids in long form (label, dim, n,
    centroid): components quantized to 1e-9 and decimal-summed, so the
    mean is partitioning- and engine-independent — the exact-oracled
    counterpart of the k-means operator's float-internal centroids.
    posexplode → one hash aggregate on (label, dim); the shuffle
    carries (int, int, decimal), never vectors."""
    e = read_table(spark, sf_dir, "embeddings", ["embedding", "label"],
                   hint_broadcast=False)
    u = e.select(
        F.col("label").cast("int").alias("label"),
        F.posexplode("embedding").alias("dim", "_x"),
    ).select(
        "label", F.col("dim").cast("int").alias("dim"),
        F.round(F.col("_x").cast("double"), 9)
        .cast("decimal(28,9)").alias("v"),
    )
    return u.groupBy("label", "dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("v").cast("double") / F.count(F.lit(1)), 6)
        .alias("centroid"),
    )


MUTUAL_KNN_ORACLE = """
WITH c AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
scored AS (
  SELECT a.vec_id AS qa, b.vec_id AS qb,
         list_cosine_similarity(a.v, b.v) AS cos
  FROM c a JOIN c b ON a.vec_id <> b.vec_id
),
ranked AS (
  SELECT qa, qb,
         row_number() OVER (PARTITION BY qa
                            ORDER BY cos DESC, qb) AS rank
  FROM scored
),
k AS (SELECT qa, qb, rank FROM ranked WHERE rank <= 5)
SELECT x.qa AS id_a, x.qb AS id_b,
       CAST(x.rank AS BIGINT) AS rank_ab,
       CAST(y.rank AS BIGINT) AS rank_ba
FROM k x JOIN k y ON x.qa = y.qb AND x.qb = y.qa
WHERE x.qa < x.qb
"""


@register("mutual_knn", oracle=MUTUAL_KNN_ORACLE,
          tags=("similarity", "reciprocal-knn", "ann"))
def mutual_knn_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal cosine top-5 pairs over the embedding corpus: hub
    vectors that never reciprocate drop out. Sharded numpy self-search
    + swapped-pair self-join; ids/ranks hash-compared against the
    exhaustive quadratic ranking, floats excluded as everywhere in the
    ANN family."""
    from gpu_bdb_spark.operators.similarity import mutual_knn

    e = read_table(spark, sf_dir, "embeddings", ["vec_id", "embedding"],
                   hint_broadcast=False)
    return mutual_knn(e, k=5)


GRAM_ORACLE = """
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
p AS (
  SELECT i.i AS i, j.j AS j,
         CAST(round(v.v[i.i + 1] * v.v[j.j + 1], 6) AS DECIMAL(28,6)) AS t
  FROM v, range(0, 64) i(i), range(0, 64) j(j)
  WHERE i.i <= j.j
)
SELECT CAST(i AS INT) AS i, CAST(j AS INT) AS j,
       CAST(SUM(t) AS DOUBLE) AS s
FROM p GROUP BY i, j
"""


@register("embedding_gram", oracle=GRAM_ORACLE,
          tags=("embedding", "linear-algebra", "pca"))
def embedding_gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Gram matrix XᵀX of the embedding corpus (upper triangle,
    dim 64 → 2080 entries) — the one-pass reduction behind PCA,
    whitening, and covariance diagnostics. Per-term products are
    quantized round-6 then summed in DECIMAL, so every entry is order-
    independent and engine-exact.

    Shape here: positional explode + self-join on vec_id + one hash
    aggregate to d(d+1)/2 groups (map-side partials). At 100 TB the
    production shape is a mapInPandas partial-Gram per partition (numpy
    X_pᵀX_p, d² floats shuffled per partition — no row blowup); this
    decimal explode form is the verification tier, same contract."""
    e = read_table(spark, sf_dir, "embeddings", ["vec_id", "embedding"],
                   hint_broadcast=False)
    vd = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    xs = e.select("vec_id", F.posexplode(vd).alias("i", "x"))
    ys = xs.withColumnsRenamed({"i": "j", "x": "y"})
    return (
        xs.join(ys, "vec_id")
        .filter(F.col("i") <= F.col("j"))
        .groupBy("i", "j")
        .agg(F.sum(F.round(F.col("x") * F.col("y"), 6)
                   .cast("decimal(28,6)")).alias("_s"))
        .select(F.col("i").cast("int"), F.col("j").cast("int"),
                F.col("_s").cast("double").alias("s"))
    )


def _pca_power_oracle(dim: int = 64, iters: int = 8) -> str:
    """Unrolled power iteration over the exact decimal Gram: term
    products round-12 → DECIMAL sums (order-free matvec), L∞
    normalization by the max-|w| component (ties → smallest i), round-9
    iterates — every step replayed bit-for-bit."""
    ctes = [
        "v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vv "
        "FROM embeddings)",
        f"p AS (SELECT i.i AS i, j.j AS j, "
        f"CAST(round(v.vv[i.i + 1] * v.vv[j.j + 1], 6) AS DECIMAL(28,6)) "
        f"AS t FROM v, range(0, {dim}) i(i), range(0, {dim}) j(j) "
        f"WHERE i.i <= j.j)",
        "gu AS (SELECT i, j, CAST(SUM(t) AS DOUBLE) AS g "
        "FROM p GROUP BY i, j)",
        "gm AS MATERIALIZED (SELECT i, j, g FROM gu UNION ALL "
        "SELECT j, i, g FROM gu WHERE i < j)",
        f"v0 AS (SELECT i AS i, 1.0 AS x FROM range(0, {dim}) r(i))",
    ]
    for t in range(1, iters + 1):
        ctes.append(
            f"w{t} AS MATERIALIZED (SELECT gm.i, "
            f"SUM(CAST(round(gm.g * v{t - 1}.x, 12) AS DECIMAL(38,12))) "
            f"AS w FROM gm JOIN v{t - 1} ON gm.j = v{t - 1}.i "
            f"GROUP BY gm.i)")
        ctes.append(
            f"m{t} AS (SELECT CAST(w AS DOUBLE) AS m FROM w{t} "
            f"ORDER BY abs(CAST(w AS DOUBLE)) DESC, i LIMIT 1)")
        ctes.append(
            f"v{t} AS MATERIALIZED (SELECT w{t}.i, "
            f"round(CAST(w{t}.w AS DOUBLE) / m{t}.m, 9) AS x "
            f"FROM w{t}, m{t})")
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT CAST(i AS INT) AS i, x AS loading FROM v{iters}")


@register("pca_power", oracle=_pca_power_oracle(64, 8),
          tags=("embedding", "linear-algebra", "pca", "iterative"))
def pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal direction of the embedding corpus by POWER
    ITERATION on the exact decimal Gram matrix: 8 matvec rounds with
    round-12 decimal term quantization (order-free sums), L∞
    normalization by the max-|component| (ties → smallest index),
    round-9 iterates — the same bit-reproducible-fixed-point discipline
    as pagerank_neardup, so the DuckDB oracle replays every iteration
    exactly.

    Scale shape: the DATA-sized work is the one-pass Gram reduction
    (embedding_gram); the iteration then runs on the collected
    d(d+1)/2-row Gram — dimension-sized, the BPE best-pair precedent —
    so adding iterations costs zero extra corpus scans. (Contrast
    PageRank, where the graph is data-sized and each round is a
    distributed join.)"""
    import decimal as _dec

    gram = embedding_gram(spark, sf_dir).collect()
    dim, iters = 64, 8
    g: dict[tuple[int, int], float] = {}
    for r in gram:
        g[(r["i"], r["j"])] = float(r["s"])
        g[(r["j"], r["i"])] = float(r["s"])
    q12 = _dec.Decimal("1e-12")
    q9 = _dec.Decimal("1e-9")
    v = [1.0] * dim
    for _ in range(iters):
        w = []
        for i in range(dim):
            acc = _dec.Decimal(0)
            for j in range(dim):
                acc += _dec.Decimal(repr(g[(i, j)] * v[j])).quantize(
                    q12, rounding=_dec.ROUND_HALF_UP)
            w.append(acc)
        wf = [float(x) for x in w]
        m_idx = sorted(range(dim), key=lambda i: (-abs(wf[i]), i))[0]
        m = wf[m_idx]
        v = [float(_dec.Decimal(repr(wf[i] / m)).quantize(
            q9, rounding=_dec.ROUND_HALF_UP)) for i in range(dim)]
    return spark.createDataFrame(
        [(i, v[i]) for i in range(dim)], "i int, loading double")
