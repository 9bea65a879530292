"""Distributed graph analytics over pair/edge frames produced by the
dedup and reuse operators (connected components live in
operators/dedup.py; this module holds the iterative numeric algorithms).

Design notes shared by every operator here:
- Iterative DataFrame loops cut lineage once per round
  (operators/dedup._lineage_cut): localCheckpoint by default, reliable
  checkpoint when a `checkpoint_dir` is given — without the cut,
  ANALYSIS time grows superlinearly with rounds (measured in SCALE.md).
- Per-round numeric accumulation follows the cross-engine exactness
  discipline (gpu_bdb_spark/functions): per-edge contributions are
  quantized to a fixed decimal scale and summed as DECIMAL, so results
  are independent of partitioning, join order, and engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    pairs: DataFrame,
    id1: str = "id_1",
    id2: str = "id_2",
    iters: int = 6,
    damping: float = 0.85,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """PageRank over an UNDIRECTED pair list (each pair becomes two
    directed edges) — graph centrality for data curation: on a
    near-duplicate / passage-reuse graph the high-rank node of each
    component is its most-connected exemplar, a better "keeper" choice
    than min-id when cluster members differ in quality.

    Fixed `iters` rounds of the power iteration
    ``r'(v) = (1-d)/N + d * Σ_{u→v} r(u)/deg(u)``. The symmetrized edge
    list means every node has out-degree ≥ 1 (no dangling-mass term)
    and every node receives ≥ 1 contribution (no vanishing rows).

    One shuffle per round (edge join + destination hash-aggregate);
    ranks and degrees are narrow (id + number). Per-edge contributions
    are rounded to 1e-12 and summed as DECIMAL(28,12); the new rank is
    re-rounded to 1e-9 — every iteration's state is therefore exactly
    representable, making the whole fixed-point loop bit-reproducible
    across engines and partitionings (same recipe as
    operators/text.unigram_nll, proven by the DuckDB recursive-CTE
    oracle in queries/dedup_ops.py).

    Returns (id, rank) for every node of the pair graph.
    """
    from gpu_bdb_spark.operators.dedup import _lineage_cut

    e = pairs.select(F.col(id1).alias("src"), F.col(id2).alias("dst"))
    edges = e.union(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).persist()
    deg = edges.groupBy("src").agg(
        F.count(F.lit(1)).alias("deg")).persist()
    n = deg.count()
    base = (1.0 - damping) / n
    ranks = deg.select(
        F.col("src").alias("id"),
        F.round(F.lit(1.0 / n), 9).alias("rank"))
    for _ in range(iters):
        contrib = (
            edges.join(
                ranks.join(deg, ranks["id"] == deg["src"])
                .select("id", "rank", "deg"),
                edges["src"] == F.col("id"))
            .select(
                F.col("dst"),
                F.round(F.col("rank") / F.col("deg"), 12)
                .cast("decimal(28,12)").alias("c"))
        )
        ranks = _lineage_cut(
            contrib.groupBy("dst")
            .agg(F.sum("c").alias("_s"))
            .select(
                F.col("dst").alias("id"),
                F.round(
                    F.lit(base)
                    + F.lit(damping) * F.col("_s").cast("double"),
                    9).alias("rank")),
            checkpoint_dir,
        )
    edges.unpersist()
    deg.unpersist()
    return ranks
