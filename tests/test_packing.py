"""Sequence-packing invariants: capacity respected (except single
oversize docs), pack ids contiguous per bucket in id order, all docs
kept exactly once, deterministic across partitionings."""

from __future__ import annotations

from pyspark.sql import functions as F

from gpu_bdb_spark.operators.packing import pack_sequences


def _frame(spark, lengths):
    return spark.createDataFrame(
        [(i, int(n)) for i, n in enumerate(lengths)],
        "doc_id long, n_tokens long")


def test_pack_capacity_and_coverage(spark):
    lengths = [100, 300, 250, 90, 700, 10, 10, 10, 380, 50]
    df = _frame(spark, lengths)
    rows = pack_sequences(df, capacity=400, n_buckets=2).collect()
    assert sorted(r.doc_id for r in rows) == list(range(len(lengths)))
    per_pack: dict = {}
    for r in rows:
        per_pack.setdefault((r.bucket, r.pack), []).append(r)
    for members in per_pack.values():
        total = sum(r.n_tokens for r in members)
        assert total <= 400 or len(members) == 1  # oversize doc rides alone
    # pack ids contiguous from 0 per bucket
    for b in {r.bucket for r in rows}:
        packs = sorted({r.pack for r in rows if r.bucket == b})
        assert packs == list(range(len(packs)))


def test_pack_next_fit_order(spark):
    """Packing follows ascending doc_id next-fit exactly."""
    df = _frame(spark, [200, 200, 200]).withColumn(
        "doc_id", F.col("doc_id") * 2)  # all even -> one bucket of 2... 
    rows = pack_sequences(df, capacity=400, n_buckets=1).collect()
    got = {r.doc_id: r.pack for r in rows}
    assert got == {0: 0, 2: 0, 4: 1}


def test_pack_deterministic_across_partitioning(spark):
    lengths = [37 * (i % 13) + 5 for i in range(200)]
    a = {(r.doc_id, r.bucket, r.pack)
         for r in pack_sequences(_frame(spark, lengths).repartition(11),
                                 capacity=300, n_buckets=4).collect()}
    b = {(r.doc_id, r.bucket, r.pack)
         for r in pack_sequences(_frame(spark, lengths).repartition(2),
                                 capacity=300, n_buckets=4).collect()}
    assert a == b
