"""Count-min sketch: never-underestimate property, exact-on-sparse
behavior, merge-by-addition, and the constant-size bound."""

from __future__ import annotations

from pyspark.sql import functions as F

from gpu_bdb_spark.operators.sketch import cms_build, cms_estimate


def _keys(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "key STRING")


def test_cms_never_underestimates_and_exact_when_sparse(spark):
    vals = [f"k{i}" for i in range(30) for _ in range(i % 5 + 1)]
    df = _keys(spark, vals)
    sketch = cms_build(df, F.col("key"), depth=4, width=512)
    est = cms_estimate(sketch, df.distinct(), "key", depth=4, width=512)
    true = {r.key: r.cnt for r in
            df.groupBy("key").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    got = {r.key: r.est_cnt for r in est.collect()}
    assert set(got) == set(true)
    for k, t in true.items():
        assert got[k] >= t
    # 30 keys in 4×512 buckets: collisions essentially impossible per
    # row, and min-over-4-rows makes them vanish → exact
    assert got == true


def test_cms_size_bound_and_merge(spark):
    df = _keys(spark, [f"x{i % 17}" for i in range(400)])
    sk = cms_build(df, F.col("key"), depth=3, width=32)
    assert sk.count() <= 3 * 32
    # merging two half-sketches by counter addition == one full sketch
    h1 = _keys(spark, [f"x{i % 17}" for i in range(200)])
    h2 = _keys(spark, [f"x{i % 17}" for i in range(200, 400)])
    merged = (
        cms_build(h1, F.col("key"), depth=3, width=32)
        .unionAll(cms_build(h2, F.col("key"), depth=3, width=32))
        .groupBy("d", "b").agg(F.sum("c").alias("c"))
    )
    full = {(r.d, r.b): r.c for r in sk.collect()}
    got = {(r.d, r.b): r.c for r in merged.collect()}
    assert got == full


def test_registry_has_cms_entry():
    from gpu_bdb_spark.queries.registry import all_specs, oracle_sql

    assert "cms_user_counts" in all_specs()
    assert oracle_sql()["cms_user_counts"]
