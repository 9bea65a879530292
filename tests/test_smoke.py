"""Smoke coverage: entry() contract + every registered query (including
oracle-less ML/LSH ones) runs and returns a well-formed DataFrame."""

from __future__ import annotations

import pytest

from gpu_bdb_spark.queries.registry import all_specs

NO_ORACLE = {n: s for n, s in all_specs().items() if s.oracle is None}


def test_entry_contract(spark):
    import __spark_entry__ as mod

    df = mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(mod.oracle_sql()) <= set(mod.queries())


@pytest.mark.parametrize("name", sorted(NO_ORACLE))
def test_no_oracle_queries_run(name, spark, sf_dir):
    spec = NO_ORACLE[name]
    df = spec.fn(spark, sf_dir)
    assert df.columns  # stable schema
    assert df.count() >= 0


def test_approx_count_distinct_error_bound(spark, sf_dir):
    from gpu_bdb_spark.queries.registry import all_specs

    rows = all_specs()["approx_distinct_parts"].fn(spark, sf_dir).collect()
    for r in rows:
        rel_err = abs(r.approx_parts - r.exact_parts) / max(r.exact_parts, 1)
        assert rel_err <= 0.10, f"{r.l_returnflag}: rel err {rel_err:.3f}"
