"""The t2 gate, locally: run every registered query with an oracle through
Spark AND DuckDB and require hash-grade equality (exact values; floats
bit-equal thanks to the decimal/integer-arithmetic discipline).

Timestamps are normalized to pandas datetime64[us] on both sides.
"""

from __future__ import annotations

import pandas as pd
import pytest

from gpu_bdb_spark.queries.registry import all_specs

from .conftest import assert_frames_match

SPECS = {n: s for n, s in all_specs().items() if s.oracle is not None}


def _to_pandas_normalized(df: pd.DataFrame) -> pd.DataFrame:
    for col in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[col]):
            df[col] = df[col].astype("datetime64[us]")
    return df


@pytest.mark.parametrize("name", sorted(SPECS))
def test_oracle_parity(name, spark, duck, sf_dir):
    spec = SPECS[name]
    spark_pdf = _to_pandas_normalized(spec.fn(spark, sf_dir).toPandas())
    oracle_pdf = _to_pandas_normalized(duck.execute(spec.oracle).df())
    assert_frames_match(spark_pdf, oracle_pdf, name=name)
