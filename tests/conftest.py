"""Shared fixtures: one SparkSession per test session, DuckDB oracle
connection with the driver tables registered as views, and the
pseudo-equality comparator mirroring the driver's check (sorted columns,
order-insensitive rows, exact for non-floats)."""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

from gpu_bdb_spark.io import TABLES, table_path
from gpu_bdb_spark.session import get_spark

#: Tests default to the smallest SF for speed; override to match the
#: driver's correctness gate with SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="gpu_bdb_spark-tests", master="local[4]",
                  shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{table_path(SF_DIR, t)}'")
    yield con
    con.close()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name and rows by all columns — the driver's
    order-insensitive comparison shape."""
    out = df.reindex(sorted(df.columns), axis=1)
    if len(out):
        out = out.sort_values(by=list(out.columns), ignore_index=True)
    return out.reset_index(drop=True)


def assert_frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame,
                        float_rtol: float = 0.0, name: str = "") -> None:
    """Exact on shape/columns/non-float values; floats exact by default
    (our queries are engineered for bit-equality) with opt-in tolerance."""
    a, b = normalize(spark_pdf), normalize(oracle_pdf)
    assert list(a.columns) == list(b.columns), (
        f"{name}: columns {list(a.columns)} != {list(b.columns)}")
    assert len(a) == len(b), f"{name}: rowcount {len(a)} != {len(b)}"
    for col in a.columns:
        av, bv = a[col], b[col]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            af = av.astype(float).to_numpy()
            bf = bv.astype(float).to_numpy()
            both_nan = np.isnan(af) & np.isnan(bf)
            if float_rtol == 0.0:
                ok = (af == bf) | both_nan
            else:
                ok = np.isclose(af, bf, rtol=float_rtol, equal_nan=True)
            assert ok.all(), (
                f"{name}.{col}: float mismatch at rows "
                f"{np.where(~ok)[0][:5]}: {af[~ok][:5]} vs {bf[~ok][:5]}")
        else:
            av = av.astype(object).where(pd.notna(av), None)
            bv = bv.astype(object).where(pd.notna(bv), None)
            mismatch = av.ne(bv) & ~(av.isna() & bv.isna())
            assert not mismatch.any(), (
                f"{name}.{col}: value mismatch at rows "
                f"{list(mismatch[mismatch].index[:5])}: "
                f"{av[mismatch].head().tolist()} vs {bv[mismatch].head().tolist()}")
