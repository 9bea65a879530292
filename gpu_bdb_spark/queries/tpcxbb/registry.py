"""Registry of the 30 TPCx-BB queries (lazy import, mirrors the benchmark
runner's dynamic module loading, reference benchmark_runner.py:48-57)."""

from __future__ import annotations

import importlib
from collections.abc import Callable

_MODULES = (
    "gpu_bdb_spark.queries.tpcxbb.q01_q09",
    "gpu_bdb_spark.queries.tpcxbb.q10_q19",
    "gpu_bdb_spark.queries.tpcxbb.q20_q30",
)

TPCXBB_QUERIES: dict[int, Callable] = {}
_loaded = False


def register_q(n: int):
    def deco(fn):
        TPCXBB_QUERIES[n] = fn
        return fn

    return deco


def tpcxbb_query(n: int) -> Callable:
    # A flag, not dict truthiness: importing one query module directly
    # (e.g. for its constants) partially populates the dict and must not
    # suppress loading the rest.
    global _loaded
    if not _loaded:
        for mod in _MODULES:
            importlib.import_module(mod)
        _loaded = True
    return TPCXBB_QUERIES[n]
