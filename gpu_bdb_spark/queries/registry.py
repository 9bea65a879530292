"""Registry wiring query callables to their DuckDB oracle SQL.

Driver contract (__spark_entry__.py): every operator claimed from
SURVEY.md §2 needs a `queries()` entry `(spark, sf_dir) -> DataFrame` and,
when SQL-expressible, a matching `oracle_sql()` string that DuckDB runs on
the same parquet tables. Column names must match exactly; the driver sorts
columns by name and hash-compares values order-insensitively.

Registration is decorator-based; query modules are imported lazily on first
access so `import gpu_bdb_spark` stays cheap.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from gpu_bdb_spark.session import ensure_runtime_conf

#: Modules that register queries at import time.
_QUERY_MODULES = (
    "gpu_bdb_spark.queries.relational",
    "gpu_bdb_spark.queries.advanced",
    "gpu_bdb_spark.queries.windows",
    "gpu_bdb_spark.queries.text_ops",
    "gpu_bdb_spark.queries.dedup_ops",
    "gpu_bdb_spark.queries.similarity_ops",
    "gpu_bdb_spark.queries.ml_ops",
    "gpu_bdb_spark.queries.custom_ops",
    "gpu_bdb_spark.queries.temporal_ops",
    "gpu_bdb_spark.queries.pipeline_ops",
    "gpu_bdb_spark.queries.behavior_ops",
    "gpu_bdb_spark.queries.linkage_ops",
)


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    tags: tuple[str, ...] = field(default_factory=tuple)
    bench: bool = False  # include in bench.py headline set


_REGISTRY: dict[str, QuerySpec] = {}
_LOADED = False

#: When True (default), every registry query clears the Spark cache at
#: DataFrame-CONSTRUCTION time (the sequential-driver contract below).
#: `interleaved_collection()` suspends this for harnesses that build
#: several entries before collecting them.
_CLEAR_ON_CONSTRUCT = True


def collect_boundary(spark: SparkSession) -> None:
    """Explicit cache boundary: drop every persisted plan from the
    previous batch of entries and nudge GC so ContextCleaner reaps
    broadcast/shuffle state. The construct-time clear inside `register`
    calls this automatically for sequential harnesses; an INTERLEAVING
    harness (construct A, construct B, collect A, collect B) must
    instead wrap construction in `interleaved_collection()` and call
    this itself once each batch is fully collected — otherwise entry
    A's persisted intermediates are silently dropped when B is
    constructed and recompute once per consumer.

    The JVM System.gc() matters as much as the Python gc (round 13):
    broadcasts, localCheckpoint blocks and shuffle state are reaped by
    ContextCleaner only after their JVM objects become WEAKLY
    reachable — which needs a JVM collection, which Python's gc does
    not trigger. In a long default-memory sweep session the JVM may
    not GC between entries, so a heavy entry can meet 100+ entries of
    unreaped weak garbage exactly when it needs the heap (the sf1zipf
    sweep died at entry ~114 on per-entry-green code). The full GC is
    GATED to constrained heaps (max < 4 GiB): there it costs ~0.1 s
    and is load-bearing; on a tuned multi-GB session it is pure tax (a
    full GC scales with heap size — measured ~+0.2-0.5 s flat per
    query across the whole sf0.1 bench on a 16 GiB heap) and the
    headroom makes it unnecessary."""
    import gc

    spark.catalog.clearCache()
    gc.collect()
    try:
        rt = spark._jvm.java.lang.Runtime.getRuntime()
        if rt.maxMemory() < 4 * 1024 * 1024 * 1024:
            spark._jvm.System.gc()
    except Exception:
        pass  # Spark Connect / mocked sessions have no _jvm


class interleaved_collection:
    """Context manager suspending the construct-time cache clear so a
    harness may interleave entry construction and collection. The
    caller takes over the cache-lifecycle obligation: call
    `collect_boundary(spark)` after each batch of entries is fully
    collected, or cached blocks accumulate without bound (the round-7
    sweep-OOM failure mode)."""

    def __enter__(self):
        global _CLEAR_ON_CONSTRUCT
        self._prev = _CLEAR_ON_CONSTRUCT
        _CLEAR_ON_CONSTRUCT = False
        return self

    def __exit__(self, *exc):
        global _CLEAR_ON_CONSTRUCT
        _CLEAR_ON_CONSTRUCT = self._prev
        return False


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    bench: bool = False,
):
    """Decorator: register `fn(spark, sf_dir) -> DataFrame` under `name`."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_runtime_conf(spark)
            # Cache lifecycle: operators persist() reused intermediates
            # (pair lattices, ranked sets, top-k frames) and the driver
            # runs EVERY entry in one long-lived session. Spark's
            # CacheManager strong-references cached plans until an
            # explicit unpersist, so without a boundary those caches
            # accumulate across entries and starve the (arbitrarily
            # small) driver heap — an sf0.1 all-entry sweep OOM'd at
            # entry ~84 on blocks from the previous 83. Each registry
            # query therefore starts with a clean cache (bounding
            # residency to one entry) and a GC nudge so ContextCleaner
            # can reap the previous entry's broadcast/shuffle state.
            #
            # CONTRACT (strictly sequential construct-then-collect):
            # because the clear happens at DataFrame-CONSTRUCTION time,
            # callers must fully collect entry A before constructing
            # entry B. Interleaving (construct B, then collect A) is
            # still CORRECT — uncaching only forces recomputation — but
            # A's persisted intermediates (pair lattices, ranked sets,
            # top-k frames) would silently recompute once per consumer.
            # The driver and driver_sim both run sequentially; an
            # interleaving harness must wrap construction in
            # `interleaved_collection()` and call `collect_boundary`
            # itself between batches.
            if _CLEAR_ON_CONSTRUCT:
                collect_boundary(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        _REGISTRY[name] = QuerySpec(name, wrapped, oracle, tags, bench)
        return fn

    return deco


def _load() -> None:
    global _LOADED
    if not _LOADED:
        for mod in _QUERY_MODULES:
            importlib.import_module(mod)
        _LOADED = True


def all_specs() -> dict[str, QuerySpec]:
    _load()
    return dict(_REGISTRY)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in all_specs().items()
        if spec.oracle is not None
    }


def bench_specs() -> dict[str, QuerySpec]:
    return {name: s for name, s in all_specs().items() if s.bench}
