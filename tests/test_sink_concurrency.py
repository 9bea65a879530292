"""Concurrent-writer exactly-once for the standing-table streaming
sinks (r09 verdict item 3).

The sketch/counter sinks' commit protocol (streaming/ops._commit_version)
was verified single-writer; its actual claim is stronger: under
DUPLICATE CONCURRENT delivery of the same batch — a zombie driver plus
its replacement, or speculative re-execution of a foreachBatch — the
same (batch_id, delta) is committed by N racing writers and must land
EXACTLY ONCE, with losers leaving no debris and readers never observing
a partial version. These tests drive real interleavings with a barrier:
all writers enter the commit concurrently.

Within a single streaming query, batch retries are serial; two DISTINCT
queries sharing a path is the misuse `_check_high_water` rejects. The
duplicate-delivery race is the one concurrency the protocol must
survive, and — because the micro-batch is checkpointed — duplicates
carry identical deltas, which is what makes winner-takes-all correct.
"""

import os
import threading
from concurrent.futures import ThreadPoolExecutor

import pytest

from gpu_bdb_spark.streaming.ops import (_commit_version,
                                         cms_latest_version, cms_read,
                                         counter_ingest_batches)

N_WRITERS = 6


def _race(fn, n=N_WRITERS):
    """Run fn(i) from n threads, all released together; re-raise the
    first failure; return results."""
    barrier = threading.Barrier(n)

    def run(i):
        barrier.wait()
        return fn(i)

    with ThreadPoolExecutor(max_workers=n) as ex:
        return [f.result() for f in [ex.submit(run, i) for i in range(n)]]


@pytest.mark.parametrize("commit_mode", ["rename", "pointer"])
def test_duplicate_commit_race_exactly_once(spark, tmp_path, commit_mode):
    """N writers race `_commit_version` for the SAME batch: exactly one
    version is published, it is COMPLETE (full content readable — the
    pre-r17 shared `.tmp-v<id>` let racing rename-mode writers clobber
    each other's in-flight tmp, so the winner could publish a
    half-written mixture), and losers leave no tmp/data debris."""
    base = str(tmp_path / f"table-{commit_mode}")
    df = spark.range(100).selectExpr("id AS key", "id * 2 AS cnt")

    _race(lambda i: _commit_version(base, 0, df, commit_mode))

    v, path = cms_latest_version(base)
    assert v == 0 and path is not None
    got = spark.read.parquet(path)
    assert got.count() == 100
    assert got.selectExpr("sum(cnt)").first()[0] == 9900
    names = os.listdir(base)
    assert not [n for n in names if n.startswith(".tmp-")]
    assert not [n for n in names if n.startswith(".marker-")]
    if commit_mode == "rename":
        assert names == ["v0"] or sorted(names) == ["v0"]
    else:
        # exactly one marker and exactly one surviving data dir — every
        # losing writer deleted its own unique data-v0-* directory
        assert sorted(n for n in names if n.startswith("commit-")) == \
            ["commit-v0"]
        assert len([n for n in names if n.startswith("data-v0-")]) == 1


@pytest.mark.parametrize("commit_mode", ["rename", "pointer"])
def test_counter_sink_duplicate_delivery_end_to_end(spark, tmp_path,
                                                    commit_mode):
    """The full counter_ingest_batches processor under duplicate
    concurrent delivery: batches 0 and 1 land single-writer, batch 2 is
    delivered by N racing writers (identical delta — duplicates of a
    checkpointed micro-batch are bit-identical), then a retry of batch
    2 arrives serially (high-water skip) and a batch BELOW the mark
    raises (checkpoint reset). The standing table must show every
    delta exactly once."""
    table = str(tmp_path / f"counts-{commit_mode}")
    process = counter_ingest_batches(
        table, ("key",), ("cnt",),
        lambda df: df.groupBy("key").sum("cnt").withColumnRenamed(
            "sum(cnt)", "cnt"),
        commit_mode=commit_mode)

    def batch(n_rows, mult):
        return spark.range(n_rows).selectExpr(
            "id % 10 AS key", f"cast({mult} AS long) AS cnt")

    process(batch(100, 1), 0)
    process(batch(100, 1), 1)
    _race(lambda i: process(batch(50, 100), 2))

    got = {r["key"]: r["cnt"]
           for r in cms_read(spark, table).collect()}
    # keys 0..9: 10 rows x1 from each of batches 0,1; keys 0..9 get
    # 5 rows x100 from batch 2 — committed ONCE despite N writers
    assert got == {k: 20 + 500 for k in range(10)}

    # serial retry of the committed batch: high-water skip, no change
    process(batch(50, 100), 2)
    got2 = {r["key"]: r["cnt"] for r in cms_read(spark, table).collect()}
    assert got2 == got

    # checkpoint reset below the high-water mark fails loudly
    with pytest.raises(RuntimeError, match="high-water"):
        process(batch(10, 1), 1)


def test_commit_race_with_concurrent_reader(spark, tmp_path):
    """A reader holding the previous version is undisturbed by the next
    commit + prune (keep-2 contract), in both layouts."""
    for mode in ("rename", "pointer"):
        base = str(tmp_path / f"r-{mode}")
        df = spark.range(10).selectExpr("id AS key", "id AS cnt")
        for b in range(3):
            _commit_version(base, b, df, mode)
        # a reader resolves the CURRENT latest (v2) just before v3
        # commits and prunes — keep-2 means v2's data dir must remain
        # fully readable while v3 becomes latest (v0/v1 are reaped)
        _, prev = cms_latest_version(base)
        _commit_version(base, 3, df, mode)
        assert spark.read.parquet(prev).count() == 10
        assert cms_latest_version(base)[0] == 3
