"""Custom Python Data Source (Spark 4 `pyspark.sql.datasource` API) for
the sharded training-corpus layout written by
`sources.write_sharded_corpus`: `out_dir/shard=K/*.parquet`, each shard
one ordered file.

Why a custom source when parquet could read the directory: the trainer
contract is PER-SHARD ORDERED STREAMING — shard K must arrive as one
task reading its files in order (the parquet reader would happily split
and reorder row groups across tasks). The source maps one
InputPartition per shard, streams Arrow record batches in file order
(constant memory), prunes columns down to what the plan asks for, and
consumes `shard = K` equality filters by pruning PARTITIONS — predicate
pushdown that skips whole shard directories before any I/O.

Everything the executors need is defined inside the factory function so
cloudpickle serializes the classes BY VALUE — the executor Python
workers do not have this package on their PYTHONPATH (see CLAUDE.md).
"""

from __future__ import annotations


def sharded_corpus_datasource():
    """Build (and return) the DataSource class. Register with
    `spark.dataSource.register(sharded_corpus_datasource())`, then
    `spark.read.format("sharded_corpus").load(out_dir)`."""
    from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                        EqualTo, InputPartition)

    class _ShardPartition(InputPartition):
        def __init__(self, shard: int, files: list[str]):
            self.shard = shard
            self.files = files

    class _Reader(DataSourceReader):
        def __init__(self, schema, options):
            self._schema = schema
            self._path = options.get("path")
            self._shard_eq: set[int] | None = None

        def pushFilters(self, filters):
            # called once per query plan; reset so a reader reached by a
            # second planning pass doesn't inherit the previous query's
            # pruning (Spark keeps one reader per loaded DataFrame —
            # derive filtered scans from their own .load() call)
            self._shard_eq = None
            for f in filters:
                if (isinstance(f, EqualTo)
                        and tuple(f.attribute) == ("shard",)):
                    # consumed: becomes partition pruning, zero I/O for
                    # non-matching shards
                    self._shard_eq = {int(f.value)}
                else:
                    yield f  # everything else: Spark evaluates post-scan

        def partitions(self):
            import glob
            import os

            parts = []
            for d in sorted(glob.glob(os.path.join(self._path, "shard=*"))):
                k = int(d.rsplit("=", 1)[1])
                if self._shard_eq is not None and k not in self._shard_eq:
                    continue
                files = sorted(glob.glob(os.path.join(d, "*.parquet")))
                if files:
                    parts.append(_ShardPartition(k, files))
            return parts

        def read(self, part):
            import pyarrow as pa
            import pyarrow.parquet as pq

            names = self._schema.fieldNames()
            file_cols = [n for n in names if n != "shard"]
            for f in part.files:
                pf = pq.ParquetFile(f)
                for batch in pf.iter_batches(columns=file_cols):
                    arrays = []
                    for n in names:
                        if n == "shard":
                            arrays.append(pa.array(
                                [part.shard] * batch.num_rows,
                                type=pa.int32()))
                        else:
                            arrays.append(
                                batch.column(file_cols.index(n)))
                    yield pa.RecordBatch.from_arrays(arrays, names=names)

    from pyspark.sql.datasource import SimpleDataSourceStreamReader

    class _StreamReader(SimpleDataSourceStreamReader):
        """Ingest-as-shards-land streaming: the offset is the number of
        shard directories consumed; each micro-batch carries the whole
        newly-arrived shards, in shard order, rows in file order —
        exactly-once via deterministic replay (`readBetweenOffsets`).

        The Simple reader API executes on the driver (Spark's
        prototyping tier for low-throughput sources); the scale path
        for a 100 TB backfill is the batch source (partition-per-shard)
        driven by foreachBatch — this streamer is for the tail-ingest
        of a live export, where a micro-batch is one shard.
        """

        def __init__(self, schema, options):
            self._schema = schema
            self._path = options.get("path")

        def initialOffset(self):
            return {"shards_done": 0}

        def _shard_dirs(self):
            import glob
            import os

            return sorted(
                glob.glob(os.path.join(self._path, "shard=*")),
                key=lambda d: int(d.rsplit("=", 1)[1]))

        def _rows_for(self, dirs):
            import glob
            import os

            import pyarrow.parquet as pq

            names = self._schema.fieldNames()
            file_cols = [n for n in names if n != "shard"]
            for d in dirs:
                k = int(d.rsplit("=", 1)[1])
                for f in sorted(glob.glob(os.path.join(d, "*.parquet"))):
                    tbl = pq.read_table(f, columns=file_cols)
                    cols = [
                        [k] * tbl.num_rows if n == "shard"
                        else tbl.column(n).to_pylist() for n in names]
                    yield from zip(*cols)

        def read(self, start):
            # Spark pickles the returned rows into its prefetch cache:
            # materialize (a micro-batch is a handful of shards)
            dirs = self._shard_dirs()
            done = start["shards_done"]
            new = [d for d in dirs
                   if int(d.rsplit("=", 1)[1]) >= done]
            end = {"shards_done": (max((int(d.rsplit("=", 1)[1])
                                        for d in dirs), default=-1) + 1)}
            return list(self._rows_for(new)), end

        def readBetweenOffsets(self, start, end):
            lo, hi = start["shards_done"], end["shards_done"]
            dirs = [d for d in self._shard_dirs()
                    if lo <= int(d.rsplit("=", 1)[1]) < hi]
            return list(self._rows_for(dirs))

        def commit(self, end):
            pass

    class ShardedCorpusDataSource(DataSource):
        @classmethod
        def name(cls):
            return "sharded_corpus"

        def schema(self):
            import glob
            import os

            import pyarrow.parquet as pq
            from pyspark.sql.pandas.types import from_arrow_schema
            from pyspark.sql.types import IntegerType, StructField

            files = sorted(glob.glob(
                os.path.join(self.options["path"], "shard=*", "*.parquet")))
            if not files:
                raise FileNotFoundError(
                    f"no shard=*/ parquet under {self.options['path']}")
            st = from_arrow_schema(pq.read_schema(files[0]))
            return st.add(StructField("shard", IntegerType(), False))

        def reader(self, schema):
            return _Reader(schema, self.options)

        def simpleStreamReader(self, schema):
            return _StreamReader(schema, self.options)

    return ShardedCorpusDataSource
