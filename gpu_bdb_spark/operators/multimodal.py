"""Multimodal column operators — image/audio/video as opaque binary columns
with typed metadata (extension surface required by BASELINE.json).

Design (the part that must be right at 100 TB):
* A media item is `struct<data: binary, media_type: string, meta:
  map<string,string>>` — schema'd, columnar, splittable; blobs ride parquet
  row groups, metadata prunes without touching bytes.
* Decode / feature-extract run as `mapInPandas` (Arrow-batched; one Python
  worker per partition, zero-copy binary transfer). Batch size is governed
  by `spark.sql.execution.arrow.maxRecordsPerBatch` — blobs are large, so
  real deployments lower it.
* The actual codec calls (PIL/librosa/ffmpeg) are NOT in this container:
  `decode_image` dispatches to a clearly-marked stub raising
  NotImplementedError unless `fake=True`, where a deterministic fake
  decoder (seeded by content hash) exercises the full plumbing — schema,
  partitioning, UDF signature, batch shape — end to end.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Output schema of decode_image: per-item dims + a small feature vector.
IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def attach_media(
    df: DataFrame,
    payload_col: str,
    media_type: str,
    id_col: str,
) -> DataFrame:
    """Wrap a binary (or castable) column into the canonical media struct."""
    return df.select(
        F.col(id_col).alias("item_id"),
        F.struct(
            F.col(payload_col).cast("binary").alias("data"),
            F.lit(media_type).alias("media_type"),
            F.create_map(
                F.lit("source_len"),
                F.length(F.col(payload_col).cast("binary")).cast("string"),
            ).alias("meta"),
        ).alias("media"),
    )


def decode_image(
    media_df: DataFrame,
    feature_dim: int = 8,
    fake: bool = False,
) -> DataFrame:
    """Decode + feature-extract media structs via Arrow-batched mapInPandas.

    The UDF signature (Iterator[pd.DataFrame] → Iterator[pd.DataFrame])
    streams batches — constant memory per worker regardless of partition
    size, the shape that survives billion-item corpora.
    """

    columns = [f.name for f in IMAGE_FEATURES_SCHEMA.fields]

    # NOTE: the closure must be self-contained — module-level helpers would
    # be pickled by reference and require gpu_bdb_spark on every executor's
    # PYTHONPATH. Self-contained closures ship by value with the task.
    def decode_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        import numpy as _np
        import pandas as _pd

        def _fake(data: bytes):
            digest = _hashlib.sha256(data).digest()
            width = 16 + digest[0] % 64
            height = 16 + digest[1] % 64
            seed = int.from_bytes(digest[2:10], "little", signed=False)
            rng = _np.random.default_rng(seed)
            return width, height, rng.standard_normal(feature_dim).astype(_np.float32)

        def _real(data: bytes):
            raise NotImplementedError(
                "image codecs not available in this environment; "
                "call decode_image(..., fake=True) for the deterministic "
                "test decoder"
            )

        decode = _fake if fake else _real
        for pdf in batches:
            out = []
            for item_id, media in zip(pdf["item_id"], pdf["media"]):
                data = bytes(media["data"]) if media["data"] is not None else b""
                w, h, feats = decode(data)
                out.append(
                    (item_id, media["media_type"], w, h, len(data),
                     feats.tolist())
                )
            yield _pd.DataFrame(out, columns=columns)

    return media_df.mapInPandas(decode_batches, IMAGE_FEATURES_SCHEMA)
