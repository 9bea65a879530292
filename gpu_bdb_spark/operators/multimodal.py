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


#: Output schema of sample_frames: one row per sampled frame (1→N shape).
FRAME_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(
    media_df: DataFrame,
    n_frames: int = 4,
    interval_ms: int = 1000,
    fake: bool = False,
) -> DataFrame:
    """Sample `n_frames` frames per video item — the 1→N multimodal shape
    (one input row fans out to several output rows inside the same Arrow
    batch, no explode/shuffle).

    Real deployments decode with ffmpeg/pyav per batch; neither is in
    this container, so `fake=True` runs a deterministic content-hash
    frame synthesizer through the identical plumbing (streamed
    Iterator[pd.DataFrame] batches, binary frame payloads out). Frame
    rows inherit the input partitioning — downstream per-frame feature
    extraction runs without any shuffle.
    """
    columns = [f.name for f in FRAME_SCHEMA.fields]

    def frame_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        import pandas as _pd

        def _fake(data: bytes, idx: int) -> bytes:
            return _hashlib.sha256(data + idx.to_bytes(4, "little")).digest()

        def _real(data: bytes, idx: int) -> bytes:
            raise NotImplementedError(
                "video codecs not available in this environment; "
                "call sample_frames(..., fake=True) for the deterministic "
                "test synthesizer"
            )

        grab = _fake if fake else _real
        for pdf in batches:
            out = []
            for item_id, media in zip(pdf["item_id"], pdf["media"]):
                data = bytes(media["data"]) if media["data"] is not None else b""
                for i in range(n_frames):
                    out.append(
                        (item_id, i, i * interval_ms, grab(data, i)))
            yield _pd.DataFrame(out, columns=columns)

    return media_df.mapInPandas(frame_batches, FRAME_SCHEMA)


#: Output schema of resize_image: same media struct back, new dims in meta.
RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType()),
        T.StructField(
            "media",
            T.StructType(
                [
                    T.StructField("data", T.BinaryType()),
                    T.StructField("media_type", T.StringType()),
                    T.StructField("meta", T.MapType(T.StringType(),
                                                    T.StringType())),
                ]
            ),
        ),
    ]
)


def resize_image(
    media_df: DataFrame,
    target_w: int = 224,
    target_h: int = 224,
    fake: bool = False,
) -> DataFrame:
    """Resize every image to (target_w, target_h), media-struct in →
    media-struct out, so resize composes with attach_media / decode_image
    / write-back without schema surgery.

    `fake=True` substitutes a deterministic payload transform (content
    hash tiled to a size proportional to the target area) for the PIL
    call that is not in this container; meta records the new dims either
    way.
    """
    columns = [f.name for f in RESIZED_SCHEMA.fields]

    def resize_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        import pandas as _pd

        def _fake(data: bytes) -> bytes:
            digest = _hashlib.sha256(data).digest()
            reps = max(1, (target_w * target_h) // (len(digest) * 64))
            return digest * reps

        def _real(data: bytes) -> bytes:
            raise NotImplementedError(
                "image codecs not available in this environment; "
                "call resize_image(..., fake=True) for the deterministic "
                "test transform"
            )

        resize = _fake if fake else _real
        for pdf in batches:
            out = []
            for item_id, media in zip(pdf["item_id"], pdf["media"]):
                data = bytes(media["data"]) if media["data"] is not None else b""
                new = resize(data)
                meta = dict(media["meta"] or {})
                meta.update({"width": str(target_w),
                             "height": str(target_h),
                             "resized_from_len": str(len(data))})
                out.append(
                    (item_id,
                     {"data": new, "media_type": media["media_type"],
                      "meta": meta}))
            yield _pd.DataFrame(out, columns=columns)

    return media_df.mapInPandas(resize_batches, RESIZED_SCHEMA)


def decode_image_arrow(
    media_df: DataFrame,
    feature_dim: int = 8,
    fake: bool = False,
) -> DataFrame:
    """The `decode_image` contract through mapInArrow — the zero-copy
    tier of the Python batch surface: RecordBatches flow straight from
    the JVM without the Arrow→pandas materialization, which matters
    when the payload column is large binary (images) and pandas would
    copy every buffer into object cells. Same streamed
    Iterator→Iterator shape (constant memory), same deterministic fake
    decoder for codec-less environments, same output schema — result
    equality with the pandas tier is pinned in test_multimodal.py.
    """
    columns = [f.name for f in IMAGE_FEATURES_SCHEMA.fields]

    def decode_batches(batches):
        import hashlib as _hashlib

        import numpy as _np
        import pyarrow as _pa

        def _fake(data: bytes):
            digest = _hashlib.sha256(data).digest()
            width = 16 + digest[0] % 64
            height = 16 + digest[1] % 64
            seed = int.from_bytes(digest[2:10], "little", signed=False)
            rng = _np.random.default_rng(seed)
            return width, height, rng.standard_normal(
                feature_dim).astype(_np.float32)

        def _real(data: bytes):
            raise NotImplementedError(
                "image codecs not available in this environment; "
                "call decode_image_arrow(..., fake=True) for the "
                "deterministic test decoder")

        decode = _fake if fake else _real
        for batch in batches:
            ids = batch.column("item_id").to_pylist()
            media = batch.column("media")
            data_arr = media.field("data")
            type_arr = media.field("media_type").to_pylist()
            rows = {c: [] for c in columns}
            for i, item_id in enumerate(ids):
                buf = data_arr[i].as_py()
                data = bytes(buf) if buf is not None else b""
                w, h, feats = decode(data)
                rows["item_id"].append(item_id)
                rows["media_type"].append(type_arr[i])
                rows["width"].append(w)
                rows["height"].append(h)
                rows["n_bytes"].append(len(data))
                rows["features"].append(feats.tolist())
            # pin the arrow types: from_pydict would infer int64 where
            # the Spark schema says int32 (width/height) and float64
            # where it says float32 — the JVM reader rejects both
            yield _pa.RecordBatch.from_pydict(rows, schema=_pa.schema([
                ("item_id", _pa.int64()),
                ("media_type", _pa.string()),
                ("width", _pa.int32()),
                ("height", _pa.int32()),
                ("n_bytes", _pa.int64()),
                ("features", _pa.list_(_pa.float32())),
            ]))

    return media_df.mapInArrow(decode_batches, IMAGE_FEATURES_SCHEMA)


#: Output schema of decode_bmp_real.
BMP_STATS_SCHEMA = T.StructType([
    T.StructField("item_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("sum_b", T.LongType()),
    T.StructField("sum_g", T.LongType()),
    T.StructField("sum_r", T.LongType()),
    T.StructField("sum_row0", T.LongType()),
])


def decode_bmp_real(media_df: DataFrame) -> DataFrame:
    """REAL image decode for the codec-free format: parse 24-bit
    uncompressed BMP (magic, little-endian header fields, 4-byte row
    padding, bottom-up row order) with pure numpy — no image library
    needed, which is the point: the multimodal tier's decode path is
    genuinely exercised in this container for formats that need no
    codec, while JPEG/PNG stay behind the documented fake/import gate.

    Emits exact integer statistics per item (channel byte sums + the
    TOP image row's sum, which is position-sensitive: a decoder that
    forgets bottom-up order or padding gets sum_row0 wrong even when
    the order-invariant channel sums match). Generality beyond the
    oracle fixture (non-square, padded rows) is pinned in
    tests/test_multimodal.py against struct-built images.
    """
    columns = [f.name for f in BMP_STATS_SCHEMA.fields]

    def decode_batches(batches):
        import struct as _struct

        import numpy as _np
        import pandas as _pd

        def _decode(data: bytes):
            if len(data) < 54 or data[:2] != b"BM":
                raise ValueError("not a BMP payload")
            offset = _struct.unpack_from("<I", data, 10)[0]
            hdr_size = _struct.unpack_from("<I", data, 14)[0]
            if hdr_size < 40:
                raise ValueError("unsupported BMP header")
            w = _struct.unpack_from("<i", data, 18)[0]
            h = _struct.unpack_from("<i", data, 22)[0]
            bpp = _struct.unpack_from("<H", data, 28)[0]
            comp = _struct.unpack_from("<I", data, 30)[0]
            if bpp != 24 or comp != 0 or w <= 0 or h <= 0:
                raise ValueError("only 24-bit uncompressed BMP")
            row_size = (w * 3 + 3) // 4 * 4
            px = _np.frombuffer(
                data, dtype=_np.uint8, count=h * row_size, offset=offset
            ).reshape(h, row_size)[:, : w * 3]
            # bottom-up storage: file row 0 is the BOTTOM image row
            img = px[::-1].reshape(h, w, 3).astype(_np.int64)  # B,G,R
            return (w, h,
                    int(img[:, :, 0].sum()), int(img[:, :, 1].sum()),
                    int(img[:, :, 2].sum()), int(img[0].sum()))

        for pdf in batches:
            out = []
            for item_id, media in zip(pdf["item_id"], pdf["media"]):
                data = bytes(media["data"])
                w, h, sb, sg, sr, r0 = _decode(data)
                out.append((item_id, w, h, len(data), sb, sg, sr, r0))
            yield _pd.DataFrame(out, columns=columns)

    return media_df.mapInPandas(decode_batches, BMP_STATS_SCHEMA)


#: Output schema of decode_wav_real.
WAV_STATS_SCHEMA = T.StructType([
    T.StructField("item_id", T.LongType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("n_samples", T.LongType()),
    T.StructField("sum_amp", T.LongType()),
    T.StructField("peak_abs", T.LongType()),
    T.StructField("first_sample", T.LongType()),
])


def decode_wav_real(media_df: DataFrame) -> DataFrame:
    """REAL audio decode for the codec-free format: parse RIFF/WAVE
    PCM16 mono (chunk walk to 'fmt ' and 'data', little-endian signed
    16-bit samples) with pure numpy. Emits exact integer statistics
    (signed amplitude sum, peak |amplitude|, first sample — the latter
    position-sensitive). Same tier contract as `decode_bmp_real`;
    compressed audio stays behind the import gate."""
    columns = [f.name for f in WAV_STATS_SCHEMA.fields]

    def decode_batches(batches):
        import struct as _struct

        import numpy as _np
        import pandas as _pd

        def _decode(data: bytes):
            if len(data) < 44 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
                raise ValueError("not a WAV payload")
            pos, rate, samples = 12, None, None
            while pos + 8 <= len(data):
                cid = data[pos:pos + 4]
                sz = _struct.unpack_from("<I", data, pos + 4)[0]
                body = data[pos + 8:pos + 8 + sz]
                if cid == b"fmt ":
                    fmt, ch, rate = _struct.unpack_from("<HHI", body, 0)
                    bits = _struct.unpack_from("<H", body, 14)[0]
                    if fmt != 1 or ch != 1 or bits != 16:
                        raise ValueError("only PCM16 mono")
                elif cid == b"data":
                    samples = _np.frombuffer(
                        body, dtype="<i2", count=sz // 2).astype(_np.int64)
                pos += 8 + sz + (sz & 1)  # RIFF chunks are word-aligned
            if rate is None or samples is None:
                raise ValueError("missing fmt/data chunk")
            return (int(rate), len(samples), int(samples.sum()),
                    int(_np.abs(samples).max()) if len(samples) else 0,
                    int(samples[0]) if len(samples) else 0)

        for pdf in batches:
            out = []
            for item_id, media in zip(pdf["item_id"], pdf["media"]):
                rate, n, s, p, f0 = _decode(bytes(media["data"]))
                out.append((item_id, rate, n, s, p, f0))
            yield _pd.DataFrame(out, columns=columns)

    return media_df.mapInPandas(decode_batches, WAV_STATS_SCHEMA)
