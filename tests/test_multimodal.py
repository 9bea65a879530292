"""Multimodal plumbing: the binary-struct schema, mapInPandas decode path,
determinism of the fake decoder, and the stub contract for real codecs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gpu_bdb_spark.io import read_table
from gpu_bdb_spark.operators.multimodal import attach_media, decode_image


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    # use document text bytes as stand-in blobs — the plumbing is
    # payload-agnostic
    d = read_table(spark, sf_dir, "documents", ["doc_id", "text"],
                   hint_broadcast=False)
    return attach_media(d, "text", "image/png", "doc_id")


def test_media_struct_schema(media):
    assert media.schema["media"].dataType.fieldNames() == [
        "data", "media_type", "meta"]
    row = media.first()
    assert isinstance(row.media.data, (bytes, bytearray))
    assert row.media.meta["source_len"] == str(len(row.media.data))


def test_fake_decode_runs_and_is_deterministic(spark, media):
    a = decode_image(media, feature_dim=8, fake=True).toPandas()
    b = decode_image(media, feature_dim=8, fake=True).toPandas()
    assert len(a) == media.count()
    assert set(a.columns) == {"item_id", "media_type", "width", "height",
                              "n_bytes", "features"}
    assert (a["width"].between(16, 79)).all()
    a = a.sort_values("item_id", ignore_index=True)
    b = b.sort_values("item_id", ignore_index=True)
    assert a["features"].apply(tuple).equals(b["features"].apply(tuple))


def test_real_decode_is_clearly_stubbed(media):
    with pytest.raises(Exception) as exc_info:
        decode_image(media, fake=False).collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError)


def test_sample_frames_fans_out_deterministically(spark, media):
    from gpu_bdb_spark.operators.multimodal import sample_frames

    a = sample_frames(media, n_frames=3, interval_ms=500, fake=True).collect()
    b = sample_frames(media, n_frames=3, interval_ms=500, fake=True).collect()
    n_items = media.count()
    assert len(a) == n_items * 3
    per_item = {}
    for r in a:
        per_item.setdefault(r.item_id, []).append((r.frame_idx, r.ts_ms))
    assert all(sorted(v) == [(0, 0), (1, 500), (2, 1000)]
               for v in per_item.values())
    assert {(r.item_id, r.frame_idx): bytes(r.frame) for r in a} == \
           {(r.item_id, r.frame_idx): bytes(r.frame) for r in b}


def test_sample_frames_real_is_stubbed(media):
    import pytest as _pytest

    from gpu_bdb_spark.operators.multimodal import sample_frames

    with _pytest.raises(Exception, match="NotImplementedError|codecs"):
        sample_frames(media, fake=False).collect()


def test_resize_image_roundtrips_media_struct(spark, media):
    from gpu_bdb_spark.operators.multimodal import resize_image

    out = resize_image(media, target_w=64, target_h=32, fake=True)
    # media-struct in == media-struct out: resize composes with itself
    again = resize_image(out, target_w=16, target_h=16, fake=True).collect()
    rows = out.collect()
    assert len(rows) == media.count() == len(again)
    for r in rows:
        assert r.media.meta["width"] == "64"
        assert r.media.meta["height"] == "32"
        assert len(bytes(r.media.data)) > 0


def test_arrow_tier_matches_pandas_tier(spark, sf_dir):
    """mapInArrow decode produces EXACTLY the pandas tier's output
    (same fake decoder, same schema) — the zero-copy path is a drop-in."""
    from gpu_bdb_spark.io import read_table
    from gpu_bdb_spark.operators.multimodal import (attach_media,
                                                    decode_image,
                                                    decode_image_arrow)

    d = read_table(spark, sf_dir, "part", ["p_partkey", "p_name"],
                   hint_broadcast=False).limit(50)
    media = attach_media(d, "p_name", "image", "p_partkey")
    a = decode_image(media, feature_dim=8, fake=True).toPandas()
    b = decode_image_arrow(media, feature_dim=8, fake=True).toPandas()
    a = a.sort_values("item_id").reset_index(drop=True)
    b = b.sort_values("item_id").reset_index(drop=True)
    assert a.drop(columns=["features"]).equals(b.drop(columns=["features"]))
    for fa, fb in zip(a["features"], b["features"]):
        assert list(fa) == list(fb)


def test_arrow_tier_stub_raises_without_codecs(spark, sf_dir):
    import pytest as _pytest

    from gpu_bdb_spark.io import read_table
    from gpu_bdb_spark.operators.multimodal import (attach_media,
                                                    decode_image_arrow)

    d = read_table(spark, sf_dir, "part", ["p_partkey", "p_name"],
                   hint_broadcast=False).limit(2)
    media = attach_media(d, "p_name", "image", "p_partkey")
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PythonException

    with _pytest.raises((PythonException, Py4JJavaError)):
        decode_image_arrow(media, fake=False).collect()


def test_decode_bmp_real_padded_nonsquare(spark):
    """REAL BMP parsing beyond the oracle fixture: 6x3 (row size 20
    with 2 padding bytes that must be SKIPPED) with known pixels;
    bottom-up order checked via the position-sensitive row-0 sum."""
    import struct

    from gpu_bdb_spark.operators.multimodal import (attach_media,
                                                    decode_bmp_real)

    w, h = 6, 3
    row_size = (w * 3 + 3) // 4 * 4
    # image rows (top to bottom): row0 = all (B=1,G=2,R=3),
    # row1 = all (4,5,6), row2 = all (7,8,9)
    rows_img = [bytes([1, 2, 3] * w), bytes([4, 5, 6] * w),
                bytes([7, 8, 9] * w)]
    # stored bottom-up, padded with 0xFF (must NOT leak into sums)
    pixdata = b"".join(
        r + b"\xff" * (row_size - len(r)) for r in reversed(rows_img))
    hdr = (b"BM" + struct.pack("<IHHI", 54 + len(pixdata), 0, 0, 54)
           + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                         len(pixdata), 0, 0, 0, 0))
    df = spark.createDataFrame([(1, bytearray(hdr + pixdata))],
                               "doc_id long, p binary")
    media = attach_media(df, "p", "image/bmp", "doc_id")
    r = decode_bmp_real(media).collect()[0]
    assert (r.width, r.height) == (w, h)
    assert r.sum_b == (1 + 4 + 7) * w
    assert r.sum_g == (2 + 5 + 8) * w
    assert r.sum_r == (3 + 6 + 9) * w
    assert r.sum_row0 == (1 + 2 + 3) * w  # TOP image row, not file row 0


def test_decode_wav_real_chunk_walk(spark):
    """REAL WAV parsing with an extra odd-sized chunk before 'data'
    (the RIFF word-alignment rule) and known signed samples."""
    import struct

    from gpu_bdb_spark.operators.multimodal import (attach_media,
                                                    decode_wav_real)

    samples = [100, -200, 32767, -32768, 0]
    data = b"".join(struct.pack("<h", s) for s in samples)
    junk = b"xyz"  # odd size -> 1 pad byte after the chunk body
    body = (b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 44100,
                                    88200, 2, 16)
            + b"LIST" + struct.pack("<I", len(junk)) + junk + b"\x00"
            + b"data" + struct.pack("<I", len(data)) + data)
    wav = b"RIFF" + struct.pack("<I", len(body)) + body
    df = spark.createDataFrame([(7, bytearray(wav))],
                               "doc_id long, p binary")
    media = attach_media(df, "p", "audio/wav", "doc_id")
    r = decode_wav_real(media).collect()[0]
    assert r.sample_rate == 44100
    assert r.n_samples == len(samples)
    assert r.sum_amp == sum(samples)
    assert r.peak_abs == 32768
    assert r.first_sample == 100
