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
