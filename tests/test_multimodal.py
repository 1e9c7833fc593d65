"""Multimodal binary-column plumbing: metadata extraction, frame-sample
fan-out, resize stub behavior — all through real mapInPandas execution."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from baselinr_spark.functions.multimodal import (
    fake_media_decoder,
    extract_media_metadata,
    frame_sample_plan,
    make_fake_media,
    resize_images,
)


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [
        (1, make_fake_media("image", width=640, height=480, seed=1)),
        (2, make_fake_media("image", width=32, height=32, seed=2)),
        (3, make_fake_media("audio", sample_rate=16000, seed=3)),
        (4, make_fake_media("video", width=320, height=240, frames=90, seed=4)),
        (5, b"not a media file"),
        (6, None),
    ]
    return spark.createDataFrame(rows, schema="media_id int, blob binary")


def test_extract_media_metadata(media_df):
    out = {r["media_id"]: r.asDict()
           for r in extract_media_metadata(media_df, "media_id", "blob", decoder=fake_media_decoder).collect()}
    assert out[1]["media_kind"] == "image" and (out[1]["width"], out[1]["height"]) == (640, 480)
    assert out[3]["media_kind"] == "audio" and out[3]["sample_rate"] == 16000
    assert out[4]["frames"] == 90
    assert out[5]["decode_ok"] is False and out[5]["n_bytes"] == 16
    assert out[6]["decode_ok"] is False and out[6]["content_sha1"] is None
    # deterministic payload → stable dedup key
    assert out[1]["content_sha1"] != out[2]["content_sha1"]


def test_frame_sample_plan(media_df):
    rows = frame_sample_plan(media_df, "media_id", "blob", every_n=30, decoder=fake_media_decoder).collect()
    got = sorted((r["media_id"], r["frame_idx"]) for r in rows)
    assert got == [(4, 0), (4, 30), (4, 60)]  # only the video, frames 0..89


def test_resize_stub_raises_without_decoder(media_df):
    df = resize_images(media_df, "media_id", "blob", decoder=None)
    with pytest.raises(Exception, match="NotImplementedError|No media decoder"):
        df.collect()


def test_resize_with_fake_decoder(media_df):
    out = {r["media_id"]: r.asDict()
           for r in resize_images(media_df, "media_id", "blob",
                                  decoder=fake_media_decoder).collect()}
    assert (out[1]["out_width"], out[1]["out_height"]) == (224, 224)
    assert out[3]["out_width"] is None  # audio is not resizable
    assert out[1]["resized"] == b""


def test_media_dedup_by_sha1(spark):
    """Binary exact-dedup: identical payloads share the sha1 key."""
    blob = make_fake_media("image", width=64, height=64, seed=9)
    df = spark.createDataFrame(
        [(1, blob), (2, blob), (3, make_fake_media("image", 64, 64, seed=10))],
        schema="media_id int, blob binary",
    )
    meta = extract_media_metadata(df, "media_id", "blob", decoder=fake_media_decoder)
    groups = (
        meta.groupBy("content_sha1").agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1).collect()
    )
    assert len(groups) == 1 and groups[0]["n"] == 2
