"""Multimodal plumbing: schemas, batch shapes, plans (decode stubbed)."""

from __future__ import annotations

import pytest

from memfuse_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        ("img-1", "image/fake", "s3://bucket/1", b"\x01\x02\x03", 640, 480, 0),
        ("img-2", "image/fake", "s3://bucket/2", b"\x04\x05", 100, 50, 0),
        ("vid-1", "video/fake", "s3://bucket/3", b"\x06", 1920, 1080, 5500),
    ]
    return spark.createDataFrame(rows, mm.MEDIA_SCHEMA)


def test_decode_features_shapes(media):
    imgs = media.filter("mime = 'image/fake'")
    got = {r.media_id: r for r in mm.decode_features(imgs, feature_dim=8).collect()}
    assert set(got) == {"img-1", "img-2"}
    assert all(len(r.feature) == 8 for r in got.values())
    assert all(0.0 <= r.pixel_mean <= 255.0 for r in got.values())
    # deterministic stub: same payload → same features
    again = {r.media_id: r for r in mm.decode_features(imgs, feature_dim=8).collect()}
    assert got["img-1"].feature == again["img-1"].feature


def test_decode_unknown_mime_raises(media):
    with pytest.raises(Exception, match="no decoder for mime"):
        mm.decode_features(media).collect()


def test_resize_plan_metadata_only(media):
    got = {r.media_id: r for r in mm.resize_plan(media, max_side=256).collect()}
    assert got["img-1"].needs_resize is True
    assert got["img-1"].target_width == 256  # 640x480 → 256x192
    assert got["img-1"].target_height == 192
    assert got["img-2"].needs_resize is False
    assert got["img-2"].target_width == 100


def test_frame_sample_plan(media):
    vid = media.filter("mime = 'video/fake'")
    got = mm.frame_sample_plan(vid, every_ms=1000, max_frames=16).collect()
    # 5500ms → 5 frames at 0..4000
    assert [r.frame_ts_ms for r in got] == [0, 1000, 2000, 3000, 4000]
    assert [r.frame_index for r in got] == [0, 1, 2, 3, 4]
