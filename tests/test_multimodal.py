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


def test_phash64_deterministic_and_payload_sensitive(spark):
    rows = [
        ("a", "image/fake", "u", b"\x01\x02\x03", 64, 64, 0),
        ("b", "image/fake", "u", b"\x01\x02\x03", 64, 64, 0),  # same payload
        ("c", "image/fake", "u", b"\x09\x09\x09", 64, 64, 0),
    ]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    got = {r.media_id: r.phash for r in mm.phash64(media).collect()}
    assert got["a"] == got["b"]          # identical payload, identical hash
    assert got["a"] != got["c"]          # different payload diverges
    rerun = {r.media_id: r.phash for r in mm.phash64(media).collect()}
    assert got == rerun                  # deterministic across runs


def test_media_neardup_banded_join_matches_bruteforce(spark):
    # synthetic 64-bit hashes: pair (1,2) at hamming 2, (1,3) at 1,
    # (4,*) far away; threshold 3
    H = [
        (1, 0x0F0F0F0F0F0F0F0F),
        (2, 0x0F0F0F0F0F0F0F0C),  # 2 low bits flipped
        (3, 0x0F0F0F0F0F0F0F0E),  # 1 low bit flipped
        (4, 0x7000000000000000),
    ]
    hashes = spark.createDataFrame(H, "media_id bigint, phash bigint")
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in mm.media_neardup_pairs(
            hashes, id_col="media_id", hash_col="phash"
        ).collect()
    }
    # brute force over the 4 hashes
    import itertools
    expect = {}
    for (ia, ha), (ib, hb) in itertools.combinations(H, 2):
        d = bin(ha ^ hb).count("1")
        if d <= mm.PHASH_MAX_HAMMING:
            expect[(min(ia, ib), max(ia, ib))] = d
    assert got == expect and len(got) == 3  # (1,2),(1,3),(2,3)


def test_media_neardup_end_to_end_duplicate_payloads(spark):
    rows = [
        ("m1", "image/fake", "u", b"\xaa\xbb", 32, 32, 0),
        ("m2", "image/fake", "u", b"\xaa\xbb", 32, 32, 0),
        ("m3", "image/fake", "u", b"\xcc\xdd", 32, 32, 0),
    ]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    pairs = mm.media_neardup_pairs(mm.phash64(media)).collect()
    assert [(p.id_a, p.id_b, p.hamming) for p in pairs] == [("m1", "m2", 0)]
