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


# --- real codecs (stdlib-only PNG / WAV) -----------------------------------

def _gradient(h, w):
    import numpy as np

    y, x = np.mgrid[0:h, 0:w]
    r = (x * 7 + y * 3) % 256
    g = (x * 13 + y * 5) % 256
    b = (x * 3 + y * 11) % 256
    return np.stack([r, g, b], axis=2).astype(np.uint8)


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_png_roundtrip_every_filter(filter_type):
    """encode_png(filter f) → decode_png must reproduce the pixels
    EXACTLY for each of the five PNG scanline filters (None/Sub/Up/
    Average/Paeth) — the full decoder surface, no image library."""
    import numpy as np

    img = _gradient(13, 9)  # odd dims: exercises non-multiple-of-8 paths
    payload = mm.encode_png(img, filter_type=filter_type)
    got = mm.decode_png(payload)
    assert got.shape == (13, 9, 3)
    assert np.array_equal(got, img)


def test_png_grayscale_and_malformed():
    import struct
    import zlib

    import numpy as np

    # hand-built 2x2 8-bit grayscale PNG (color type 0, filter 0)
    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    raw = bytes([0, 10, 20, 0, 30, 40])
    png = (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
    )
    got = mm.decode_png(png)
    assert got.shape == (2, 2, 3)
    assert np.array_equal(got[:, :, 0], np.array([[10, 20], [30, 40]]))
    assert np.array_equal(got[:, :, 0], got[:, :, 2])  # gray expanded to RGB
    with pytest.raises(ValueError):
        mm.decode_png(b"not a png at all")


def _wav_bytes(freq=440.0, rate=8000, n=800, width=2, nch=1):
    import io
    import struct
    import wave

    import numpy as np

    t = np.arange(n) / rate
    x = np.sin(2 * np.pi * freq * t)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(nch)
        wf.setsampwidth(width)
        wf.setframerate(rate)
        pcm = (x * 32767).astype("<i2")
        if nch == 2:
            pcm = np.repeat(pcm, 2)
        wf.writeframes(pcm.tobytes())
    return buf.getvalue()


def test_wav_decode_sine():
    import numpy as np

    x, rate = mm.decode_wav(_wav_bytes())
    assert rate == 8000 and len(x) == 800
    # 440 Hz sine: RMS ~= 1/sqrt(2), zero-crossings ~= 2*f*duration
    assert abs(float(np.sqrt((x**2).mean())) - 1 / 2**0.5) < 0.01
    crossings = int((np.signbit(x[1:]) != np.signbit(x[:-1])).sum())
    assert abs(crossings - 2 * 440 * 0.1) < 4
    # stereo mixes down to the same mono signal
    x2, _ = mm.decode_wav(_wav_bytes(nch=2))
    assert np.allclose(x2, x, atol=1e-4)


def test_audio_features_end_to_end(spark):
    rows = [
        ("a1", "audio/wav", None, bytearray(_wav_bytes(freq=440.0)), 0, 0, 100),
        ("a2", "audio/wav", None, bytearray(_wav_bytes(freq=110.0)), 0, 0, 100),
    ]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    got = {r.media_id: r for r in mm.audio_features(media).collect()}
    assert got["a1"].n_samples == 800 and got["a1"].sample_rate == 8000
    assert abs(got["a1"].duration_ms_decoded - 100.0) < 1e-9
    # higher frequency -> higher zero-crossing rate, same RMS
    assert got["a1"].zero_cross_rate > got["a2"].zero_cross_rate
    assert abs(got["a1"].rms - got["a2"].rms) < 0.01


def test_phash_real_png_neardup(spark):
    """End-to-end REAL-codec dedup: PNG payloads decoded by the stdlib
    codec; a one-pixel edit stays within Hamming 3 of the original, a
    different gradient does not pair."""
    import numpy as np

    base = _gradient(16, 16)
    edited = base.copy()
    edited[3, 3] = [255, 0, 0]
    other = 255 - _gradient(16, 16)[::-1]
    rows = [
        ("p1", "image/png", None, bytearray(mm.encode_png(base)), 16, 16, 0),
        ("p2", "image/png", None, bytearray(mm.encode_png(edited, filter_type=4)), 16, 16, 0),
        ("p3", "image/png", None, bytearray(mm.encode_png(other)), 16, 16, 0),
    ]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in mm.media_neardup_pairs(mm.phash64(media)).collect()
    }
    assert ("p1", "p2") in pairs and pairs[("p1", "p2")] <= 3
    assert ("p1", "p3") not in pairs and ("p2", "p3") not in pairs


def test_decode_features_real_png(spark):
    """decode_features end-to-end through the REAL PNG codec: the
    pooled channel means must equal numpy's means of the source pixels
    (the decode is exact, so the features are exact)."""
    import numpy as np

    img = _gradient(16, 16)
    media = spark.createDataFrame(
        [("p1", "image/png", None, bytearray(mm.encode_png(img)), 16, 16, 0)],
        mm.MEDIA_SCHEMA,
    )
    row = mm.decode_features(media, feature_dim=3).collect()[0]
    expected = img.reshape(-1, 3).mean(axis=0) / 255.0
    assert np.allclose(row.feature, expected)
    assert abs(row.pixel_mean - img.mean()) < 1e-9


# ---------------------------------------------------------------------------
# GIF codec (real, stdlib-only)
# ---------------------------------------------------------------------------

def test_gif_lzw_decodes_handpacked_spec_stream():
    """Bit-level conformance: a stream packed BY HAND per the GIF spec
    (LSB-first variable-width codes; the decoder must widen to 4 bits
    after defining entry 7, BEFORE reading the last pixel and EOI)."""
    from memfuse_spark.operators.multimodal import _gif_lzw_decode

    # min_code=2: clear=4, end=5; codes 4,1,2,3 at 3 bits then 0,5 at 4
    assert _gif_lzw_decode(bytes([0x8C, 0x06, 0x05]), 2) == [1, 2, 3, 0]


def test_gif_roundtrip_shapes_and_palettes():
    import numpy as np

    from memfuse_spark.operators.multimodal import decode_gif, encode_gif

    rng = np.random.default_rng(42)
    for shape, colors in (((1, 1), 1), ((7, 5), 3), ((64, 64), 256), ((33, 1), 2)):
        pal = rng.integers(0, 256, (colors, 3), dtype=np.uint8)
        img = pal[rng.integers(0, colors, shape)]
        rt = decode_gif(encode_gif(img))
        assert rt.shape == (*shape, 3)
        assert np.array_equal(rt, img), (shape, colors)


def test_gif_interlaced_decode():
    """Interlaced row order: re-pack an encoded GIF's rows in 4-pass
    order, set the interlace bit, and expect the original image back."""
    import struct

    import numpy as np

    from memfuse_spark.operators.multimodal import (
        _GIF_INTERLACE_PASSES,
        _gif_lzw_decode,
        _gif_lzw_encode,
        decode_gif,
        encode_gif,
    )

    rng = np.random.default_rng(3)
    pal = rng.integers(0, 256, (4, 3), dtype=np.uint8)
    idx = rng.integers(0, 4, (16, 9))
    img = pal[idx]
    h, w = idx.shape
    # interlaced pixel order
    rows = [idx[y] for start, step in _GIF_INTERLACE_PASSES
            for y in range(start, h, step)]
    seq = [int(v) for r in rows for v in r]
    lzw = _gif_lzw_encode(seq, 2)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | 1, 0, 0)  # 4-entry GCT
    out += pal.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x40)
    out.append(2)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    assert np.array_equal(decode_gif(bytes(out)), img)


def test_phash_real_gif_matches_png_twin(spark):
    """The same image through the GIF and PNG codecs must produce the
    same perceptual hash (decode_gif feeds the shared registry)."""
    import numpy as np

    from memfuse_spark.operators.multimodal import (
        encode_gif,
        encode_png,
        phash64,
    )

    rng = np.random.default_rng(11)
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    img = pal[rng.integers(0, 16, (24, 24))]
    rows = [
        ("g", "image/gif", encode_gif(img), 24, 24),
        ("p", "image/png", encode_png(img), 24, 24),
    ]
    df = spark.createDataFrame(
        rows, "media_id string, mime string, payload binary, width int, height int"
    )
    got = {r.media_id: r.phash for r in phash64(df).collect()}
    assert got["g"] == got["p"]


def _jpeg_header_bytes(w=320, h=200, ncomp=3, progressive=False):
    """Minimal structurally-valid JPEG prefix: SOI, APP0 (JFIF), a
    skippable COM segment, then SOF0/SOF2 — enough for a header sniff
    (no entropy-coded data; a decoder would reject it, the sniffer must
    not need one)."""
    import struct

    app0 = b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    com = b"made by tests"
    sof_marker = 0xC2 if progressive else 0xC0
    sof = struct.pack(">BHH", 8, h, w) + bytes([ncomp]) + b"\x01\x11\x00" * ncomp
    return (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", len(app0) + 2) + app0
        + b"\xff\xfe" + struct.pack(">H", len(com) + 2) + com
        + bytes([0xFF, sof_marker]) + struct.pack(">H", len(sof) + 2) + sof
    )


def test_sniff_media_bytes_all_containers():
    import numpy as np

    png = mm.encode_png(np.arange(12, dtype=np.uint8).reshape(2, 2, 3))
    m = mm.sniff_media_bytes(png)
    assert (m["container"], m["width"], m["height"], m["ok"]) == ("png", 2, 2, True)
    assert m["bit_depth"] == 8

    gif = mm.encode_gif(np.zeros((3, 5, 3), dtype=np.uint8))
    m = mm.sniff_media_bytes(gif)
    assert (m["container"], m["width"], m["height"], m["ok"]) == ("gif", 5, 3, True)

    m = mm.sniff_media_bytes(_jpeg_header_bytes(320, 200, 3))
    assert (m["container"], m["width"], m["height"], m["n_channels"], m["ok"]) == (
        "jpeg", 320, 200, 3, True
    )
    # progressive SOF2 and grayscale
    m = mm.sniff_media_bytes(_jpeg_header_bytes(64, 48, 1, progressive=True))
    assert (m["container"], m["width"], m["height"], m["n_channels"]) == (
        "jpeg", 64, 48, 1
    )

    m = mm.sniff_media_bytes(_wav_bytes(nch=2))
    assert (m["container"], m["n_channels"], m["sample_rate"], m["bit_depth"],
            m["ok"]) == ("wav", 2, 8000, 16, True)


def test_sniff_media_bytes_jpeg_fill_bytes_and_tem():
    """ITU T.81 B.1.1.2 allows any number of 0xFF fill bytes before a
    marker, and TEM (0x01) is a standalone length-less marker; a valid
    padded JPEG must still sniff (ADVICE r6 — the walk previously read
    the fill byte as the marker code)."""
    import struct

    base = _jpeg_header_bytes(320, 200, 3)
    # splice: SOI, fill bytes + TEM, more fill bytes, then the rest
    padded = base[:2] + b"\xff\xff\xff" + b"\xff\x01" + b"\xff\xff" + base[2:]
    m = mm.sniff_media_bytes(padded)
    assert (m["container"], m["width"], m["height"], m["ok"]) == (
        "jpeg", 320, 200, True
    )
    # fill bytes immediately before the SOF marker itself
    sof = struct.pack(">BHH", 8, 10, 20) + bytes([1]) + b"\x01\x11\x00"
    padded2 = (
        b"\xff\xd8" + b"\xff\xff\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    )
    m2 = mm.sniff_media_bytes(padded2)
    assert (m2["width"], m2["height"], m2["ok"]) == (20, 10, True)
    # a run of fill bytes that ends at the payload edge must not raise
    assert mm.sniff_media_bytes(b"\xff\xd8" + b"\xff" * 5)["ok"] is False


def test_sniff_media_bytes_rejects_i32_overflow_dims():
    """Corrupt unsigned 32-bit header fields above 2^31-1 must come
    back ok=False instead of overflowing sniff_media_meta's
    IntegerType Arrow columns in the executor (ADVICE r6)."""
    import struct

    huge_png = (
        b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\x0dIHDR"
        + struct.pack(">II", 2**31, 7) + bytes([8, 2, 0, 0, 0])
    )
    m = mm.sniff_media_bytes(huge_png)
    assert m["ok"] is False and m["width"] is None
    huge_wav = (
        b"RIFF\x24\x00\x00\x00WAVE" + b"fmt " + struct.pack("<I", 16)
        + struct.pack("<HHIIHH", 1, 2, 2**31 + 5, 0, 4, 16)
    )
    m2 = mm.sniff_media_bytes(huge_wav)
    assert m2["ok"] is False and m2["sample_rate"] is None


def test_sniff_media_bytes_corrupt_is_data_not_exception():
    for payload in (b"", b"\x00" * 40, b"\x89PNG\r\n\x1a\n",  # truncated PNG
                    b"\xff\xd8\xff\xe0\x00",                   # truncated JPEG
                    b"RIFF\x00\x00\x00\x00WAVE"):              # fmt-less WAV
        m = mm.sniff_media_bytes(payload)
        assert m["ok"] is False
    # mislabeled: GIF magic but truncated screen descriptor
    assert mm.sniff_media_bytes(b"GIF89a\x05")["ok"] is False


def test_sniff_media_meta_dataframe_path(spark):
    import numpy as np

    rows = [
        ("p1", "image/png", None,
         bytearray(mm.encode_png(np.zeros((4, 7, 3), dtype=np.uint8))), 0, 0, 0),
        ("j1", "image/jpeg", None, bytearray(_jpeg_header_bytes(99, 77)), 0, 0, 0),
        ("x1", "application/junk", None, bytearray(b"not media"), 0, 0, 0),
    ]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    got = {r.media_id: r for r in mm.sniff_media_meta(media).collect()}
    assert (got["p1"].container, got["p1"].width, got["p1"].height) == ("png", 7, 4)
    assert (got["j1"].container, got["j1"].width, got["j1"].height) == ("jpeg", 99, 77)
    assert got["x1"].container == "unknown" and got["x1"].ok is False


def test_sniff_media_bytes_total_on_arbitrary_bytes():
    """Fuzz the 'corrupt bytes are data, not exceptions' contract: any
    byte string — including ones opening with valid magics — must
    return the typed dict, never raise, and every numeric field must
    fit the mapInPandas IntegerType columns (ADVICE r6)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    magics = [b"", b"\x89PNG\r\n\x1a\n", b"GIF89a", b"GIF87a",
              b"\xff\xd8", b"\xff\xd8\xff\xff\xff", b"RIFF",
              b"RIFF0000WAVE"]

    @settings(max_examples=300, deadline=None)
    @given(st.sampled_from(magics), st.binary(max_size=120))
    def run(prefix, tail):
        m = mm.sniff_media_bytes(prefix + tail)
        assert set(m) == {"container", "width", "height", "n_channels",
                          "sample_rate", "bit_depth", "ok"}
        assert isinstance(m["ok"], bool)
        for k in ("width", "height", "n_channels", "sample_rate",
                  "bit_depth"):
            v = m[k]
            assert v is None or (0 <= v <= 2**31 - 1), (k, v)

    run()
