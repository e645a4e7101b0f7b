"""Multimodal columns for training-data pipelines: image/audio/video as
opaque binary columns with typed metadata.

The Spark-side plumbing is real — schemas, Arrow-batched mapInPandas
transforms, partition-friendly layouts — and so are two codecs:
``image/png`` (pure stdlib zlib chunk-walk + filter inversion,
:func:`decode_png`/:func:`encode_png`) and ``audio/wav`` (stdlib
``wave``, :func:`decode_wav`). Formats that DO need external libraries
(JPEG, MP3, video) stay behind the ``DECODERS`` registry with the
deterministic ``image/fake`` stub documenting the seam; swap in
PIL / torchaudio / pyav and nothing else changes: same schema, same
batch iterator, same partitioning.

Design notes for 100 TB of media:
- binary payloads stay in parquet (or are pointers into an object store
  — the `uri` column); metadata columns are small and columnar, so
  filters on width/duration/mime prune row groups WITHOUT touching the
  payload bytes (parquet column projection).
- decode/feature-extract runs as mapInPandas: Arrow moves the binary
  column zero-copy into pandas, each task decodes its partition, and
  `spark.sql.files.maxPartitionBytes` bounds memory per task.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id string, mime string, uri string, payload binary, "
    "width int, height int, duration_ms int"
)


def _stub_decode_image(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic fake decoder: payload bytes → pseudo-pixel array.
    Replace with PIL/turbojpeg in production; signature stays."""
    seed = int.from_bytes(hashlib.md5(payload).digest()[:4], "big")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(height, width, 3), dtype=np.uint8)


# ---------------------------------------------------------------------------
# real codecs — pure stdlib (zlib / struct / wave), no image libraries
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # gray, RGB, gray+A, RGBA


def decode_png(payload: bytes, width: int = 0, height: int = 0) -> np.ndarray:
    """REAL PNG decoder (RFC 2083) in pure stdlib zlib+numpy: chunk walk
    → inflate IDAT → invert the per-scanline filter (None/Sub/Up/
    Average/Paeth) → HxWx3 uint8. Supports 8-bit gray/RGB/gray+A/RGBA,
    non-interlaced — the shapes a training pipeline normalizes to
    anyway. width/height args are advisory metadata; the IHDR is
    authoritative."""
    import struct
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, idat = 8, []
    w = h = depth = color = interlace = None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            w, h, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if w is None:
        raise ValueError("PNG missing IHDR")
    if depth != 8 or interlace != 0 or color not in _PNG_CHANNELS:
        raise NotImplementedError(
            f"PNG bit depth {depth} / color {color} / interlace {interlace}"
        )
    ch = _PNG_CHANNELS[color]
    stride = w * ch
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline data truncated")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        row = raw[y * (stride + 1) : (y + 1) * (stride + 1)]
        f, line = row[0], np.frombuffer(row[1:], np.uint8).astype(np.int64)
        if f == 0:
            rec = line
        elif f == 2:  # Up — vectorizable: no intra-row dependency
            rec = (line + prev) & 0xFF
        else:  # Sub/Average/Paeth recur on the reconstructed left pixel
            rec = np.zeros(stride, dtype=np.int64)
            for i in range(stride):
                a = rec[i - ch] if i >= ch else 0
                b = prev[i]
                c = prev[i - ch] if i >= ch else 0
                if f == 1:
                    pred = a
                elif f == 3:
                    pred = (a + b) // 2
                elif f == 4:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                else:
                    raise ValueError(f"PNG filter {f}")
                rec[i] = (line[i] + pred) & 0xFF
        out[y] = rec
        prev = rec.astype(np.int64)
    px = out.reshape(h, w, ch)
    if ch == 1:
        return np.repeat(px, 3, axis=2)
    if ch == 2:  # gray+alpha → drop alpha, expand gray
        return np.repeat(px[:, :, :1], 3, axis=2)
    return px[:, :, :3].copy()  # RGB / RGBA → RGB


def encode_png(img: np.ndarray, filter_type: int = 0) -> bytes:
    """Minimal PNG encoder (8-bit RGB, one filter type for every
    scanline) — the sink/fixture twin of :func:`decode_png`; also how
    tests exercise each of the five filter inverses without an image
    library."""
    import struct
    import zlib

    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, axis=2)
    h, w, ch = img.shape
    assert ch == 3, "encode_png writes RGB"
    a_off = 3

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    flat = img.reshape(h, w * 3).astype(np.int64)
    lines = []
    prev = np.zeros(w * 3, dtype=np.int64)
    for y in range(h):
        cur = flat[y]
        a = np.concatenate([np.zeros(a_off, np.int64), cur[:-a_off]])
        b = prev
        c = np.concatenate([np.zeros(a_off, np.int64), prev[:-a_off]])
        if filter_type == 0:
            filt = cur
        elif filter_type == 1:
            filt = cur - a
        elif filter_type == 2:
            filt = cur - b
        elif filter_type == 3:
            filt = cur - (a + b) // 2
        elif filter_type == 4:
            p = a + b - c
            pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
            pred = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
            filt = cur - pred
        else:
            raise ValueError(f"PNG filter {filter_type}")
        lines.append(bytes([filter_type]) + (filt & 0xFF).astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    idat = zlib.compress(b"".join(lines), 6)
    return (
        _PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")
    )


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """REAL WAV decoder via the stdlib ``wave`` module: PCM payload →
    (float64 waveform in [-1, 1], mono-mixed, sample_rate). 8/16/32-bit
    PCM supported."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as wf:
        n, width, rate, nch = (
            wf.getnframes(),
            wf.getsampwidth(),
            wf.getframerate(),
            wf.getnchannels(),
        )
        frames = wf.readframes(n)
    if width == 1:  # unsigned 8-bit
        x = np.frombuffer(frames, np.uint8).astype(np.float64)
        x = (x - 128.0) / 128.0
    elif width == 2:
        x = np.frombuffer(frames, "<i2").astype(np.float64) / 32768.0
    elif width == 4:
        x = np.frombuffer(frames, "<i4").astype(np.float64) / 2147483648.0
    else:
        raise NotImplementedError(f"WAV sample width {width}")
    if nch > 1:
        x = x.reshape(-1, nch).mean(axis=1)
    return x, rate


def _gif_lzw_decode(data: bytes, min_code_size: int) -> list[int]:
    """GIF-flavor LZW: variable 3..12-bit codes packed LSB-first,
    CLEAR resets the dictionary, EOI terminates."""
    clear = 1 << min_code_size
    end = clear + 1
    code_size = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out: list[int] = []
    acc = nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= code_size:
            code = acc & ((1 << code_size) - 1)
            acc >>= code_size
            nbits -= code_size
            if code == clear:
                table = [bytes([i]) for i in range(clear)] + [b"", b""]
                code_size = min_code_size + 1
                prev = None
                continue
            if code == end:
                return out
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):  # the KwKwK case
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("corrupt GIF LZW stream")
            out.extend(entry)
            prev = entry
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
    return out


def _gif_lzw_encode(indices, min_code_size: int) -> bytes:
    """Dictionary LZW encoder matched to :func:`_gif_lzw_decode`
    (CLEAR-reset at the 4096-entry cap, LSB-first packing)."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = nbits = 0

    code_size = min_code_size + 1
    table = {bytes([i]): i for i in range(clear)}
    nxt = end + 1

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += code_size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    w = b""
    for px in indices:
        wk = w + bytes([px])
        if wk in table:
            w = wk
            continue
        emit(table[w])
        table[wk] = nxt
        nxt += 1
        # the decoder widens after DEFINING entry (1<<code_size)-1; the
        # encoder has just defined entry nxt-1, so widen when the NEXT
        # emitted code would not fit the decoder's current width
        if nxt - 1 == (1 << code_size) and code_size < 12:
            code_size += 1
        elif nxt - 1 == 4096:
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            code_size = min_code_size + 1
            nxt = end + 1
        w = bytes([px])
    if w:
        emit(table[w])
    emit(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(payload: bytes, width: int = 0, height: int = 0) -> np.ndarray:
    """REAL GIF87a/89a decoder in pure stdlib+numpy: logical-screen /
    color-table parse → sub-block reassembly → LZW (variable-width
    LSB-first codes, CLEAR/EOI, KwKwK case) → palette lookup → HxWx3
    uint8. First image frame; interlaced row order supported.
    width/height args are advisory; the stream is authoritative."""
    import struct

    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw, sh, packed, _bg, _ar = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload[pos : pos + 3 * n], np.uint8).reshape(n, 3)
        pos += 3 * n
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x21:  # extension: label + sub-blocks
            pos += 1
            while payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            _lx, _ty, iw, ih, ipacked = struct.unpack(
                "<HHHHB", payload[pos : pos + 9]
            )
            pos += 9
            pal = gct
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                pal = np.frombuffer(
                    payload[pos : pos + 3 * n], np.uint8
                ).reshape(n, 3)
                pos += 3 * n
            if pal is None:
                raise ValueError("GIF image without a color table")
            min_code = payload[pos]
            pos += 1
            data = bytearray()
            while payload[pos]:
                ln = payload[pos]
                data += payload[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            idx = _gif_lzw_decode(bytes(data), min_code)
            if len(idx) < iw * ih:
                raise ValueError("GIF pixel data truncated")
            rows = np.asarray(idx[: iw * ih], np.int64).reshape(ih, iw)
            if ipacked & 0x40:  # interlaced: 4-pass row order
                ordered = np.empty_like(rows)
                src = 0
                for start, step in _GIF_INTERLACE_PASSES:
                    n_rows = len(range(start, ih, step))
                    ordered[start::step] = rows[src : src + n_rows]
                    src += n_rows
                rows = ordered
            return pal[rows]
        elif block == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    raise ValueError("GIF contains no image data")


def encode_gif(img: np.ndarray) -> bytes:
    """Minimal GIF89a encoder (single frame, global palette, no
    interlace) — the fixture twin of :func:`decode_gif`. Lossless for
    images with <= 256 distinct colors (a palette format; quantization
    is out of scope)."""
    import struct

    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, axis=2)
    h, w, _ = img.shape
    flat = img.reshape(-1, 3)
    palette, idx = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError("encode_gif needs <= 256 distinct colors")
    depth = max(1, int(np.ceil(np.log2(max(2, len(palette))))))
    n_pal = 1 << depth
    pal_bytes = np.zeros((n_pal, 3), np.uint8)
    pal_bytes[: len(palette)] = palette
    min_code = max(2, depth)
    lzw = _gif_lzw_encode(idx.astype(np.int64).tolist(), min_code)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (depth - 1), 0, 0)
    out += pal_bytes.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    out.append(min_code)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


DECODERS = {
    "image/fake": _stub_decode_image,
    "image/png": decode_png,  # real codec, stdlib-only
    "image/gif": lambda payload, width=0, height=0: decode_gif(payload),
}
AUDIO_DECODERS = {"audio/wav": decode_wav}  # real codec, stdlib-only


def decode_features(
    media: DataFrame,
    feature_dim: int = 8,
) -> DataFrame:
    """Decode → feature-extract as one Arrow-batched pass.

    Output: (media_id, mime, feature: array<float>, pixel_mean double).
    The stub 'model' is channel-mean pooling over the fake decode; a real
    embedding model slots into the same iterator.
    """
    out_schema = (
        "media_id string, mime string, feature array<double>, pixel_mean double"
    )

    cols = ["media_id", "mime", "feature", "pixel_mean"]

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame(columns=cols)
                continue
            unknown = set(pdf["mime"]) - DECODERS.keys()
            if unknown:
                raise NotImplementedError(
                    f"no decoder for mime {sorted(unknown)!r} in this container; "
                    "register one in multimodal.DECODERS"
                )
            # the codec call is inherently per-item (a real decoder takes
            # one payload at a time); everything around it is batch-
            # vectorized numpy over the whole Arrow chunk
            imgs = [
                DECODERS[m](bytes(p), int(w), int(h))
                for m, p, w, h in zip(
                    pdf["mime"], pdf["payload"], pdf["width"], pdf["height"]
                )
            ]
            pooled = np.stack([im.reshape(-1, 3).mean(axis=0) for im in imgs])
            reps = -(-feature_dim // 3)  # np.resize cycle, batch-wide
            feats = np.tile(pooled / 255.0, (1, reps))[:, :feature_dim]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "mime": pdf["mime"].to_numpy(),
                    "feature": list(feats),
                    "pixel_mean": [float(im.mean()) for im in imgs],
                }
            )

    return media.select("media_id", "mime", "payload", "width", "height").mapInPandas(
        extract, out_schema
    )


def audio_features(media: DataFrame) -> DataFrame:
    """Decode WAV audio → per-clip signal features in one Arrow-batched
    pass: (media_id, mime, n_samples, sample_rate, rms,
    zero_cross_rate, duration_ms_decoded). The same mapInPandas shape
    as :func:`decode_features`; the per-item codec is the REAL stdlib
    WAV decode."""
    out_schema = (
        "media_id string, mime string, n_samples long, sample_rate int, "
        "rms double, zero_cross_rate double, duration_ms_decoded double"
    )
    cols = [
        "media_id", "mime", "n_samples", "sample_rate", "rms",
        "zero_cross_rate", "duration_ms_decoded",
    ]

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame(columns=cols)
                continue
            unknown = set(pdf["mime"]) - AUDIO_DECODERS.keys()
            if unknown:
                raise NotImplementedError(
                    f"no audio decoder for mime {sorted(unknown)!r}; "
                    "register one in multimodal.AUDIO_DECODERS"
                )
            rows = []
            for mid, m, p in zip(pdf["media_id"], pdf["mime"], pdf["payload"]):
                x, rate = AUDIO_DECODERS[m](bytes(p))
                n = len(x)
                rms = float(np.sqrt(np.mean(x**2))) if n else 0.0
                zcr = (
                    float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
                    if n > 1
                    else 0.0
                )
                rows.append(
                    (mid, m, n, rate, rms, zcr, 1000.0 * n / rate if rate else 0.0)
                )
            yield pd.DataFrame(rows, columns=cols)

    return media.select("media_id", "mime", "payload").mapInPandas(
        extract, out_schema
    )


def resize_plan(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize planning is pure metadata math — no decode needed. Computes
    target dims per row (JVM-side), so the expensive decode+resize pass
    only touches rows where `needs_resize`."""
    scale = F.least(
        F.lit(float(max_side)) / F.col("width"), F.lit(float(max_side)) / F.col("height")
    )
    needs = (F.col("width") > max_side) | (F.col("height") > max_side)
    return media.withColumn("needs_resize", needs).withColumn(
        "target_width",
        F.when(needs, F.floor(F.col("width") * scale)).otherwise(F.col("width")).cast("int"),
    ).withColumn(
        "target_height",
        F.when(needs, F.floor(F.col("height") * scale)).otherwise(F.col("height")).cast("int"),
    )


def frame_sample_plan(
    media: DataFrame, every_ms: int = 1000, max_frames: int = 16
) -> DataFrame:
    """Video frame-sampling plan: explode each video row into the frame
    timestamps a decoder should extract (capped). Pure column math —
    the decode itself would consume this plan via mapInPandas."""
    n_frames = F.least(
        F.greatest(F.floor(F.col("duration_ms") / every_ms), F.lit(1)).cast("int"),
        F.lit(max_frames),
    )
    return media.select(
        "media_id",
        "mime",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_frames - 1), lambda i: i * every_ms
            )
        ).alias("frame_index", "frame_ts_ms"),
    )


# ---------------------------------------------------------------------------
# perceptual-hash fingerprints + near-dup join
# ---------------------------------------------------------------------------

PHASH_BANDS = 4          # 4 x 16-bit bands over the 64-bit hash
PHASH_MAX_HAMMING = 3    # < bands, so one band is always clean (pigeonhole)


def phash64(media: DataFrame) -> DataFrame:
    """(media_id, phash) — 64-bit average-hash perceptual fingerprint:
    decode → grayscale → 8x8 block means → threshold at the per-image
    median → bit-pack. Everything after the per-item codec call is
    batch-vectorized numpy over the Arrow chunk; with a real decoder the
    same hash is the standard aHash (pHash's DCT variant drops into the
    same reduction).
    """
    out_schema = "media_id string, phash long"

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        weights = (np.uint64(1) << np.arange(64, dtype=np.uint64))
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame({"media_id": [], "phash": []})
                continue
            unknown = set(pdf["mime"]) - DECODERS.keys()
            if unknown:
                raise NotImplementedError(
                    f"no decoder for mime {sorted(unknown)!r} in this "
                    "container; register one in multimodal.DECODERS"
                )
            hashes = np.empty(len(pdf), dtype=np.int64)
            for i, (m, p, w, h) in enumerate(
                zip(pdf["mime"], pdf["payload"], pdf["width"], pdf["height"])
            ):
                im = DECODERS[m](bytes(p), int(w), int(h))
                gray = im.mean(axis=2)
                gh, gw = gray.shape
                # 8x8 block means: crop to a multiple of 8 then reshape
                gray = gray[: gh - gh % 8 or 8, : gw - gw % 8 or 8]
                b = gray.reshape(8, gray.shape[0] // 8, 8, -1).mean(axis=(1, 3))
                bits = (b > np.median(b)).ravel()
                hashes[i] = (weights[bits].sum()).astype(np.int64)
            yield pd.DataFrame(
                {"media_id": pdf["media_id"].to_numpy(), "phash": hashes}
            )

    return media.select("media_id", "mime", "payload", "width", "height").mapInPandas(
        compute, out_schema
    )


def media_neardup_pairs(
    hashes: DataFrame,
    max_hamming: int = PHASH_MAX_HAMMING,
    id_col: str = "media_id",
    hash_col: str = "phash",
) -> DataFrame:
    """(id_a, id_b, hamming) — near-duplicate media pairs by banded
    Hamming join over 64-bit fingerprints, the same pigeonhole shape as
    the SimHash text path (dedup.simhash_pairs): with ``bands`` >
    ``max_hamming`` at least one 16-bit band matches exactly, so
    candidates come from ``bands`` equi-joins (bucketed, never
    all-pairs) and the exact Hamming verify is one codegen
    ``bit_count(a XOR b)`` per candidate."""
    bands = [
        F.shiftrightunsigned(F.col(hash_col), 16 * i).bitwiseAND(F.lit(0xFFFF)).alias(
            f"b{i}"
        )
        for i in range(PHASH_BANDS)
    ]
    h = hashes.select(F.col(id_col).alias("id"), F.col(hash_col).alias("h"), *bands)
    cand = None
    for i in range(PHASH_BANDS):
        a = h.select(
            F.col("id").alias("id_a"), F.col("h").alias("h_a"), F.col(f"b{i}").alias("bk")
        )
        b = h.select(
            F.col("id").alias("id_b"), F.col("h").alias("h_b"), F.col(f"b{i}").alias("bk")
        )
        c = a.join(b, "bk").filter(F.col("id_a") < F.col("id_b")).drop("bk")
        cand = c if cand is None else cand.unionByName(c)
    verified = (
        cand.dropDuplicates(["id_a", "id_b"])
        .withColumn(
            "hamming",
            F.expr("bit_count(h_a ^ h_b)").cast("int"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )
    return verified.select("id_a", "id_b", "hamming").orderBy("id_a", "id_b")


# ---------------------------------------------------------------------------
# container header sniffing — metadata WITHOUT decode
# ---------------------------------------------------------------------------

def sniff_media_bytes(payload: bytes) -> dict:
    """Parse container metadata straight from the leading bytes of a
    media payload — pure stdlib, NO decode: the triage pass a 100 TB
    ingest runs to build/verify typed metadata columns (and catch
    mislabeled or truncated files) before any decoder task is
    scheduled. Real parsers, including JPEG (whose PIXEL decode stays
    an honest lib-needing stub in ``DECODERS`` — dimensions live in the
    SOF header and need no IDCT):

    - PNG: IHDR width/height/bit-depth/color-type (RFC 2083 §4.1.1)
    - GIF87a/89a: logical screen descriptor (little-endian)
    - JPEG: marker walk to the first SOF0/1/2/3/5/6/7/9/10/11/13/14/15
      frame header (ITU T.81 §B.2.2) → height/width/components
    - WAV: RIFF/WAVE fmt chunk → channels/sample-rate/bits-per-sample

    Returns {container, width, height, n_channels, sample_rate,
    bit_depth, ok}; unknown/truncated payloads come back
    container='unknown'/ok=False instead of raising — corrupt bytes are
    data, not exceptions, at scale. Unsigned header fields (PNG/WAV are
    32-bit) are range-checked against the IntegerType columns of
    :func:`sniff_media_meta` — a corrupt width of 2^31+ is rejected
    (ok=False) here rather than overflowing the Arrow conversion and
    failing the executor task (ADVICE r6).
    """
    import struct

    out = {
        "container": "unknown", "width": None, "height": None,
        "n_channels": None, "sample_rate": None, "bit_depth": None,
        "ok": False,
    }
    _I32_MAX = 2**31 - 1
    try:
        if payload[:8] == b"\x89PNG\r\n\x1a\n" and payload[12:16] == b"IHDR":
            w, h = struct.unpack(">II", payload[16:24])
            if w <= _I32_MAX and h <= _I32_MAX:
                out.update(
                    container="png", width=w, height=h,
                    bit_depth=payload[24], ok=True,
                )
        elif payload[:6] in (b"GIF87a", b"GIF89a"):
            w, h = struct.unpack("<HH", payload[6:10])
            out.update(container="gif", width=w, height=h, ok=True)
        elif payload[:2] == b"\xff\xd8":  # JPEG SOI
            sof = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                   0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}
            i = 2
            while i + 4 <= len(payload):
                if payload[i] != 0xFF:
                    break
                # ITU T.81 B.1.1.2: any number of 0xFF fill bytes may
                # pad the gap before a marker — skip them so the fill
                # byte is never read as the marker code (ADVICE r6)
                while i + 2 <= len(payload) and payload[i + 1] == 0xFF:
                    i += 1
                if i + 4 > len(payload):
                    break
                marker = payload[i + 1]
                if marker == 0xD8 or 0xD0 <= marker <= 0xD7 or marker == 0x01:
                    i += 2  # SOI/RSTn/TEM are standalone — no length
                    continue
                (seglen,) = struct.unpack(">H", payload[i + 2:i + 4])
                if marker in sof and i + 9 <= len(payload):
                    prec = payload[i + 4]
                    h, w = struct.unpack(">HH", payload[i + 5:i + 9])
                    out.update(
                        container="jpeg", width=w, height=h,
                        bit_depth=prec,
                        n_channels=payload[i + 9] if i + 10 <= len(payload) else None,
                        ok=True,
                    )
                    break
                i += 2 + seglen
        elif payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            i = 12
            while i + 8 <= len(payload):
                cid = payload[i:i + 4]
                (clen,) = struct.unpack("<I", payload[i + 4:i + 8])
                if cid == b"fmt " and i + 24 <= len(payload):
                    ch, rate = struct.unpack("<HI", payload[i + 10:i + 16])
                    (bits,) = struct.unpack("<H", payload[i + 22:i + 24])
                    if rate <= _I32_MAX:
                        out.update(
                            container="wav", n_channels=ch, sample_rate=rate,
                            bit_depth=bits, ok=True,
                        )
                    break
                i += 8 + clen + (clen & 1)  # RIFF chunks are word-aligned
    except (struct.error, IndexError):
        # truncated mid-field — a partial header is not trustworthy
        # metadata; ok stays False
        pass
    return out


def sniff_media_meta(
    media: DataFrame, id_col: str = "media_id", payload_col: str = "payload"
) -> DataFrame:
    """(media_id, container, width, height, n_channels, sample_rate,
    bit_depth, ok) — :func:`sniff_media_bytes` over a binary column as
    Arrow-batched ``mapInPandas``: payload bytes move zero-copy into
    the worker, only the small typed metadata columns come back (the
    shuffle never carries the binaries)."""
    from pyspark.sql import types as T

    id_type = media.schema[id_col].dataType
    schema = T.StructType(
        [
            T.StructField("media_id", id_type),
            T.StructField("container", T.StringType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("n_channels", T.IntegerType()),
            T.StructField("sample_rate", T.IntegerType()),
            T.StructField("bit_depth", T.IntegerType()),
            T.StructField("ok", T.BooleanType()),
        ]
    )

    def sniff(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [
                sniff_media_bytes(bytes(p) if p is not None else b"")
                for p in pdf[payload_col]
            ]
            out = pd.DataFrame(metas)
            out.insert(0, "media_id", pdf[id_col].values)
            yield out

    return media.select(id_col, payload_col).mapInPandas(sniff, schema)
