"""Multimodal columns for training-data pipelines: image/audio/video as
opaque binary columns with typed metadata.

The Spark-side plumbing is real — schemas, Arrow-batched mapInPandas
transforms, partition-friendly layouts; the codec step is stubbed behind
``DECODERS`` because image/audio libraries are not in this container
(each stub is deterministic so tests can assert batch shapes end-to-end).
Swap a real decoder in (PIL / torchaudio / pyav) and nothing else
changes: same schema, same batch iterator, same partitioning.

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


DECODERS = {"image/fake": _stub_decode_image}


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
