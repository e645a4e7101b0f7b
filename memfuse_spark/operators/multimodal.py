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
