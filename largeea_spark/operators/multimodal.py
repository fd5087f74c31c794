"""Multimodal-column operators (round-1 instruction: image/audio/video
as opaque ``binary`` columns with typed metadata).

The container has no image/audio codecs, so the DECODE step is stubbed
(deterministic fake or NotImplementedError per the instruction), but the
Spark-side plumbing is real and tested: schemas, Arrow batch shapes,
``mapInPandas`` signatures, and partitioning all behave exactly as they
would with a real codec dropped in.

Design for 100 TB: media bytes never leave the executor (no collect);
decode/feature UDFs are iterator-style ``mapInPandas`` so one Arrow
batch of blobs is in memory at a time; `spark.sql.files.maxPartitionBytes`
and `arrow.maxRecordsPerBatch` bound peak memory; derived features are
small typed columns that downstream joins/aggs use without re-reading
blobs (column pruning keeps the binary out of later scans).
"""

from __future__ import annotations

import hashlib
import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, content binary, mime string, "
    "width int, height int, duration_ms int"
)


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table with plausible metadata (fixture)."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * (4 + i % 7)
        rows.append(
            (i, kind, bytearray(payload), f"application/x-fake-{kind}",
             64 + (i * 13) % 512 if kind != "audio" else None,
             64 + (i * 29) % 512 if kind != "audio" else None,
             1000 + (i * 37) % 90000 if kind != "image" else None)
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def real_decode_stub(content: bytes, kind: str):
    """Where a real codec plugs in (PIL/librosa/ffmpeg). Not available in
    this container — see ``fake_decode`` for the deterministic stand-in
    used by tests."""
    raise NotImplementedError(
        "media codecs are not installed in this environment; "
        "swap in PIL/librosa/pyav here on a real cluster"
    )


def fake_decode(content: bytes, dim: int = 32) -> np.ndarray:
    """Deterministic stand-in 'decoder': bytes → pseudo feature vector
    (crc-seeded). Same shape/dtype contract as a real embedding model."""
    h = zlib.crc32(content)
    rng = np.random.default_rng(h)
    v = rng.standard_normal(dim)
    return (v / np.linalg.norm(v)).astype(np.float32)


def extract_features(media: DataFrame, dim: int = 32,
                     use_real_codec: bool = False) -> DataFrame:
    """binary content → feature vector column via iterator mapInPandas
    (one Arrow batch of blobs resident at a time)."""

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for content, kind in zip(pdf["content"], pdf["kind"]):
                if use_real_codec:
                    real_decode_stub(bytes(content), kind)  # raises
                feats.append(fake_decode(bytes(content), dim).tolist())
            yield pd.DataFrame({
                "media_id": pdf["media_id"], "kind": pdf["kind"],
                "feature": feats,
                "n_bytes": [len(bytes(c)) for c in pdf["content"]],
            })

    return media.mapInPandas(
        fn, schema=f"media_id long, kind string, feature array<float>, n_bytes long"
    )


def resize_images(media: DataFrame, target_w: int = 224, target_h: int = 224) -> DataFrame:
    """Image resize plumbing: filters to images, computes target scale
    metadata JVM-side, and routes bytes through the (stubbed) resizer in
    mapInPandas. The fake 'resize' re-hashes bytes to the target size
    marker — real PIL drops in at the marked line."""
    imgs = media.where(F.col("kind") == "image")

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_bytes = []
            for content in pdf["content"]:
                b = bytes(content)
                # REAL: PIL.Image.open(io.BytesIO(b)).resize((w,h)).tobytes()
                out_bytes.append(hashlib.sha256(b).digest())
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "content": out_bytes,
                "width": [target_w] * len(pdf),
                "height": [target_h] * len(pdf),
            })

    return imgs.mapInPandas(
        fn, schema="media_id long, content binary, width int, height int"
    )


def sample_frames(media: DataFrame, every_ms: int = 1000, max_frames: int = 8) -> DataFrame:
    """Video frame sampling plumbing: JVM-side frame-timestamp planning
    (sequence over duration — no UDF), stubbed per-frame decode. Output:
    one row per sampled frame with typed metadata."""
    vids = media.where(F.col("kind") == "video").withColumn(
        "frame_ts",
        F.explode(
            F.slice(
                F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms)),
                1, max_frames,
            )
        ),
    )

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                fake_decode(bytes(c) + int(t).to_bytes(8, "little")).tolist()
                for c, t in zip(pdf["content"], pdf["frame_ts"])
            ]
            yield pd.DataFrame({
                "media_id": pdf["media_id"], "frame_ts": pdf["frame_ts"],
                "frame_feature": feats,
            })

    return vids.mapInPandas(
        fn, schema="media_id long, frame_ts int, frame_feature array<float>"
    )
