"""Multimodal columns: opaque binary media + typed metadata.

Images/audio/video are carried as `binary` columns with a typed metadata
struct; decode / feature-extract / resize / frame-sample run as vectorized
mapInPandas stages. The actual codecs are NOT available in this container,
so decoding is STUBBED: a deterministic fake decoder handles the synthetic
`FAKE<modality>` container format used by the fixtures, and real formats
raise NotImplementedError behind an import-try (the Spark-side plumbing —
schema, partitioning, UDF signature, Arrow batch shape — is real and
tested).

Media rows dedup exactly like text: sha256 of the raw bytes is the K-key
(content addressing is modality-agnostic — libchunk never interprets
payload bytes, bits/put.go:38).
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, modality string, media binary, "
    "meta struct<format:string, width:int, height:int, duration_ms:int>"
)

_FAKE_MAGIC = b"FAKE"


def encode_fake_media(
    modality: str, width: int, height: int, seed: int, n_frames: int = 1
) -> bytes:
    """Deterministic synthetic media container (tests/fixtures only):
    header FAKE | modality[3] | w | h | frames, then seeded uint8 payload."""
    rng = np.random.default_rng(seed)
    head = _FAKE_MAGIC + modality[:3].ljust(3).encode() + struct.pack(
        "<iii", width, height, n_frames
    )
    body = rng.integers(0, 256, width * height * n_frames, dtype=np.uint8).tobytes()
    return head + body


def _decode_fake(media: bytes) -> tuple[str, int, int, int, np.ndarray]:
    if media[:4] != _FAKE_MAGIC:
        raise NotImplementedError(
            "real media codecs are not available in this container; "
            "only the FAKE container format is decodable (stub)"
        )
    modality = media[4:7].decode().strip()
    w, h, frames = struct.unpack("<iii", media[7:19])
    arr = np.frombuffer(media[19 : 19 + w * h * frames], dtype=np.uint8)
    return modality, w, h, frames, arr.reshape(frames, h, w)


def media_keys(media_df: DataFrame) -> DataFrame:
    """Content-addressable keys for media rows (exact dedup, any modality)."""
    return media_df.select(
        "media_id",
        "modality",
        F.sha2(F.col("media"), 256).alias("k"),
        F.length(F.col("media")).alias("n_bytes"),
    )


FEATURE_SCHEMA = (
    "media_id long, modality string, width int, height int, n_frames int, "
    "mean_intensity double, intensity_hist array<int>"
)


def extract_features(media_df: DataFrame) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batches, NumPy body)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, modality, media in zip(
                pdf["media_id"], pdf["modality"], pdf["media"]
            ):
                mod, w, h, frames, arr = _decode_fake(bytes(media))
                hist = np.bincount(arr.ravel() >> 5, minlength=8)
                rows.append(
                    (
                        int(mid),
                        mod,
                        w,
                        h,
                        frames,
                        float(np.round(arr.mean(), 4)),
                        [int(x) for x in hist],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "modality", "width", "height", "n_frames",
                    "mean_intensity", "intensity_hist",
                ],
            )

    return media_df.select("media_id", "modality", "media").mapInPandas(
        gen, FEATURE_SCHEMA
    )


RESIZE_SCHEMA = "media_id long, width int, height int, resized binary"


def resize_images(media_df: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize of decoded frames (stub decoder)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, media in zip(pdf["media_id"], pdf["media"]):
                _, w, h, frames, arr = _decode_fake(bytes(media))
                ys = (np.arange(out_h) * h // out_h)
                xs = (np.arange(out_w) * w // out_w)
                small = arr[0][np.ix_(ys, xs)]
                rows.append((int(mid), out_w, out_h, small.tobytes()))
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "resized"]
            )

    return media_df.select("media_id", "media").mapInPandas(gen, RESIZE_SCHEMA)


FRAME_SAMPLE_SCHEMA = "media_id long, frame_no int, frame_sha string"


def sample_frames(media_df: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame sampling for video-modality rows (stub decoder): one output row
    per sampled frame, content-addressed like chunks."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mids, fnos, shas = [], [], []
            for mid, media in zip(pdf["media_id"], pdf["media"]):
                _, w, h, frames, arr = _decode_fake(bytes(media))
                for f in range(0, frames, every_n):
                    mids.append(int(mid))
                    fnos.append(f)
                    shas.append(hashlib.sha256(arr[f].tobytes()).hexdigest())
            yield pd.DataFrame(
                {"media_id": mids, "frame_no": fnos, "frame_sha": shas}
            )

    return media_df.select("media_id", "media").mapInPandas(
        gen, FRAME_SAMPLE_SCHEMA
    )
