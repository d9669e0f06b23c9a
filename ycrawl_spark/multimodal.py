"""Multimodal column plumbing: image/audio/video as opaque binary +
typed metadata, processed by Arrow-batched mapInPandas.

The image codec path is REAL (ycrawl_spark.codecs, numpy). Audio/video
decode would need libs this container doesn't ship (ffmpeg, soundfile)
— those decode steps are STUBBED behind import-tries with
deterministic numpy fakes, while the Spark-side plumbing (schema,
partitioning, UDF signature, batch shape) is real and tested.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from . import codecs

try:  # real decoders would come from these; not present in this image
    import PIL.Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False

IMAGE_FEATURES_SCHEMA = (
    "image_id string, w int, h int, fmt string, mean_r double, mean_g double, "
    "mean_b double, phash long"
)

THUMB_SCHEMA = "image_id string, thumb binary, tw int, th int"

FRAME_SAMPLE_SCHEMA = "video_id string, frame_idx int, frame binary"


def image_features(images: DataFrame) -> DataFrame:
    """Decode + feature-extract over binary image column (real path)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = []
            for iid, raw in zip(b["image_id"], b["bytes"]):
                px = codecs.decode(bytes(raw))
                h, w, _ = px.shape
                rb = bytes(raw)
                fmt = "ppm" if rb[:2] == b"P6" else codecs.FORMATS[rb[4]]
                means = px.reshape(-1, 3).mean(axis=0)
                out.append(
                    (iid, w, h, fmt, round(float(means[0]), 4),
                     round(float(means[1]), 4), round(float(means[2]), 4),
                     codecs.phash64(px))
                )
            yield pd.DataFrame(
                out, columns=["image_id", "w", "h", "fmt", "mean_r", "mean_g",
                              "mean_b", "phash"]
            )

    return images.select("image_id", "bytes").mapInPandas(run, IMAGE_FEATURES_SCHEMA)


def image_resize(images: DataFrame, tw: int = 8, th: int = 8) -> DataFrame:
    """Block-mean resize (numpy 'thumbnail'); with PIL present this
    would be Image.resize — the Spark plumbing is identical."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = []
            for iid, raw in zip(b["image_id"], b["bytes"]):
                px = codecs.decode(bytes(raw)).astype(np.float64)
                h, w, _ = px.shape
                bh, bw = max(h // th, 1), max(w // tw, 1)
                thumb = (
                    px[: bh * th, : bw * tw]
                    .reshape(th, bh, tw, bw, 3)
                    .mean(axis=(1, 3))
                    .astype(np.uint8)
                )
                out.append((iid, thumb.tobytes(), tw, th))
            yield pd.DataFrame(out, columns=["image_id", "thumb", "tw", "th"])

    return images.select("image_id", "bytes").mapInPandas(run, THUMB_SCHEMA)


def audio_features(audio: DataFrame) -> DataFrame:
    """STUB: real decode needs an audio lib not in this container.

    Contract: input (clip_id string, bytes binary, sample_rate int) →
    (clip_id, n_samples long, rms double). The deterministic fake
    treats bytes as int16 PCM — which is exactly what the real
    decode-free WAV path would do — so the plumbing is exercised.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = []
            for cid, raw in zip(b["clip_id"], b["bytes"]):
                pcm = np.frombuffer(bytes(raw)[: len(bytes(raw)) // 2 * 2], dtype=np.int16)
                if pcm.size == 0:
                    out.append((cid, 0, 0.0))
                else:
                    out.append(
                        (cid, int(pcm.size),
                         round(float(np.sqrt(np.mean(pcm.astype(np.float64) ** 2))), 4))
                    )
            yield pd.DataFrame(out, columns=["clip_id", "n_samples", "rms"])

    return audio.select("clip_id", "bytes").mapInPandas(
        run, "clip_id string, n_samples long, rms double"
    )


def video_frame_sample(videos: DataFrame, every_n: int = 4,
                       frame_bytes: int = 256) -> DataFrame:
    """STUB decode: real path needs ffmpeg. Fake container = raw
    concatenation of fixed-size frames; samples every Nth frame.
    Exercises the 1→N row fan-out (UDTF-shaped mapInPandas)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = []
            for vid, raw in zip(b["video_id"], b["bytes"]):
                rb = bytes(raw)
                n_frames = len(rb) // frame_bytes
                for idx in range(0, n_frames, every_n):
                    out.append((vid, idx, rb[idx * frame_bytes:(idx + 1) * frame_bytes]))
            yield pd.DataFrame(out, columns=["video_id", "frame_idx", "frame"])

    return videos.select("video_id", "bytes").mapInPandas(run, FRAME_SAMPLE_SCHEMA)
