"""Multimodal plumbing: binary columns + Arrow-batched decode UDFs.
Image path is real (numpy codecs); audio/video decode is stubbed with
deterministic fakes but the Spark plumbing (schema, batch shape, 1→N
fan-out) is exercised for real."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from ycrawl_spark import codecs, multimodal


def _images_df(spark, n=20):
    rows = [codecs.make_image_row(f"img{i:05d}") for i in range(n)]
    return spark.createDataFrame(
        rows,
        "image_id string, bytes binary, w int, h int, fmt string, "
        "caption string, phash long",
    )


def test_image_features_match_metadata(spark):
    imgs = _images_df(spark)
    feats = multimodal.image_features(imgs)
    j = feats.alias("f").join(imgs.alias("i"), "image_id")
    bad = j.filter(
        (F.col("f.w") != F.col("i.w")) | (F.col("f.h") != F.col("i.h"))
        | (F.col("f.fmt") != F.col("i.fmt")) | (F.col("f.phash") != F.col("i.phash"))
    )
    assert bad.count() == 0
    # channel means are valid pixel stats
    r = feats.agg(F.min("mean_r"), F.max("mean_r")).first()
    assert 0.0 <= r[0] <= r[1] <= 255.0


def test_image_resize_thumb_shape(spark):
    imgs = _images_df(spark, n=5)
    thumbs = multimodal.image_resize(imgs, tw=8, th=8).collect()
    assert len(thumbs) == 5
    for t in thumbs:
        arr = np.frombuffer(bytes(t["thumb"]), dtype=np.uint8)
        assert arr.size == 8 * 8 * 3


def test_audio_features_rms(spark):
    pcm = np.array([3, -4, 3, -4], dtype=np.int16)  # rms = 3.5355
    df = spark.createDataFrame(
        [("c1", bytearray(pcm.tobytes()), 16000), ("c2", bytearray(b""), 16000)],
        "clip_id string, bytes binary, sample_rate int",
    )
    got = {r["clip_id"]: r for r in multimodal.audio_features(df).collect()}
    assert got["c1"]["n_samples"] == 4
    assert abs(got["c1"]["rms"] - 3.5355) < 1e-3
    assert got["c2"]["n_samples"] == 0


def test_video_frame_sample_fanout(spark):
    frame_bytes = 16
    video = bytes(range(256)) * 1  # 256 bytes → 16 frames of 16 bytes
    df = spark.createDataFrame(
        [("v1", bytearray(video))], "video_id string, bytes binary"
    )
    frames = multimodal.video_frame_sample(df, every_n=4,
                                           frame_bytes=frame_bytes).collect()
    # 16 frames sampled every 4th → indices 0,4,8,12
    assert sorted(r["frame_idx"] for r in frames) == [0, 4, 8, 12]
    f0 = [r for r in frames if r["frame_idx"] == 0][0]
    assert bytes(f0["frame"]) == video[:frame_bytes]
