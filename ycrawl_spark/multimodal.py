"""Multimodal column plumbing: image/audio/video as opaque binary +
typed metadata, processed by Arrow-batched mapInPandas.

The image codec path is REAL (ycrawl_spark.codecs, numpy). Audio and
video are real for the uncompressed container formats that are
honestly decodable without codec libraries: PCM WAV (RIFF chunk walk)
and YUV4MPEG2 (the raw interchange format ffmpeg pipes) — see
codecs.decode_wav / decode_y4m. Compressed formats (mp3/aac, h264/vp9)
would need libs this container doesn't ship; payloads that aren't a
known container fall back to the documented deterministic raw
interpretation (bytes = int16 PCM / fixed-size frame concatenation),
so the Spark-side plumbing is exercised either way.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

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

FRAME_SAMPLE_SCHEMA = (
    "video_id string, frame_idx int, frame binary, w int, h int, "
    "colorspace string"
)


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


PATCH_SCHEMA = (
    "image_id string, py int, px int, patch_h int, patch_w int, "
    "mean double, std double, code int"
)


def image_patches(images: DataFrame, grid: int = 8) -> DataFrame:
    """ViT-style fixed-grid patchify: decode → split each image into a
    ``grid × grid`` patch grid (patch size h//grid × w//grid, trailing
    remainder pixels dropped — the standard crop-to-multiple) → one
    output row per patch with grayscale mean/std and a 4-bit intensity
    code (mean // 16) — the tokenization step an image-training
    pipeline runs before embedding. Arrow-batched mapInPandas over the
    binary column; the whole grid of one image is produced by one
    vectorized reshape, never a per-patch Python loop. Scale: output is
    a grid²-fold row explosion of the image table — partition count is
    inherited from the input scan, so repartition upstream by
    image_id when feeding a shuffle-heavy consumer."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = []
            for iid, raw in zip(b["image_id"], b["bytes"]):
                px = codecs.decode(bytes(raw)).astype(np.float64)
                gray = px.mean(axis=2)
                h, w = gray.shape
                ph, pw = max(h // grid, 1), max(w // grid, 1)
                g = gray[: ph * grid, : pw * grid].reshape(grid, ph, grid, pw)
                means = g.mean(axis=(1, 3))
                stds = g.std(axis=(1, 3))
                for py in range(grid):
                    for qx in range(grid):
                        m = float(means[py, qx])
                        out.append((iid, py, qx, ph, pw, round(m, 4),
                                    round(float(stds[py, qx]), 4),
                                    int(m) // 16))
            yield pd.DataFrame(
                out, columns=["image_id", "py", "px", "patch_h", "patch_w",
                              "mean", "std", "code"]
            )

    return images.select("image_id", "bytes").mapInPandas(run, PATCH_SCHEMA)


HIST_SCHEMA = "image_id string, bin int, n_px long"


def image_gray_histogram(images: DataFrame, bins: int = 16) -> DataFrame:
    """Per-image grayscale intensity histogram: decode → floor gray
    mean to ``bins`` equal buckets (256//bins wide) → one row per
    non-empty bin. The whole histogram of one image is a single
    vectorized ``np.bincount`` — never a per-pixel Python loop. The
    corpus-level rollup over these rows drives exposure QC (near-flat
    images — one bin holding ~all pixels — are decode errors, blank
    pages, or tracking pixels that slipped the dimension gate).
    Arrow-batched mapInPandas over the binary column, output ≤ bins
    rows per image."""
    width = 256 // bins

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = []
            for iid, raw in zip(b["image_id"], b["bytes"]):
                px = codecs.decode(bytes(raw)).astype(np.float64)
                gray = np.clip(px.mean(axis=2), 0, 255).astype(np.int64)
                counts = np.bincount(
                    np.minimum(gray // width, bins - 1).ravel(),
                    minlength=bins)
                for i in np.nonzero(counts)[0]:
                    out.append((iid, int(i), int(counts[i])))
            yield pd.DataFrame(out, columns=["image_id", "bin", "n_px"])

    return images.select("image_id", "bytes").mapInPandas(run, HIST_SCHEMA)


TILE_PHASH_SCHEMA = "image_id string, ty int, tx int, tile_phash long"


def image_tile_phash(images: DataFrame, grid: int = 2) -> DataFrame:
    """Per-tile perceptual hashes: decode → split into a ``grid×grid``
    tile grid (trailing remainder pixels dropped, same crop rule as
    ``image_patches``) → one 64-bit phash PER TILE. This is the
    region-level dedup sketch: a cropped / watermarked / one-corner-
    edited variant still shares the *untouched* tiles' exact hashes,
    which whole-image phash misses (one edited region perturbs the
    global DCT). Arrow-batched mapInPandas; the tile loop is over
    grid² views of one decoded array, never a Python pixel loop.
    Output is a grid²-fold row fan-out of the image table — at 10^10
    images the downstream tile-hash equi-join is the only shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = []
            for iid, raw in zip(b["image_id"], b["bytes"]):
                px = codecs.decode(bytes(raw))
                h, w, _ = px.shape
                th, tw = max(h // grid, 1), max(w // grid, 1)
                for ty in range(grid):
                    for tx in range(grid):
                        tile = px[ty * th:(ty + 1) * th, tx * tw:(tx + 1) * tw]
                        out.append((iid, ty, tx, int(codecs.phash64(tile))))
            yield pd.DataFrame(
                out, columns=["image_id", "ty", "tx", "tile_phash"])

    return images.select("image_id", "bytes").mapInPandas(
        run, TILE_PHASH_SCHEMA)


SHARPNESS_SCHEMA = (
    "image_id string, w int, h int, lap_var double, gray_std double"
)


def image_sharpness(images: DataFrame) -> DataFrame:
    """Variance-of-Laplacian focus measure — the standard blur filter a
    vision-training pipeline runs on crawled images (LAION-style QC):
    defocused/resampled images have near-zero high-frequency energy, so
    the variance of the 4-neighbour Laplacian response separates them
    from in-focus content by orders of magnitude. Decode → grayscale
    (channel mean, float64) → Laplacian on the interior
    ``4·g − up − down − left − right`` → population variance, plus the
    plain grayscale std as the flat-image control (a blurry photo keeps
    its global contrast; a blank page loses both). Whole-image numpy
    slice arithmetic — no per-pixel Python. One Arrow-batched
    mapInPandas pass, scan-shaped at any corpus size; the corpus-level
    threshold rollup lives in the `image_blur_audit` query."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = []
            for iid, raw in zip(b["image_id"], b["bytes"]):
                px = codecs.decode(bytes(raw))
                h, w, _ = px.shape
                g = px.astype(np.float64).mean(axis=2)
                if h < 3 or w < 3:  # no interior → no measurable response
                    out.append((iid, w, h, 0.0, round(float(g.std()), 4)))
                    continue
                lap = (4.0 * g[1:-1, 1:-1] - g[:-2, 1:-1] - g[2:, 1:-1]
                       - g[1:-1, :-2] - g[1:-1, 2:])
                out.append((iid, w, h, round(float(lap.var()), 4),
                            round(float(g.std()), 4)))
            yield pd.DataFrame(
                out, columns=["image_id", "w", "h", "lap_var", "gray_std"])

    return images.select("image_id", "bytes").mapInPandas(
        run, SHARPNESS_SCHEMA)


BORDER_CROP_SCHEMA = (
    "image_id string, w int, h int, y0 int, y1 int, x0 int, x1 int, "
    "border_permille int"
)


def image_border_crop(images: DataFrame) -> DataFrame:
    """Letterbox/pillarbox detection — the preprocessing step a training
    pipeline runs BEFORE patchify/resize, because a black frame around
    a photo poisons aspect-bucket assignment, patch statistics, and
    phash alike. Decode, then count maximal runs of bit-uniform rows
    from the top/bottom and bit-uniform columns from the left/right
    (a row is border iff every pixel equals its first pixel — content
    is photographic noise, so a false uniform row has ~0 probability;
    the synthetic codecs keep constant borders exactly uniform through
    lossy round trips). Output is the content crop box [y0,y1)×[x0,x1)
    plus the border mass in integer permille; a fully-uniform image
    (no content) reports the full frame as the box with
    border_permille=1000 rather than a degenerate empty crop. All
    numpy axis reductions per image — no per-pixel Python. One
    Arrow-batched mapInPandas pass; scan-shaped at any corpus size."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = []
            for iid, raw in zip(b["image_id"], b["bytes"]):
                px = codecs.decode(bytes(raw))
                h, w, _ = px.shape
                rows_u = (px == px[:, :1, :]).all(axis=(1, 2))
                cols_u = (px == px[:1, :, :]).all(axis=(0, 2))
                if rows_u.all() or cols_u.all():
                    out.append((iid, w, h, 0, h, 0, w, 1000))
                    continue
                y0 = int(np.argmin(rows_u))
                y1 = h - int(np.argmin(rows_u[::-1]))
                x0 = int(np.argmin(cols_u))
                x1 = w - int(np.argmin(cols_u[::-1]))
                content = (y1 - y0) * (x1 - x0)
                out.append((iid, w, h, y0, y1, x0, x1,
                            (1000 * (w * h - content)) // (w * h)))
            yield pd.DataFrame(
                out, columns=["image_id", "w", "h", "y0", "y1", "x0", "x1",
                              "border_permille"])

    return images.select("image_id", "bytes").mapInPandas(
        run, BORDER_CROP_SCHEMA)


AUDIO_FEATURES_SCHEMA = (
    "clip_id string, n_samples long, rms double, sample_rate int, "
    "n_channels int, duration_s double, container string"
)


def audio_features(audio: DataFrame) -> DataFrame:
    """Audio decode + features. REAL path: PCM WAV via the RIFF chunk
    walk (codecs.decode_wav) — rate/channels come from the container,
    duration from the sample count. Non-WAV payloads fall back to the
    raw-int16-PCM interpretation with the caller-supplied
    ``sample_rate`` (compressed formats would need codec libs this
    container doesn't ship).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = []
            for cid, raw, in_rate in zip(b["clip_id"], b["bytes"], b["sample_rate"]):
                rb = bytes(raw)
                if rb[:4] == b"RIFF":
                    rate, ch, pcm = codecs.decode_wav(rb)
                    container = "wav"
                else:
                    rate, ch = int(in_rate), 1
                    pcm = np.frombuffer(rb[: len(rb) // 2 * 2], dtype=np.int16)
                    container = "raw"
                if pcm.size == 0:
                    out.append((cid, 0, 0.0, rate, ch, 0.0, container))
                    continue
                rms = round(float(np.sqrt(np.mean(pcm.astype(np.float64) ** 2))), 4)
                n_frames = pcm.size // ch
                out.append((cid, int(pcm.size), rms, rate, ch,
                            round(n_frames / rate, 4) if rate else 0.0, container))
            yield pd.DataFrame(
                out, columns=["clip_id", "n_samples", "rms", "sample_rate",
                              "n_channels", "duration_s", "container"])

    return audio.select("clip_id", "bytes", "sample_rate").mapInPandas(
        run, AUDIO_FEATURES_SCHEMA
    )


def video_frame_sample(videos: DataFrame, every_n: int = 4,
                       frame_bytes: int = 256) -> DataFrame:
    """Frame sampling (1→N row fan-out, UDTF-shaped mapInPandas).
    REAL path: YUV4MPEG2 container (codecs.decode_y4m) — header gives
    dims/colorspace, frames are exact plane payloads. Non-Y4M payloads
    fall back to fixed-``frame_bytes`` chunking (compressed codecs —
    h264 etc. — would need ffmpeg). Sampling keeps every
    ``every_n``-th frame: at corpus scale this bounds the fan-out, and
    the frame bytes stay inside the Arrow batch (never driver-side)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = []
            for vid, raw in zip(b["video_id"], b["bytes"]):
                rb = bytes(raw)
                if rb[:9] == b"YUV4MPEG2":
                    w, h, cs, frames = codecs.decode_y4m(rb)
                    for idx in range(0, len(frames), every_n):
                        out.append((vid, idx, frames[idx], w, h, cs))
                    continue
                n_frames = len(rb) // frame_bytes
                for idx in range(0, n_frames, every_n):
                    out.append((vid, idx,
                                rb[idx * frame_bytes:(idx + 1) * frame_bytes],
                                None, None, "raw"))
            yield pd.DataFrame(
                out, columns=["video_id", "frame_idx", "frame", "w", "h",
                              "colorspace"])

    return videos.select("video_id", "bytes").mapInPandas(run, FRAME_SAMPLE_SCHEMA)


INTEGRITY_SCHEMA = (
    "image_id string, decode_ok boolean, dim_mismatch boolean, "
    "phash_mismatch boolean, phash_hamming int"
)


def integrity_audit(images: DataFrame) -> DataFrame:
    """Payload-integrity audit over the input_hint image table
    (image_id, bytes, w, h, phash): re-decode every payload and
    cross-check the DECLARED metadata against what the bytes actually
    contain — the data-quality gate a crawl corpus needs before
    training (bit-rot, truncated uploads, metadata lies, re-encoded
    swaps all surface here, not at training time).

    Per row: decode_ok (payload parses at all), dim_mismatch (decoded
    w×h vs declared), phash_mismatch + hamming distance (recomputed
    perceptual hash vs stored — hamming 0 means intact, small values
    mean re-encode/minor corruption, large values mean wrong image).
    Arrow-batched mapInPandas, no per-row Python UDF; a decode failure
    flags the row instead of failing the stage."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for iid, raw, w, h, ph in zip(
                b["image_id"], b["bytes"], b["w"], b["h"], b["phash"]
            ):
                try:
                    px = codecs.decode(bytes(raw))
                except Exception:
                    rows.append((iid, False, None, None, None))
                    continue
                ah, aw, _ = px.shape
                actual = int(codecs.phash64(px))
                ham = bin((actual ^ int(ph)) & ((1 << 64) - 1)).count("1")
                rows.append(
                    (iid, True, (aw, ah) != (int(w), int(h)),
                     actual != int(ph), ham)
                )
            yield pd.DataFrame(
                rows,
                columns=["image_id", "decode_ok", "dim_mismatch",
                         "phash_mismatch", "phash_hamming"],
            )

    return images.select("image_id", "bytes", "w", "h", "phash").mapInPandas(
        run, INTEGRITY_SCHEMA
    )


FRAME_PHASH_SCHEMA = "frame_key string, video_id string, frame_idx int, phash long"


def video_frame_phash(videos: DataFrame, every_n: int = 1) -> DataFrame:
    """Per-frame perceptual hashes over sampled video frames: the
    keyframe-dedup front end (static scenes, duplicated clips, shared
    intros all collapse to tiny-hamming phash pairs). Real path is the
    C444 Y4M planar payload reshaped back to (h, w, 3); non-planar
    payloads are skipped (a compressed codec would land here)."""

    frames = video_frame_sample(videos, every_n=every_n)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = []
            for vid, idx, raw, w, h, cs in zip(
                b["video_id"], b["frame_idx"], b["frame"],
                b["w"], b["h"], b["colorspace"],
            ):
                if cs != "C444" or w is None:
                    continue
                w, h = int(w), int(h)
                px = np.frombuffer(bytes(raw), dtype=np.uint8)
                if px.size != 3 * w * h:
                    continue
                px = px.reshape(3, h, w).transpose(1, 2, 0)
                out.append((f"{vid}:{int(idx)}", vid, int(idx),
                            int(codecs.phash64(px))))
            yield pd.DataFrame(
                out, columns=["frame_key", "video_id", "frame_idx", "phash"])

    return frames.mapInPandas(run, FRAME_PHASH_SCHEMA)


def video_scene_cuts(videos: DataFrame, max_intra_hamming: int = 8,
                     every_n: int = 1) -> DataFrame:
    """Scene-cut detection over decoded video: per-frame perceptual
    hash (the same Arrow decode path as the keyframe dedup), then a
    per-video ordered window comparing each frame's hash with its
    predecessor — hamming above ``max_intra_hamming`` marks a cut.
    The window partitions by video_id, never globally, so at corpus
    scale the only shuffle is one hash-partition by video; one clip's
    frames land on one task, bounded by clip length (and further by
    ``every_n`` sampling). The first frame of a clip is by definition
    not a cut. Downstream: cuts segment clips for per-scene dedup,
    thumbnail picks, and training-clip boundaries."""
    ph = video_frame_phash(videos, every_n=every_n)
    w = Window.partitionBy("video_id").orderBy("frame_idx")
    prev = F.lag("phash").over(w)
    ham = F.bit_count(F.col("phash").bitwiseXOR(prev))
    return ph.select(
        "video_id", "frame_idx",
        ham.cast("int").alias("hamming_prev"),
        F.coalesce(ham > max_intra_hamming, F.lit(False)).alias("is_cut"),
    )


AUDIO_ENERGY_SCHEMA = (
    "clip_id string, win_idx int, n_in_win long, energy long, peak int"
)


def audio_energy_windows(audio: DataFrame, win: int = 1024) -> DataFrame:
    """Windowed integer energy over decoded PCM — the VAD front end:
    per fixed window of ``win`` samples, energy = (Σ x²) div n (exact
    int64: 16-bit samples squared summed over any practical window
    cannot overflow) plus the absolute peak. Real WAV via the RIFF
    chunk walk, raw-int16 fallback — the same container contract as
    ``audio_features``. Fan-out is 1 → n_windows rows with samples
    never leaving the Arrow batch; the activity THRESHOLD stays a
    JVM-side filter in the caller, so one decode pass serves any
    threshold sweep."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = []
            for cid, raw in zip(b["clip_id"], b["bytes"]):
                rb = bytes(raw)
                if rb[:4] == b"RIFF":
                    _rate, _ch, pcm = codecs.decode_wav(rb)
                else:
                    pcm = np.frombuffer(rb[: len(rb) // 2 * 2], dtype=np.int16)
                for i in range(0, pcm.size, win):
                    seg = pcm[i:i + win].astype(np.int64)
                    out.append((cid, i // win, int(seg.size),
                                int((seg * seg).sum() // seg.size),
                                int(np.abs(seg).max())))
            yield pd.DataFrame(
                out, columns=["clip_id", "win_idx", "n_in_win", "energy",
                              "peak"])

    return audio.select("clip_id", "bytes").mapInPandas(
        run, AUDIO_ENERGY_SCHEMA
    )


CHROMA_SCHEMA = ("image_id string, n_px long, sum_abs_rg long, "
                 "sum_sq_rg long, sum_abs_yb2 long, sum_sq_yb2 long")


def image_chroma_stats(images: DataFrame) -> DataFrame:
    """Per-image opponent-axis chroma moments — the integer-exact core
    of a Hasler-Süsstrunk colorfulness gate (the standard "is this a
    gray scan / tinted error page?" QC next to exposure and blur):
    decode → per-pixel ``rg = R − G`` and ``yb2 = R + G − 2B`` (the
    yellow-blue axis cross-multiplied by 2 so it stays integral) →
    Σ|rg|, Σrg², Σ|yb2|, Σyb2² as int64 (worst case 255²·2²·n_px ≪
    2⁶³ for any real image).  The float H-S score is a monotone
    function of these moments, so thresholding downstream is a pure
    JVM expression; keeping the moments integral is what lets a SQL
    oracle replicate the whole decode path bit-exact
    (``image_chroma_ramp_audit``).  One vectorized numpy pass per
    image inside an Arrow batch — no per-pixel Python; output is one
    row per image at any corpus size."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = []
            for iid, raw in zip(b["image_id"], b["bytes"]):
                px = codecs.decode(bytes(raw)).astype(np.int64)
                r, g, bl = px[:, :, 0], px[:, :, 1], px[:, :, 2]
                rg = r - g
                yb2 = r + g - 2 * bl
                out.append((iid, int(rg.size),
                            int(np.abs(rg).sum()), int((rg * rg).sum()),
                            int(np.abs(yb2).sum()), int((yb2 * yb2).sum())))
            yield pd.DataFrame(
                out, columns=["image_id", "n_px", "sum_abs_rg",
                              "sum_sq_rg", "sum_abs_yb2", "sum_sq_yb2"])

    return images.select("image_id", "bytes").mapInPandas(
        run, CHROMA_SCHEMA)
