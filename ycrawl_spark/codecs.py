"""Numpy-only image codecs for the image+caption payload table.

The graft's payload column is ``bytes:binary`` (BASELINE.json
input_hint). The reference's analog is the fetched ``.pp`` pseudo-XML
envelope (/root/reference/Worker/node_handler.js:14-19,152); its
per-vendor cooker dispatch (/root/reference/DataProcessor/main.py:87-99)
maps to per-``fmt`` codec dispatch here.

No Pillow in this container, so formats are self-defined but real:
  - ``raw``   : header + uint8 RGB pixels, lossless.
  - ``ppm``   : binary P6 PPM (a public, widely-documented format),
                lossless.
  - ``lossy`` : header + 2-bit-quantized pixels (values snapped to the
                centre of 4-wide bins). Max abs error 2 → PSNR ≈ 47 dB,
                satisfying the PSNR ≥ 40 dB invariant for lossy fmts.

All functions are plain numpy so they vectorize cleanly inside Arrow
batches (mapInPandas) — no per-row Python in the Spark hot path beyond
the per-image loop inside a batch, which is the same granularity the
Arrow batch gives us.
"""

from __future__ import annotations

import numpy as np

from .hashing import xxh64_str

MAGIC = b"YCIM"
FORMATS = ("raw", "ppm", "lossy")
_FMT_CODE = {f: i for i, f in enumerate(FORMATS)}

# Small public-domain-style word pool for deterministic captions.
_WORDS = (
    "amber brook cedar dune ember frost glade harbor iris juniper "
    "kestrel lagoon meadow nectar orchid pebble quartz reed summit "
    "thicket umber vale willow yarrow zephyr basalt cliff delta "
    "estuary fjord geyser heath inlet knoll lichen mesa nimbus oasis "
    "prairie quarry ridge savanna tundra upland vertex wharf xenon"
).split()


def rng_for(image_id: str, stream: str = "pixels") -> np.random.Generator:
    """Deterministic per-image RNG; seeded from a stable 64-bit hash."""
    return np.random.Generator(np.random.PCG64(xxh64_str(f"{image_id}/{stream}", seed=7)))


def gen_dims(image_id: str) -> tuple[int, int]:
    r = rng_for(image_id, "dims")
    # Realistic web-image decode cost matters for the throughput bench:
    # ~1 ms/image at these sizes, the same order as real JPEG decode.
    sizes = np.array([32, 64, 128, 256])
    return int(sizes[r.integers(0, 4)]), int(sizes[r.integers(0, 4)])


def gen_fmt(image_id: str) -> str:
    return FORMATS[xxh64_str(f"{image_id}/fmt", seed=11) % len(FORMATS)]


def gen_pixels(image_id: str, w: int, h: int) -> np.ndarray:
    """Ground-truth pixels, shape (h, w, 3) uint8 — pure function of id."""
    return rng_for(image_id, "pixels").integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def gen_caption(image_id: str, n_min: int = 4, n_max: int = 12) -> str:
    r = rng_for(image_id, "caption")
    n = int(r.integers(n_min, n_max + 1))
    return " ".join(_WORDS[i] for i in r.integers(0, len(_WORDS), size=n))


def phash64(pixels: np.ndarray) -> int:
    """Perceptual-hash-like 64-bit digest: 8×8 block-mean threshold bits.

    Stable under the lossy codec (bin width 4 barely moves block means),
    so phash(decode(encode(x))) == phash(x) for all fmts.

    Integer block sums instead of float means: `block_sum > mean(block
    sums)` orders identically to `block_mean > mean(block means)` (same
    positive scale factor bh·bw·3), and integer accumulation keeps the
    hot path free of float64 temporaries — this runs per fetched image,
    so memory traffic here directly caps multi-core throughput.
    """
    h, w, _ = pixels.shape
    bh, bw = h // 8, w // 8
    blocks = (
        pixels[: bh * 8, : bw * 8]
        .reshape(8, bh, 8, bw, 3)
        .sum(axis=(1, 3, 4), dtype=np.int64)
    )
    bits = (blocks > blocks.mean()).astype(np.uint64).ravel()
    val = np.uint64(0)
    for i, b in enumerate(bits):
        val |= b << np.uint64(i)
    return int(val.astype(np.int64))  # signed view → int64 parquet column


def _quantize(pixels: np.ndarray) -> np.ndarray:
    # Snap to bin centre: values {2, 6, ..., 254}; max abs error = 2.
    return ((pixels >> 2) << 2) | 2


def encode(pixels: np.ndarray, fmt: str) -> bytes:
    h, w, _ = pixels.shape
    if fmt == "ppm":
        return b"P6\n%d %d\n255\n" % (w, h) + pixels.tobytes()
    header = MAGIC + bytes([_FMT_CODE[fmt]]) + w.to_bytes(4, "little") + h.to_bytes(4, "little")
    if fmt == "raw":
        return header + pixels.tobytes()
    if fmt == "lossy":
        return header + _quantize(pixels).tobytes()
    raise ValueError(f"unknown fmt {fmt!r}")


def decode(data: bytes) -> np.ndarray:
    """Decode any supported payload → (h, w, 3) uint8."""
    if data[:2] == b"P6":
        # P6 "w h" 255 \n payload
        parts = data.split(b"\n", 3)
        w, h = (int(x) for x in parts[1].split())
        return np.frombuffer(parts[3], dtype=np.uint8).reshape(h, w, 3)
    if data[:4] != MAGIC:
        raise ValueError("bad magic")
    w = int.from_bytes(data[5:9], "little")
    h = int.from_bytes(data[9:13], "little")
    return np.frombuffer(data[13:], dtype=np.uint8).reshape(h, w, 3)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    # int16 diff + int32 squares: exact, and half the memory traffic of
    # the float64 formulation (hot path — runs per fetched image).
    d = a.astype(np.int16) - b.astype(np.int16)
    mse = np.mean(d.astype(np.int32) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0**2 / mse))


def make_image_row(image_id: str) -> dict:
    """Full deterministic image row matching the input_hint schema."""
    w, h = gen_dims(image_id)
    fmt = gen_fmt(image_id)
    pixels = gen_pixels(image_id, w, h)
    data = encode(pixels, fmt)
    return {
        "image_id": image_id,
        "bytes": data,
        "w": w,
        "h": h,
        "fmt": fmt,
        "caption": gen_caption(image_id),
        "phash": phash64(decode(data)),
    }


# ───────────────────────── audio: WAV (RIFF) ─────────────────────────
# Real container parsing — PCM WAV needs no codec library, just the
# RIFF chunk walk. Reference scope analog: the reference treats fetched
# payloads as opaque bytes handed to per-format cookers
# (/root/reference/DataProcessor/cooker.py); here the audio cooker is
# implemented for the one format that is honestly decodable with numpy.


def encode_wav(pcm: np.ndarray, sample_rate: int, n_channels: int = 1) -> bytes:
    """Minimal PCM16 WAV writer (test-fixture side of the codec)."""
    if pcm.dtype != np.int16:
        raise ValueError("pcm must be int16")
    data = pcm.tobytes()
    block_align = 2 * n_channels
    fmt = (
        b"fmt " + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little")                      # PCM
        + n_channels.to_bytes(2, "little")
        + sample_rate.to_bytes(4, "little")
        + (sample_rate * block_align).to_bytes(4, "little")
        + block_align.to_bytes(2, "little")
        + (16).to_bytes(2, "little")
    )
    body = b"WAVE" + fmt + b"data" + len(data).to_bytes(4, "little") + data
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def decode_wav(data: bytes) -> tuple[int, int, np.ndarray]:
    """RIFF/WAVE chunk walk → (sample_rate, n_channels, int16 samples
    interleaved). Handles unknown chunks (LIST, fact, …) by skipping —
    the part naive parsers get wrong. PCM16 only; anything else raises
    (a compressed WAV would need a real codec library)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, sample_rate, n_channels, bits, fmt_tag, pcm = 12, None, None, None, None, None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        size = int.from_bytes(data[pos + 4:pos + 8], "little")
        body = data[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt_tag = int.from_bytes(body[0:2], "little")
            n_channels = int.from_bytes(body[2:4], "little")
            sample_rate = int.from_bytes(body[4:8], "little")
            bits = int.from_bytes(body[14:16], "little")
        elif cid == b"data":
            pcm = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt_tag is None or pcm is None:
        raise ValueError("missing fmt/data chunk")
    if fmt_tag != 1 or bits != 16:
        raise ValueError(f"unsupported WAV (fmt={fmt_tag}, bits={bits}): PCM16 only")
    samples = np.frombuffer(pcm[: len(pcm) // 2 * 2], dtype="<i2")
    return sample_rate, n_channels, samples


# ──────────────────── video: Y4M (YUV4MPEG2) ────────────────────────
# YUV4MPEG2 is the uncompressed interchange format ffmpeg itself uses
# for piping — a text header plus raw planar frames, fully decodable
# with numpy.

_Y4M_PLANE_FACTOR = {"C420": 1.5, "C420jpeg": 1.5, "C420paldv": 1.5,
                     "C422": 2.0, "C444": 3.0}


def encode_y4m(frames: list[np.ndarray], fps: tuple[int, int] = (25, 1),
               colorspace: str = "C444") -> bytes:
    """Y4M writer for test fixtures; frames are (h, w, 3) uint8 YUV
    (C444) or flat planes matching the colorspace factor."""
    f0 = frames[0]
    h, w = f0.shape[:2]
    head = f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 {colorspace}\n"
    out = [head.encode()]
    for f in frames:
        out.append(b"FRAME\n")
        out.append(f.transpose(2, 0, 1).tobytes() if f.ndim == 3 else f.tobytes())
    return b"".join(out)


def decode_y4m(data: bytes) -> tuple[int, int, str, list[bytes]]:
    """Parse YUV4MPEG2 → (w, h, colorspace, raw frame payloads).

    Walks the real stream structure: parameter header line, then
    FRAME markers (each may carry its own parameters up to the
    newline) followed by exactly plane_factor·w·h bytes."""
    nl = data.index(b"\n")
    head = data[:nl].decode("ascii", "replace").split(" ")
    if head[0] != "YUV4MPEG2":
        raise ValueError("not a YUV4MPEG2 stream")
    w = h = None
    cs = "C420"
    for tok in head[1:]:
        if tok.startswith("W"):
            w = int(tok[1:])
        elif tok.startswith("H"):
            h = int(tok[1:])
        elif tok.startswith("C"):
            cs = tok
    if not w or not h:
        raise ValueError("Y4M header missing W/H")
    factor = _Y4M_PLANE_FACTOR.get(cs, 1.5)
    if factor != int(factor) and (w % 2 or h % 2):
        # 4:2:0/4:1:1 subsample half-resolution chroma planes; odd
        # dimensions would make int(1.5*w*h) mis-size every frame.
        raise ValueError(f"{cs} requires even dimensions, got {w}x{h}")
    frame_bytes = int(factor * w * h)
    frames, pos = [], nl + 1
    while pos < len(data):
        if data[pos:pos + 5] != b"FRAME":
            raise ValueError(f"bad FRAME marker at {pos}")
        fnl = data.index(b"\n", pos)
        if len(data) - (fnl + 1) < frame_bytes:
            raise ValueError(
                f"truncated Y4M stream: frame at {pos} has "
                f"{len(data) - fnl - 1} of {frame_bytes} bytes")
        frames.append(data[fnl + 1:fnl + 1 + frame_bytes])
        pos = fnl + 1 + frame_bytes
    return w, h, cs, frames
