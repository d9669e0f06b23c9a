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
