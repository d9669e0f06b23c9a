from __future__ import annotations

import numpy as np

from ycrawl_spark import codecs


def test_lossless_roundtrip():
    for i in range(20):
        iid = f"img_{i:08d}"
        w, h = codecs.gen_dims(iid)
        px = codecs.gen_pixels(iid, w, h)
        for fmt in ("raw", "ppm"):
            assert np.array_equal(codecs.decode(codecs.encode(px, fmt)), px)


def test_lossy_psnr_above_40():
    for i in range(20):
        iid = f"img_{i:08d}"
        w, h = codecs.gen_dims(iid)
        px = codecs.gen_pixels(iid, w, h)
        out = codecs.decode(codecs.encode(px, "lossy"))
        assert codecs.psnr(px, out) >= 40.0
        assert out.shape == (h, w, 3)


def test_row_determinism_and_schema():
    r1 = codecs.make_image_row("img_00000007")
    r2 = codecs.make_image_row("img_00000007")
    assert r1["bytes"] == r2["bytes"]
    assert r1["caption"] == r2["caption"]
    assert r1["phash"] == r2["phash"]
    assert r1["fmt"] in codecs.FORMATS
    assert isinstance(r1["phash"], int)
    px = codecs.decode(r1["bytes"])
    assert px.shape == (r1["h"], r1["w"], 3)
    # phash of decoded == stored phash (validation invariant)
    assert codecs.phash64(px) == r1["phash"]
