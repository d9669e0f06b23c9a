"""Multimodal plumbing: binary columns + Arrow-batched decode UDFs.
Image path is real (numpy codecs); audio/video decode is stubbed with
deterministic fakes but the Spark plumbing (schema, batch shape, 1→N
fan-out) is exercised for real."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from ycrawl_spark import codecs, multimodal, synth


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


def test_image_phash_near_dups_exact_vs_bruteforce(spark):
    """Distributed phash block-LSH pair join == brute-force all-pairs
    hamming on identical inputs, and the planted near-dups are found."""
    import itertools

    from ycrawl_spark import synth, textops
    from ycrawl_spark.config import CrawlConfig

    cfg = CrawlConfig(n_urls=120, n_hosts=4)
    dup_every = 4
    feats = multimodal.image_features(
        synth.near_dup_images_df(spark, cfg, dup_every=dup_every)
    )
    sketch = feats.select(F.col("image_id").alias("doc_id"), "phash")
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in textops.simhash_near_dups_from_sketch(
            sketch, max_hamming=6, sketch_col="phash"
        ).collect()
    }

    rows = [synth.make_near_dup_image_row(i, dup_every) for i in range(cfg.n_urls)]
    mask = (1 << 64) - 1
    expect = set()
    for a, b in itertools.combinations(rows, 2):
        hm = bin((a["phash"] ^ b["phash"]) & mask).count("1")
        if hm <= 6:
            lo, hi = sorted((a["image_id"], b["image_id"]))
            expect.add((lo, hi, hm))
    assert got == expect

    planted = {
        tuple(sorted((r["dup_of"], r["image_id"]))) for r in rows if r["dup_of"]
    }
    found = {(a, b) for a, b, _ in got}
    assert len(planted) >= 25
    assert len(planted & found) >= 0.8 * len(planted)


def test_audio_features_real_wav(spark):
    """Real RIFF/WAVE parsing: rate+channels come from the container
    (not the caller), samples round-trip exactly, and an interposed
    unknown chunk (LIST) is skipped like real-world WAVs require."""
    pcm = (np.sin(np.linspace(0, 50, 3200)) * 12000).astype(np.int16)
    wav = codecs.encode_wav(pcm, sample_rate=8000, n_channels=2)
    # splice a LIST chunk between fmt and data
    fmt_end = wav.index(b"data")
    chunk = b"LIST" + (6).to_bytes(4, "little") + b"INFOab"
    wav_with_list = wav[:fmt_end] + chunk + wav[fmt_end:]
    df = spark.createDataFrame(
        [("wav1", bytearray(wav_with_list), 999)],  # 999 must be ignored
        "clip_id string, bytes binary, sample_rate int",
    )
    r = multimodal.audio_features(df).first()
    assert r["container"] == "wav"
    assert r["sample_rate"] == 8000 and r["n_channels"] == 2
    assert r["n_samples"] == 3200
    assert r["duration_s"] == round(1600 / 8000, 4)
    expect_rms = round(float(np.sqrt(np.mean(pcm.astype(np.float64) ** 2))), 4)
    assert r["rms"] == expect_rms


def test_video_frame_sample_real_y4m(spark):
    """Real YUV4MPEG2 parsing: dims/colorspace from the header, frame
    payloads byte-exact, every_n sampling on true frame boundaries."""
    rng = np.random.default_rng(7)
    frames = [rng.integers(0, 256, (8, 6, 3), dtype=np.uint8) for _ in range(10)]
    y4m = codecs.encode_y4m(frames, colorspace="C444")
    df = spark.createDataFrame(
        [("v1", bytearray(y4m))], "video_id string, bytes binary"
    )
    got = {r["frame_idx"]: r for r in
           multimodal.video_frame_sample(df, every_n=3).collect()}
    assert sorted(got) == [0, 3, 6, 9]
    assert all(r["w"] == 6 and r["h"] == 8 and r["colorspace"] == "C444"
               for r in got.values())
    assert bytes(got[6]["frame"]) == frames[6].transpose(2, 0, 1).tobytes()


def test_image_dedup_clusters_match_union_find(spark):
    """The full image-dedup chain (phash pairs → connected components
    → keep representatives) must keep exactly the ids a driver-side
    union-find over the brute-force pair set would keep."""
    import itertools

    from ycrawl_spark import graph, synth, textops
    from ycrawl_spark.config import CrawlConfig

    cfg = CrawlConfig(n_urls=120, n_hosts=4)
    feats = multimodal.image_features(
        synth.near_dup_images_df(spark, cfg, dup_every=4)
    )
    sketch = feats.select(F.col("image_id").alias("doc_id"), "phash")
    pairs = textops.simhash_near_dups_from_sketch(
        sketch, max_hamming=6, sketch_col="phash"
    )
    comp = graph.connected_components(
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    )
    kept = sorted(
        r["doc_id"]
        for r in graph.dedup_keep_representatives(
            sketch.select("doc_id"), comp
        ).collect()
    )

    rows = [synth.make_near_dup_image_row(i, 4) for i in range(cfg.n_urls)]
    mask = (1 << 64) - 1
    parent = {r["image_id"]: r["image_id"] for r in rows}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in itertools.combinations(rows, 2):
        if bin((a["phash"] ^ b["phash"]) & mask).count("1") <= 6:
            parent[find(a["image_id"])] = find(b["image_id"])
    clusters = {}
    for r in rows:
        clusters.setdefault(find(r["image_id"]), []).append(r["image_id"])
    expect = sorted(min(members) for members in clusters.values())
    assert kept == expect


def test_integrity_audit_flags_exactly_planted_faults(spark):
    """integrity_audit over corrupted_images_df: the flagged id set
    equals the planted ground truth; metadata lies are detected as a
    1-bit phash mismatch with intact decode + dims; clean rows show
    hamming 0 and no flags."""
    from ycrawl_spark import multimodal, synth
    from ycrawl_spark.config import CrawlConfig

    cfg = CrawlConfig(n_urls=300, n_hosts=8)
    imgs = synth.corrupted_images_df(spark, cfg)
    truth = {r["image_id"]: r["fault"] for r in
             imgs.select("image_id", "fault").collect()}
    audit = {r["image_id"]: r for r in
             multimodal.integrity_audit(imgs).collect()}
    assert set(audit) == set(truth)
    flagged = {
        iid for iid, r in audit.items()
        if (not r["decode_ok"]) or r["dim_mismatch"] or r["phash_mismatch"]
    }
    assert flagged == {iid for iid, f in truth.items() if f}
    assert flagged  # non-vacuous
    for iid, r in audit.items():
        if truth[iid] == "lie":
            assert r["decode_ok"] and not r["dim_mismatch"]
            assert r["phash_mismatch"] and r["phash_hamming"] == 1
        elif truth[iid] == "":
            assert r["decode_ok"] and r["phash_hamming"] == 0
            assert not r["dim_mismatch"] and not r["phash_mismatch"]


def test_video_frame_dedup_matches_bruteforce(spark):
    """Frame-level video dedup: the distributed pipeline (Y4M decode →
    frame phash → block-LSH → exact hamming) returns EXACTLY the
    brute-force all-pairs hamming≤2 set computed from the ground-truth
    scene hashes — static in-video runs and the planted cross-video
    shared intro both collapse, distinct scenes never pair."""
    from ycrawl_spark import codecs, multimodal, synth, textops
    from ycrawl_spark.config import CrawlConfig

    cfg = CrawlConfig(n_urls=400, n_hosts=8)
    n_videos, w, h = 16, 32, 24
    sketch = multimodal.video_frame_phash(
        synth.videos_df(spark, cfg, n_videos=n_videos, w=w, h=h)
    ).select(F.col("frame_key").alias("doc_id"), "phash")
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in textops.simhash_near_dups_from_sketch(
            sketch, max_hamming=2, sketch_col="phash",
            bucket_cap=10_000).collect()
    }
    # ground truth straight from the shared pure functions
    frames = []
    for v in range(n_videos):
        for idx, sid in enumerate(synth.video_scene_plan(v)):
            ph = codecs.phash64(codecs.gen_pixels(sid, w, h))
            frames.append((f"vid_{v:06d}:{idx}", ph, sid))
    expect = set()
    for i in range(len(frames)):
        for j in range(i + 1, len(frames)):
            a, b = frames[i], frames[j]
            ham = bin((a[1] ^ b[1]) & ((1 << 64) - 1)).count("1")
            if ham <= 2:
                ka, kb = sorted((a[0], b[0]))
                expect.add((ka, kb, ham))
    assert got == expect
    same_scene = {(min(a[0], b[0]), max(a[0], b[0]))
                  for i, a in enumerate(frames) for b in frames[i + 1:]
                  if a[2] == b[2]}
    assert same_scene <= {(a, b) for a, b, _ in got}  # every planted dup found
    cross_video = [p for p in got if p[0].split(":")[0] != p[1].split(":")[0]]
    assert cross_video  # the shared-intro clips pair across videos


def test_image_patches_match_numpy_ground_truth(spark):
    """Every patch row of image_patches equals the straight-numpy
    patchify of the decoded payload: same crop-to-multiple grid, same
    mean/std (4-dp), same 4-bit code — and exactly grid² rows/image."""
    imgs = _images_df(spark, n=6)
    grid = 8
    got = {
        (r["image_id"], r["py"], r["px"]):
            (r["patch_h"], r["patch_w"], r["mean"], r["std"], r["code"])
        for r in multimodal.image_patches(imgs, grid=grid).collect()
    }
    rows = [codecs.make_image_row(f"img{i:05d}") for i in range(6)]
    assert len(got) == grid * grid * len(rows)
    for row in rows:
        gray = codecs.decode(row["bytes"]).astype(np.float64).mean(axis=2)
        h, w = gray.shape
        ph, pw = max(h // grid, 1), max(w // grid, 1)
        g = gray[: ph * grid, : pw * grid].reshape(grid, ph, grid, pw)
        means, stds = g.mean(axis=(1, 3)), g.std(axis=(1, 3))
        for py in range(grid):
            for px in range(grid):
                m = float(means[py, px])
                assert got[(row["image_id"], py, px)] == (
                    ph, pw, round(m, 4), round(float(stds[py, px]), 4),
                    int(m) // 16,
                )


def test_video_scene_cuts_match_plan(spark):
    """Every scene boundary of the planted plan (plan[i] != plan[i-1])
    is flagged as a cut and nothing else; first frames are never cuts;
    intra-scene hamming is 0 (identical frames)."""
    from ycrawl_spark.config import CrawlConfig

    cfg = CrawlConfig(n_urls=100, n_hosts=4)
    vids = synth.videos_df(spark, cfg, n_videos=12)
    got = {(r["video_id"], r["frame_idx"]): (r["hamming_prev"], r["is_cut"])
           for r in multimodal.video_scene_cuts(vids, max_intra_hamming=8)
           .collect()}
    expect_cuts = set()
    n_frames = 0
    for v in range(12):
        plan = synth.video_scene_plan(v)
        n_frames += len(plan)
        for i in range(1, len(plan)):
            if plan[i] != plan[i - 1]:
                expect_cuts.add((f"vid_{v:06d}", i))
    assert len(got) == n_frames
    assert {k for k, (_, cut) in got.items() if cut} == expect_cuts
    for (vid, idx), (ham, cut) in got.items():
        if idx == 0:
            assert ham is None and not cut
        elif not cut:
            assert ham == 0  # identical frames within a scene run


def test_audio_energy_windows_exact(spark):
    """Window energies equal the planted square-wave amp² exactly
    (integer, no tolerance), peaks equal amp, silence windows are 0,
    and the window count matches the segment plan."""
    from ycrawl_spark.config import CrawlConfig

    cfg = CrawlConfig(n_urls=100, n_hosts=4)
    clips = synth.audio_df(spark, cfg, n_clips=10, seg_samples=1024)
    got = {(r["clip_id"], r["win_idx"]): (r["n_in_win"], r["energy"], r["peak"])
           for r in multimodal.audio_energy_windows(clips, win=1024).collect()}
    n_expected = 0
    for c in range(10):
        amps = synth.audio_segment_plan(c)
        n_expected += len(amps)
        for w, amp in enumerate(amps):
            assert got[(f"clip_{c:06d}", w)] == (1024, amp * amp, amp)
    assert len(got) == n_expected


def test_image_tile_dedup_matches_bruteforce(spark):
    """Distributed tile-phash dedup (decode -> 2x2 tile grid -> per-tile
    phash -> bucket_pairs on exact tile hash -> pairs sharing >= 2
    tiles) == brute-force per-image tile-hash set intersection on
    identical inputs, and the planted one-block edits are found (the
    untouched quadrants' tile hashes stay bit-identical)."""
    import itertools

    from ycrawl_spark import textops
    from ycrawl_spark.config import CrawlConfig

    cfg = CrawlConfig(n_urls=120, n_hosts=4)
    imgs = synth.near_dup_images_df(spark, cfg, dup_every=4)
    tiles = multimodal.image_tile_phash(imgs, grid=2)
    t = tiles.select("tile_phash", "image_id").distinct()
    pairs = textops.bucket_pairs(t, ["tile_phash"], id_col="image_id",
                                 cap=1024)
    got = {
        (r["image_id_a"], r["image_id_b"], r["n"])
        for r in pairs.groupBy("image_id_a", "image_id_b")
        .agg(F.count("*").alias("n")).filter(F.col("n") >= 2).collect()
    }

    rows = [synth.make_near_dup_image_row(i, 4) for i in range(cfg.n_urls)]
    tile_sets = {}
    for row in rows:
        px = codecs.decode(bytes(row["bytes"]))
        h, w, _ = px.shape
        th, tw = max(h // 2, 1), max(w // 2, 1)
        hs = set()
        for ty in range(2):
            for tx in range(2):
                hs.add(int(codecs.phash64(
                    px[ty * th:(ty + 1) * th, tx * tw:(tx + 1) * tw])))
        tile_sets[row["image_id"]] = hs
    expect = set()
    for a, b in itertools.combinations(sorted(tile_sets), 2):
        n = len(tile_sets[a] & tile_sets[b])
        if n >= 2:
            expect.add((a, b, n))
    assert got == expect

    planted = {
        tuple(sorted((r["dup_of"], r["image_id"]))) for r in rows if r["dup_of"]
    }
    found = {(a, b) for a, b, _ in got}
    assert len(planted) >= 25
    assert len(planted & found) >= 0.8 * len(planted)


def test_image_border_crop_exact(spark):
    """Distributed border detection == the planted pad thickness for
    every image (exact crop box, exact permille), across all codecs
    including lossy (constant border quantizes to a constant)."""
    from ycrawl_spark.config import CrawlConfig

    cfg = CrawlConfig(n_urls=150, n_hosts=4)
    imgs = synth.bordered_images_df(spark, cfg)
    got = {
        r["image_id"]: (r["y0"], r["y1"], r["x0"], r["x1"],
                        r["border_permille"])
        for r in multimodal.image_border_crop(imgs).collect()
    }
    fmts = set()
    n_with_border = 0
    for i in range(cfg.n_urls):
        row = synth.make_bordered_image_row(i)
        ty, tx, w, h = row["pad_top"], row["pad_left"], row["w"], row["h"]
        fmts.add(row["fmt"])
        n_with_border += int(ty > 0 or tx > 0)
        content = (h - 2 * ty) * (w - 2 * tx)
        expect = (ty, h - ty, tx, w - tx,
                  (1000 * (w * h - content)) // (w * h))
        assert got[row["image_id"]] == expect, row["image_id"]
    assert len(got) == cfg.n_urls
    assert fmts == {"raw", "ppm", "lossy"}  # every codec branch exercised
    assert n_with_border >= 100  # borders actually planted


def test_image_gray_histogram_matches_numpy(spark):
    """Every (image, bin, n_px) row equals the numpy bincount of the
    decoded pixels, and per-image bin counts sum to w·h."""
    imgs = _images_df(spark, n=12)
    hist = multimodal.image_gray_histogram(imgs, bins=16).collect()
    got = {}
    for r in hist:
        got.setdefault(r["image_id"], {})[r["bin"]] = r["n_px"]
    rows = {r["image_id"]: r for r in imgs.collect()}
    for iid, row in rows.items():
        px = codecs.decode(bytes(row["bytes"])).astype(np.float64)
        gray = np.clip(px.mean(axis=2), 0, 255).astype(np.int64)
        counts = np.bincount(np.minimum(gray // 16, 15).ravel(), minlength=16)
        expect = {int(i): int(counts[i]) for i in np.nonzero(counts)[0]}
        assert got.get(iid) == expect, iid
        assert sum(expect.values()) == row["w"] * row["h"]


def test_image_exposure_audit_flags_flat_images(spark):
    """A planted single-intensity image must be counted near-flat in
    its dominant bin's rollup row."""
    import pandas as pd

    flat = codecs.encode(np.full((8, 8, 3), 200, dtype=np.uint8), "ppm")
    imgs = _images_df(spark, n=6).unionByName(spark.createDataFrame(
        pd.DataFrame([{
            "image_id": "flat0", "bytes": bytearray(flat), "w": 8, "h": 8,
            "fmt": "ppm", "caption": "flat", "phash": 0,
        }]), schema=_images_df(spark, n=1).schema))
    hist = multimodal.image_gray_histogram(imgs)
    per_img = hist.groupBy("image_id").agg(
        F.max("n_px").alias("max_px"), F.sum("n_px").alias("total_px"))
    r = per_img.filter(F.col("image_id") == "flat0").first()
    assert r["max_px"] == r["total_px"] == 64


def test_image_sharpness_matches_numpy(spark):
    """Every (lap_var, gray_std) equals the numpy reference on the
    decoded pixels — the Laplacian kernel, interior crop, and
    population-variance convention are pinned exactly."""
    imgs = _images_df(spark, n=12)
    got = {r["image_id"]: (r["w"], r["h"], r["lap_var"], r["gray_std"])
           for r in multimodal.image_sharpness(imgs).collect()}
    for row in imgs.collect():
        px = codecs.decode(bytes(row["bytes"]))
        g = px.astype(np.float64).mean(axis=2)
        lap = (4.0 * g[1:-1, 1:-1] - g[:-2, 1:-1] - g[2:, 1:-1]
               - g[1:-1, :-2] - g[1:-1, 2:])
        expect = (row["w"], row["h"], round(float(lap.var()), 4),
                  round(float(g.std()), 4))
        assert got[row["image_id"]] == expect, row["image_id"]
    assert len(got) == 12


def test_image_blur_audit_separates_planted(spark):
    """The lap_var<5000 gate recovers exactly the planted 3×3-blurred
    rows — zero false positives, zero false negatives, across every
    codec branch (lossy quantization must not close the measured
    sharp≥31k / blurred≤0.8k gap)."""
    from ycrawl_spark.config import CrawlConfig

    cfg = CrawlConfig(n_urls=90, n_hosts=4)
    imgs = synth.blurred_images_df(spark, cfg)
    sharp = multimodal.image_sharpness(imgs)
    j = imgs.select("image_id", "fmt", "is_blurred").join(
        sharp.select("image_id", "lap_var"), "image_id").collect()
    assert len(j) == 90
    assert {r["fmt"] for r in j} == {"raw", "ppm", "lossy"}
    n_blur = 0
    for r in j:
        if r["is_blurred"]:
            n_blur += 1
            assert r["lap_var"] < 5000.0, (r["image_id"], r["lap_var"])
        else:
            assert r["lap_var"] >= 5000.0, (r["image_id"], r["lap_var"])
    assert n_blur == 30


def test_format_sniff_audit_recovers_planted_labels(spark):
    """The sniff gate's three invariants, checked against the fixture's
    own parameterization: bytes-derived fmt equals the true codec for
    every row (magic + code byte), the mismatch flag reproduces the
    planted ~1/4 mislabel rule exactly, and both header-dim parses
    (little-endian uint32 for raw/lossy, 13-byte ASCII for PPM) recover
    the generation dims bit-exact."""
    import hashlib

    from ycrawl_spark.queries import QUERIES
    from ycrawl_spark.synth import _gradient_params

    rows = QUERIES["format_sniff_audit"](spark, "unused").collect()
    assert len(rows) == 96
    n_mismatch = 0
    for r in rows:
        o = [ord(ch) for ch in hashlib.md5(r.image_id.encode()).hexdigest()]
        true_fmt = codecs.FORMATS[o[6] % 3]
        assert r.sniffed == true_fmt
        assert r.is_mismatch == int(o[8] % 4 == 0)
        n_mismatch += r.is_mismatch
        w, h, *_ = _gradient_params(r.image_id)
        assert (r.hdr_w, r.hdr_h) == (w, h)
        if true_fmt == "ppm":
            expected = 9 + len(str(w)) + len(str(h)) + 3 * w * h
        else:
            expected = 13 + 3 * w * h
        assert r.n_bytes == expected
    assert 0 < n_mismatch < 96  # both branches populated


def test_image_chroma_stats_gray_is_zero_and_color_is_not(spark):
    """Negative control the oracle can't provide: on the GRAY ramp
    fixture (equal channels) every opponent-axis moment must be
    exactly zero, while the chroma fixture's md5 offsets make at
    least one axis non-zero for every image whose offsets differ."""
    import hashlib

    from ycrawl_spark import multimodal, synth

    gray = multimodal.image_chroma_stats(
        synth.gradient_images_df(spark, 12)).collect()
    assert len(gray) == 12
    for r in gray:
        assert (r.sum_abs_rg, r.sum_sq_rg, r.sum_abs_yb2, r.sum_sq_yb2) \
            == (0, 0, 0, 0), r.image_id

    color = multimodal.image_chroma_stats(
        synth.chroma_gradient_images_df(spark, 12)).collect()
    assert len(color) == 12
    for r in color:
        o = [ord(ch) for ch in hashlib.md5(r.image_id.encode()).hexdigest()]
        dr, dg, db = o[7] % 97, o[8] % 97, o[9] % 97
        if dr == dg == db:
            assert r.sum_abs_rg == 0 and r.sum_abs_yb2 == 0
        else:
            assert r.sum_abs_rg > 0 or r.sum_abs_yb2 > 0, r.image_id
        # moments are internally consistent: Cauchy-Schwarz lower bound
        assert r.sum_sq_rg * r.n_px >= r.sum_abs_rg ** 2 // r.n_px
