"""Recall and bucket-cap gates for the text-dedup prefilters.

The round-1 simhash prefilter (fixed 4×16-bit blocks) guaranteed
recall only for hamming ≤ 3 while the registered query asked for 16 —
silently missed pairs. These tests plant sketch pairs at known hamming
distances with the dirty bits SPREAD adversarially (one per 16-bit
quarter, the exact pattern the old scheme lost) and pin the pigeonhole
guarantee of the threshold-derived block layout. Plus: property tests
for the hot-bucket df-cap (drop over-cap buckets, observable mass,
no-op below cap).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ycrawl_spark import textops


def _flip(v: int, bits: list[int]) -> int:
    for b in bits:
        v ^= 1 << b
    return v


def _to_i64(v: int) -> int:
    v &= (1 << 64) - 1
    return v - (1 << 64) if v >= (1 << 63) else v


BASE = 0x5A5A_C3C3_0F0F_9696


def _sketch_df(spark, values: dict[int, int]):
    rows = [(doc_id, _to_i64(v)) for doc_id, v in values.items()]
    return spark.createDataFrame(rows, "doc_id long, simhash long")


def test_simhash_blocks_cover_64_bits():
    for h in (1, 3, 8, 16, 31, 63):
        layout = textops._simhash_block_layout(h, None)
        assert len(layout) == min(h + 1, 64)
        assert sum(w for _, w in layout) == 64
        offs = [o for o, _ in layout]
        assert offs == sorted(offs) and offs[0] == 0


@pytest.mark.parametrize("hamming_bits", [
    [0, 16, 32, 48],                  # h=4, one dirty bit per old quarter
    [1, 9, 17, 25, 33, 41, 49, 57],   # h=8, two per old quarter
    list(range(0, 64, 4)),            # h=16, four per old quarter
])
def test_planted_pairs_within_threshold_are_found(spark, hamming_bits):
    """Every planted pair within max_hamming must be returned even when
    the dirty bits touch all four 16-bit quarters (the round-1 scheme
    returned NONE of these)."""
    h = len(hamming_bits)
    values = {0: BASE, 1: _flip(BASE, hamming_bits)}
    # distractors far away (> threshold): flip 40 bits
    values[2] = _flip(BASE, list(range(3, 43)))
    out = textops.simhash_near_dups_from_sketch(
        _sketch_df(spark, values), max_hamming=16
    ).collect()
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in out}
    assert (0, 1) in pairs, f"pair at hamming {h} missed by prefilter"
    assert pairs[(0, 1)] == h
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_planted_pairs_beyond_threshold_are_filtered(spark):
    values = {0: BASE, 1: _flip(BASE, list(range(0, 34, 2)))}  # h=17
    out = textops.simhash_near_dups_from_sketch(
        _sketch_df(spark, values), max_hamming=16
    ).collect()
    assert out == []


def test_round1_fixed_blocks_would_miss(spark):
    """Regression pin: with the OLD fixed 4-block layout (n_blocks=4)
    a spread pair at hamming 4 is missed — proving the planted test
    actually bites on the round-1 construction."""
    values = {0: BASE, 1: _flip(BASE, [0, 16, 32, 48])}
    out = textops.simhash_near_dups_from_sketch(
        _sketch_df(spark, values), max_hamming=16, n_blocks=4
    ).collect()
    assert out == []  # the old scheme's recall hole


def _skewed_docs(spark, n_hot: int = 30, n_cold: int = 6):
    """n_hot docs share one 4-token phrase verbatim (a stop-phrase
    bucket); n_cold docs are pairwise-unrelated."""
    rows = [(i, f"the quick brown fox unique{i} tail{i}") for i in range(n_hot)]
    rows += [(1000 + i, f"alpha{i} beta{i} gamma{i} delta{i} eps{i}")
             for i in range(n_cold)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bucket_cap_drops_hot_bucket_and_reports_mass(spark):
    docs = _skewed_docs(spark)
    out = textops.ngram_shared_pairs(docs, k=4, min_common=1, bucket_cap=10).collect()
    # the 30-doc stop-phrase bucket (435 pairs) must be gone entirely
    assert out == []
    # drop mass is reportable, not silent
    sh = (
        textops.with_tokens(docs)
        .select("doc_id", F.explode(
            F.array_distinct(textops.shingles_col("tokens", 4))).alias("sh"))
    )
    m = textops.cap_drop_stats(sh, ["sh"], 10).collect()[0]
    assert m["dropped_rows"] >= 30       # ≥ the hot bucket's members
    assert m["n_hot_buckets"] >= 1
    assert m["total_rows"] > m["dropped_rows"]


def test_bucket_cap_noop_below_cap(spark):
    docs = _skewed_docs(spark)
    capped = textops.ngram_shared_pairs(docs, k=4, min_common=1, bucket_cap=1000)
    uncapped = textops.ngram_shared_pairs(docs, k=4, min_common=1, bucket_cap=None)
    assert sorted(map(tuple, capped.collect())) == sorted(map(tuple, uncapped.collect()))


def test_minhash_band_cap_noop_below_cap(spark):
    docs = _skewed_docs(spark)
    capped = textops.minhash_lsh_candidates(docs, bucket_cap=1000)
    uncapped = textops.minhash_lsh_candidates(docs, bucket_cap=None)
    assert sorted(map(tuple, capped.collect())) == sorted(map(tuple, uncapped.collect()))


def test_minhash_band_cap_kills_degenerate_band(spark):
    """30 identical docs collide in every band; cap=10 must drop those
    buckets (and with them all 435 identical-pair candidates)."""
    rows = [(i, "same old boilerplate text everywhere") for i in range(30)]
    rows += [(100, "one fresh document entirely"), (101, "another fresh doc here")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = textops.minhash_lsh_candidates(docs, bucket_cap=10).collect()
    assert all(r["doc_a"] >= 100 for r in out)


def test_containment_dedup_plants(spark):
    """Planted containment cases: a verbatim-embedded doc is caught at
    pct 100 with the right orientation; a partial overlap lands at its
    exact integer pct; equal-size twins orient contained = larger
    doc_id; sub-min_shingles docs and disjoint docs never appear."""
    big = " ".join(f"w{i}" for i in range(20))            # 17 shingles
    sub = " ".join(f"w{i}" for i in range(6, 14))         # 5 shingles, all in big
    other = " ".join(f"x{i}" for i in range(10))          # disjoint
    partial = " ".join(f"w{i}" for i in range(5)) + " q1 q2 q3 q4 q5"
    tiny = "w0 w1 w2 w3 w4"                               # 2 shingles < min
    twin = "t0 t1 t2 t3 t4 t5"                            # 3 shingles
    docs = spark.createDataFrame(
        [(1, big), (2, sub), (3, other), (4, partial), (7, tiny),
         (5, twin), (6, twin)],
        "doc_id long, text string",
    )
    out = {(r["contained_id"], r["container_id"]):
           (r["n_common"], r["n_contained"], r["containment_pct"])
           for r in textops.containment_dedup(
               docs, k=4, min_pct=25, min_shingles=3).collect()}
    assert out[(2, 1)] == (5, 5, 100)        # verbatim embed
    assert out[(6, 5)] == (3, 3, 100)        # identical twins, id tiebreak
    # partial: 10 tokens -> 7 shingles, 2 shared with big -> 200 // 7 = 28
    assert out[(4, 1)] == (2, 7, 28)
    flat = {i for pair in out for i in pair}
    assert 3 not in flat and 7 not in flat
    assert set(out) == {(2, 1), (6, 5), (4, 1)}


def test_cdc_chunks_partition_and_resync(spark):
    """(1) Chunks exactly partition each document's UTF-8 bytes;
    (2) every non-final chunk ends on a gear-hash boundary or at
    max_len, never before min_len; (3) the CDC property: prepending a
    prefix to a document leaves every chunk after resync identical
    (same hashes), so a near-copy shares almost all chunks."""
    import hashlib

    base = " ".join(f"tok{i % 37}x{i % 11}" for i in range(120))
    docs = spark.createDataFrame(
        [(1, base), (2, "INSERTED HEADER " + base)],
        "doc_id long, text string")
    rows = textops.cdc_chunks(docs, min_len=16, mask_bits=5,
                              max_len=128).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    gear = textops._gear_table()
    for doc_id, text in [(1, base), (2, "INSERTED HEADER " + base)]:
        data = text.encode()
        chunks = sorted(by_doc[doc_id], key=lambda r: r["chunk_idx"])
        # exact partition
        pos = 0
        for c in chunks:
            assert c["start"] == pos
            seg = data[pos:pos + c["length"]]
            assert hashlib.md5(seg).hexdigest() == c["chunk_hash"]
            pos += c["length"]
        assert pos == len(data)
        # boundary rule on every non-final chunk
        for c in chunks[:-1]:
            assert 16 <= c["length"] <= 128
            if c["length"] < 128:
                h = 0
                for byte in data[c["start"]:c["start"] + c["length"]]:
                    h = ((h << 1) + gear[byte]) & ((1 << 64) - 1)
                assert h & 31 == 0
    # resync: the two docs share a long common suffix of chunks
    h1 = [c["chunk_hash"] for c in sorted(by_doc[1], key=lambda r: r["chunk_idx"])]
    h2 = [c["chunk_hash"] for c in sorted(by_doc[2], key=lambda r: r["chunk_idx"])]
    shared = 0
    while (shared < min(len(h1), len(h2))
           and h1[-1 - shared] == h2[-1 - shared]):
        shared += 1
    assert shared >= len(h1) - 3  # all but the first few chunks survive


def test_semantic_dedup_hot_cell_cap_skips_pairing_keeps_rows(spark, tmp_path):
    """The SemDeDup cell cap (queries.semantic_dedup_cells): a planted
    cell over the 4096-member cap is excluded from PAIRING only — all
    its vectors stay in the output with kept=1 — while an in-cap exact
    duplicate still drops, proving the cap skipped one cell's pairing,
    not the gate. Construction is deterministic against the query's
    own md5-min-32 centroid sampling: the test replicates the md5
    ordering (hashlib hex == Spark md5(CAST(id AS STRING))), assigns
    the 32 sampled ids SPREAD vectors (one-hot-ish, mutually far), and
    then routes (a) one extra vector X = an exact copy of centroid c0
    → c0's 2-member in-cap cell, the planted drop, and (b) 4207
    constant-0.5 clones → centroid c1 (deliberately the constant-0.45
    vector, by far the nearest to the clones) → ONE 4208-member
    over-cap cell. Without the cap that cell alone would emit ~8.8M
    exact-dup pairs and drop 4206 rows; with it, zero pairs and zero
    drops. All ids ≥ 30 so the query plants no perturbed copies."""
    import hashlib

    import pandas as pd
    from pyspark.sql import functions as F  # noqa: F401

    from ycrawl_spark.queries import QUERIES

    ids = list(range(30, 30 + 4240))
    order = sorted(ids, key=lambda i: hashlib.md5(str(i).encode()).hexdigest())
    cents, extra = order[:32], order[32]
    c0, c1 = cents[0], cents[1]

    def vec(i):
        if i == c1:
            return [0.45] * 16            # nearest centroid to the clones
        if i in cents:
            k = cents.index(i)            # spread one-hot-ish centroids
            base = 0.0 if k < 16 else 0.05
            return [1.0 if d == k % 16 else base for d in range(16)]
        if i == extra:
            return vec(c0)                # exact dup of centroid c0
        return [0.5] * 16                 # clone horde

    pdf = pd.DataFrame({
        "vec_id": ids,
        "embedding": [vec(i) for i in ids],
        "label": [0] * len(ids),
    })
    sf_dir = str(tmp_path / "sf")
    spark.createDataFrame(pdf).selectExpr(
        "CAST(vec_id AS BIGINT) AS vec_id",
        "CAST(embedding AS ARRAY<FLOAT>) AS embedding",
        "CAST(label AS INT) AS label",
    ).coalesce(2).write.parquet(f"{sf_dir}/embeddings.parquet")

    rows = QUERIES["semantic_dedup_cells"](spark, sf_dir).collect()
    by_vec = {r["vec_id"]: r for r in rows}
    assert len(rows) == len(ids)          # every vector present exactly once

    clones = [i for i in ids if i not in cents and i != extra]
    assert len(clones) == 4207            # over the 4096 cap
    clone_cells = {by_vec[i]["cell_id"] for i in clones}
    assert clone_cells == {c1}            # one over-cap cell, as planted
    # cap behavior: pairing skipped, every member kept (incl. c1 itself)
    assert all(by_vec[i]["kept"] == 1 for i in clones)
    assert by_vec[c1]["kept"] == 1
    # the gate still fires in the in-cap 2-member cell {c0, extra}:
    # cos = 1, the larger vec_id drops, the smaller survives
    assert by_vec[extra]["cell_id"] == c0
    dropped = sorted(r["vec_id"] for r in rows if r["kept"] == 0)
    assert dropped == [max(c0, extra)]
    assert by_vec[min(c0, extra)]["kept"] == 1
