"""ANN quality gates: the approximate paths (LSH, IVF) are rows-only in
the driver's oracle gate (approximation is not SQL-expressible), so
their quality is pinned here — recall vs the exact brute-force top-k on
the driver testdata, plus structural invariants of the dup-pair op.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ycrawl_spark import vectors

SF_DIR = "/root/testdata/sf0.001"
QUERY_IDS = list(range(0, 40))
K = 5


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()
    df.count()
    return df


def _topk_sets(df):
    rows = df.collect()
    out: dict[int, set] = {}
    for r in rows:
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def _recall(approx: dict[int, set], exact: dict[int, set]) -> float:
    hits = sum(len(approx.get(q, set()) & nbrs) for q, nbrs in exact.items())
    total = sum(len(nbrs) for nbrs in exact.values())
    return hits / total


def test_lsh_recall_vs_exact(spark, emb):
    exact = _topk_sets(vectors.cosine_topk(emb, QUERY_IDS, k=K))
    approx = _topk_sets(vectors.ann_lsh_topk(emb, QUERY_IDS, k=K, n_planes=6))
    # 16 OR-amplified tables of 6 hyperplanes (64 buckets each): on this
    # corpus that scans ~25% of candidates and must keep at least half
    # of the true neighbors; below 0.5 the bucketer is broken, not lossy
    assert _recall(approx, exact) >= 0.5


def test_lsh_candidate_reduction(spark, emb):
    """The LSH path must actually prune: candidates scored per query
    stay well under the full corpus even with OR-amplification."""
    n = emb.count()
    one = vectors.ann_lsh_topk(emb, [QUERY_IDS[0]], k=n, n_planes=6)
    assert one.count() < n * 0.6


def test_ivf_recall_vs_exact(spark, emb):
    exact = _topk_sets(vectors.cosine_topk(emb, QUERY_IDS, k=K))
    approx = _topk_sets(
        vectors.ivf_ann_topk(emb, QUERY_IDS, k=K, n_cells=8, n_probe=4)
    )
    assert _recall(approx, exact) >= 0.5


def test_ivf_lloyd_refinement_improves_recall_per_candidate(spark, emb):
    """Lloyd iterations must pay for themselves: at the same probe
    budget, refined centroids give equal-or-better recall while
    scanning no more candidates (deterministic on the seeded data:
    recall 0.45 → 0.525 and 140 → 112 scanned at n_probe=2)."""
    exact = _topk_sets(vectors.cosine_topk(emb, QUERY_IDS, k=K))

    def run(iters):
        approx = _topk_sets(vectors.ivf_ann_topk(
            emb, QUERY_IDS, k=K, n_cells=8, n_probe=2, lloyd_iters=iters))
        scanned = vectors.ivf_ann_topk(
            emb, [QUERY_IDS[0]], k=10**6, n_cells=8, n_probe=2,
            lloyd_iters=iters).count()
        return _recall(approx, exact), scanned

    r0, s0 = run(0)
    r2, s2 = run(2)
    assert r2 >= r0
    assert s2 <= s0


def test_ivf_probes_fraction_of_data(spark, emb):
    """The IVF plan's value is candidate reduction: with n_probe=1 of 8
    cells, each query must score far fewer candidates than brute force."""
    n = emb.count()
    one = vectors.ivf_ann_topk(emb, [QUERY_IDS[0]], k=n, n_cells=8, n_probe=1)
    scanned = one.count()  # k=n keeps every scored candidate
    assert scanned < n * 0.6


def test_exact_topk_is_self_consistent(spark, emb):
    """rank is dense 1..k per query and cos_sim non-increasing."""
    df = vectors.cosine_topk(emb, QUERY_IDS[:10], k=K)
    pdf = df.toPandas().sort_values(["query_id", "rank"])
    for _, g in pdf.groupby("query_id"):
        assert list(g["rank"]) == list(range(1, len(g) + 1))
        sims = list(g["cos_sim"])
        assert all(a >= b - 1e-9 for a, b in zip(sims, sims[1:]))


def test_dup_pairs_ordered_and_thresholded(spark, emb):
    df = vectors.cosine_dup_pairs(emb.limit(300), threshold=0.8)
    pdf = df.toPandas()
    assert (pdf["doc_a"] < pdf["doc_b"]).all()
    assert (pdf["cos_sim"] >= 0.8 - 1e-9).all()


def test_dup_pairs_lsh_recall_and_precision(spark, emb):
    """LSH-prefiltered dup pairs: every reported pair is a TRUE pair
    (exact scoring on candidates — perfect precision), and recall vs
    the exact all-pairs result stays above the sign-LSH collision bound
    for this similarity band."""
    t = 0.4
    exact = {(r["doc_a"], r["doc_b"])
             for r in vectors.cosine_dup_pairs(emb, threshold=t).collect()}
    approx = {(r["doc_a"], r["doc_b"])
              for r in vectors.cosine_dup_pairs_lsh(emb, threshold=t).collect()}
    assert exact, "fixture must contain pairs at this threshold"
    assert approx <= exact          # precision 1.0 by construction
    assert len(approx & exact) / len(exact) >= 0.4


def test_pq_recall_vs_exact(spark, emb):
    """ADC over 8 sub-codes + exact re-rank: recall@5 well above the
    LSH gate — quantization loss is bounded, and more re-rank budget
    must buy more recall (measured 0.815 → 0.965 on this corpus)."""
    exact = _topk_sets(vectors.cosine_topk(emb, QUERY_IDS, k=K))
    r2 = _recall(_topk_sets(
        vectors.pq_ann_topk(emb, QUERY_IDS, k=K, rerank_factor=2)), exact)
    r4 = _recall(_topk_sets(
        vectors.pq_ann_topk(emb, QUERY_IDS, k=K, rerank_factor=4)), exact)
    assert r2 >= 0.6
    assert r4 >= 0.85
    assert r4 >= r2


def test_pq_codes_are_byte_compressible(spark, emb):
    """Encoded corpus: exactly m_sub codes per vector, every code <
    256 — the scan side reads M bytes/row instead of 4·D (32× at
    D=64, M=8)."""
    books = vectors.pq_train_codebooks(emb, m_sub=8, k_codes=256)
    assert books.shape[0] == 8 and books.shape[1] <= 256
    codes = emb.select(
        vectors.pq_encode_udf(books)(F.col("embedding")).alias("codes")
    )
    stats = codes.selectExpr(
        "min(size(codes)) AS lo", "max(size(codes)) AS hi",
        "max(array_max(codes)) AS cmax", "min(array_min(codes)) AS cmin",
    ).first()
    assert stats["lo"] == stats["hi"] == 8
    assert 0 <= stats["cmin"] and stats["cmax"] < 256


def test_pq_deterministic(spark, emb):
    a = sorted(map(tuple, vectors.pq_ann_topk(emb, [0, 1], k=3).collect()))
    b = sorted(map(tuple, vectors.pq_ann_topk(emb, [0, 1], k=3).collect()))
    assert a == b
