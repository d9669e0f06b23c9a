"""Short-document edge cases for the n-gram operator family: Spark's
sequence(a, b) DESCENDS when a > b instead of producing an empty array,
so unguarded shingle/bigram/gram builders abort the whole job (slice
start 0 / index out of bounds under ANSI mode) the moment a corpus
contains a doc shorter than the window. These tests pin the guarded
behavior: short docs contribute nothing, everything else is unchanged.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ycrawl_spark import textops


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "solo"),
            (2, "two toks"),
            (3, "a b c"),
            (4, "one two three four five six seven"),
            (5, "one two three four five six seven"),
        ],
        "doc_id long, text string",
    )


def test_shingles_empty_below_k(spark):
    t = textops.with_tokens(_docs(spark)).select(
        "doc_id", F.size(textops.shingles_col("tokens", 4)).alias("n")
    )
    got = {r["doc_id"]: r["n"] for r in t.collect()}
    assert got == {1: 0, 2: 0, 3: 0, 4: 4, 5: 4}


def test_ngram_shared_pairs_survives_short_docs(spark):
    pairs = textops.ngram_shared_pairs(_docs(spark), k=4, min_common=1).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in pairs} == {(4, 5)}


def test_repetition_stats_drops_single_token_docs(spark):
    got = {r["doc_id"]: r["n_bigrams"]
           for r in textops.repetition_stats(_docs(spark)).collect()}
    assert 1 not in got                      # no bigrams → drops out
    assert got[2] == 1 and got[3] == 2 and got[4] == 6


def test_contamination_overlap_survives_short_docs(spark):
    docs = _docs(spark)
    bench = docs.filter(F.col("doc_id") == 5)
    got = textops.contamination_overlap(docs, bench, n=4).collect()
    assert {(r["doc_id"], r["bench_id"]) for r in got} == {(4, 5)}


def test_minhash_excludes_short_docs(spark):
    # docs with no shingles are excluded outright — an all-null
    # signature would spuriously bucket every short doc together
    sigs = textops.minhash_signatures(_docs(spark), n_perm=4, k=4).collect()
    assert sorted(r["doc_id"] for r in sigs) == [4, 5]
    assert all(v is not None for r in sigs for v in r["sig"])
