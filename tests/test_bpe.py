"""Learned-BPE equivalence: the distributed trainer (pair counts over
the word-frequency table, JVM-fold merge application) must match a
pure-Python BPE — same merge list (same deterministic tie-break) and
same per-doc subword counts."""

from __future__ import annotations

from collections import Counter

import pytest

from ycrawl_spark import textops

CORPUS = [
    (0, "lower lowest low low lower"),
    (1, "newer newest new new newer newer"),
    (2, "wider wide widest wider"),
    (3, "low new wide lowest newest"),
    (4, "abab abab baba"),
]


def _py_word_counts(rows):
    wc: Counter = Counter()
    for _, text in rows:
        for w in text.split(" "):
            if w:
                wc[w] += 1
    return wc


def _py_apply_merge(syms, a, b):
    out = []
    for x in syms:
        if out and out[-1] == a and x == b:
            out[-1] = a + b
        else:
            out.append(x)
    return out


def py_bpe_train(rows, n_merges):
    wc = _py_word_counts(rows)
    syms = {w: list(w) for w in wc}
    merges = []
    for _ in range(n_merges):
        pc: Counter = Counter()
        for w, c in wc.items():
            s = syms[w]
            for x, y in zip(s, s[1:]):
                pc[(x, y)] += c
        if not pc:
            break
        # tie-break parity with the Spark trainer: count desc, then the
        # space-joined pair string asc
        (a, b), n = sorted(pc.items(), key=lambda kv: (-kv[1], f"{kv[0][0]} {kv[0][1]}"))[0]
        if n < 2:
            break
        merges.append((a, b))
        for w in syms:
            syms[w] = _py_apply_merge(syms[w], a, b)
    return merges, syms


def py_doc_counts(rows, syms):
    out = {}
    for doc_id, text in rows:
        words = [w for w in text.split(" ") if w]
        out[doc_id] = (sum(len(syms[w]) for w in words), len(words))
    return out


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


def test_merge_list_matches_pure_python(spark, docs):
    got = textops.bpe_train(docs, n_merges=8)
    want, _ = py_bpe_train(CORPUS, 8)
    assert got == want
    assert len(got) >= 4  # training actually learned something


def test_doc_token_counts_match_pure_python(spark, docs):
    merges = textops.bpe_train(docs, n_merges=8)
    _, syms = py_bpe_train(CORPUS, 8)
    got = {
        r["doc_id"]: (r["n_bpe_tokens"], r["n_ws_tokens"])
        for r in textops.bpe_real_token_stats(docs, merges).collect()
    }
    assert got == py_doc_counts(CORPUS, syms)


def test_merges_compress(spark, docs):
    """Applying merges strictly reduces total subword count vs chars."""
    merges = textops.bpe_train(docs, n_merges=8)
    stats = textops.bpe_real_token_stats(docs, merges).collect()
    total_sub = sum(r["n_bpe_tokens"] for r in stats)
    total_chars = sum(
        len(w) for _, t in CORPUS for w in t.split(" ") if w
    )
    assert 0 < total_sub < total_chars


def test_repeated_pair_greedy_semantics(spark):
    """'aaaa' under merge (a,a) must become [aa, aa] (greedy left-to-
    right, no overlap) — the classic BPE edge case."""
    df = spark.createDataFrame([(0, "aaaa aaa")], "doc_id long, text string")
    out = textops.bpe_word_tokens(df, [("a", "a")]).collect()
    got = {r["word"]: list(r["syms"]) for r in out}
    assert got["aaaa"] == ["aa", "aa"]
    assert got["aaa"] == ["aa", "a"]
