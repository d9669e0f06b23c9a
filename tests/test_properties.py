"""Hypothesis property tests for the exactness-critical operators:
instead of fixed fixtures, fuzz the input shapes (ragged docs, random
graphs, arbitrary hamming patterns) and pin the invariant. Each example
pays a Spark job, so examples are few but adversarially generated;
deadline is disabled (JVM jobs are not wall-clock-stable).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from ycrawl_spark import graph, textops

SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    lens=st.lists(st.integers(min_value=1, max_value=40), min_size=1, max_size=60),
    ctx=st.integers(min_value=2, max_value=64),
)
@settings(**SETTINGS)
def test_pack_offsets_property(spark, lens, ctx):
    rows = [(i, " ".join(["w"] * n)) for i, n in enumerate(lens)]
    df = spark.createDataFrame(rows, "doc_id long, text string").repartition(7)
    got = {
        r["doc_id"]: (r["start_tok"], r["n_tokens"], r["n_chunks"])
        for r in textops.pack_concat_chunks(df, ctx=ctx).collect()
    }
    off = 0
    for i, n in enumerate(lens):
        first, last = off // ctx, (off + n - 1) // ctx
        assert got[i] == (off, n, last - first + 1)
        off += n


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)), min_size=0, max_size=60
    )
)
@settings(**SETTINGS)
def test_connected_components_property(spark, edges):
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent[find(a)] = find(b)
    comps: dict[int, list[int]] = {}
    for n in parent:
        comps.setdefault(find(n), []).append(n)
    expect = {n: min(ms) for ms in comps.values() for n in ms}

    df = spark.createDataFrame(edges, "src long, dst long") if edges else (
        spark.createDataFrame([], "src long, dst long")
    )
    got = {r["node"]: r["component"]
           for r in graph.connected_components(df).collect()}
    assert got == expect


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from("abcdefgh"), min_size=0, max_size=12
        ).map(lambda cs: " ".join(cs)),
        min_size=1,
        max_size=12,
    ),
    k=st.integers(min_value=2, max_value=5),
)
@settings(**SETTINGS)
def test_shingle_pairs_property(spark, docs, k):
    """ngram_shared_pairs == brute-force shared-shingle count for any
    corpus, including docs shorter than k (which contribute nothing)."""
    rows = [(i, t) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"]): r["n_common"]
        for r in textops.ngram_shared_pairs(df, k=k, min_common=1).collect()
    }

    def shingles(text):
        toks = text.split(" ")
        return {" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)} \
            if len(toks) >= k else set()

    expect = {}
    for i, a in rows:
        for j, b in rows:
            if i < j:
                common = len(shingles(a) & shingles(b))
                if common >= 1:
                    expect[(i, j)] = common
    assert got == expect


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 25), st.integers(0, 6)),  # (doc_id, bucket)
        min_size=0, max_size=60,
    ),
    cap=st.integers(min_value=1, max_value=8),
)
@settings(**SETTINGS)
def test_bucket_pairs_property(spark, rows, cap):
    """bucket_pairs == the brute-force capped bucket self-join for ANY
    (id, bucket) multiset: same ordered pair MULTISET — a pair sharing
    k buckets appears k times, exactly like the self-join it replaced
    (ngram_shared_pairs counts that multiplicity as n_common; LSH
    callers collapse it with distinct()); cap drops whole buckets by
    ROW count BEFORE collection (the memory guard — distinct members
    are always <= rows, so surviving buckets collect <= cap items)."""
    df = spark.createDataFrame(
        [(d, b) for d, b in rows], "doc_id long, bucket long"
    ).repartition(5)
    got = sorted(
        (r["doc_id_a"], r["doc_id_b"])
        for r in textops.bucket_pairs(df, ["bucket"], cap=cap).collect()
    )
    members: dict[int, set[int]] = {}
    n_rows: dict[int, int] = {}
    for d, b in rows:
        members.setdefault(b, set()).add(d)
        n_rows[b] = n_rows.get(b, 0) + 1
    expect = sorted(
        (a, b)
        for bkt, ids in members.items()
        if len(ids) >= 2 and n_rows[bkt] <= cap
        for a in ids for b in ids if a < b
    )
    assert got == expect  # multiset equality: sorted lists, dupes count


def test_closed_form_ntile_matches_sql_semantics():
    """The branch formula ngram_novelty_decile uses instead of a global
    ntile window must reproduce SQL NTILE(10) for every corpus size:
    the first (n mod 10) buckets get ceil(n/10) rows, the rest floor.
    Pure arithmetic — no Spark session."""
    def closed_form(r: int, n: int, k: int = 10) -> int:
        q, rem = n // k, n % k
        if r <= rem * (q + 1):
            return (r + q) // (q + 1)
        return rem + (r - rem * (q + 1) + max(q, 1) - 1) // max(q, 1)

    for n in range(1, 301):
        q, rem = n // 10, n % 10
        sizes = [(q + 1 if b < rem else q) for b in range(10)]
        expect = [b + 1 for b, s in enumerate(sizes) for _ in range(s)]
        got = [closed_form(r, n) for r in range(1, n + 1)]
        assert got == expect, n
