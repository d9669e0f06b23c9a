"""Connected-components correctness: the distributed large-star /
small-star alternation (graph.py) must produce the same min-label
partition as a pure-Python union-find on the identical edge list —
including the adversarial shapes (long chains, merged stars) where a
naive bounded label propagation falls short.
"""

from __future__ import annotations

import random

from ycrawl_spark import graph


def _union_find(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    roots: dict[int, list[int]] = {}
    for n in parent:
        roots.setdefault(find(n), []).append(n)
    return {n: min(members) for members in roots.values() for n in members}


def _spark_cc(spark, edges: list[tuple[int, int]]) -> dict[int, int]:
    df = spark.createDataFrame(edges, "src long, dst long")
    out = graph.connected_components(df).collect()
    return {r["node"]: r["component"] for r in out}


def test_cc_chain(spark):
    # worst case for propagation-style algorithms: one long path
    edges = [(i, i + 1) for i in range(60)]
    assert _spark_cc(spark, edges) == _union_find(edges)


def test_cc_two_stars_bridged(spark):
    edges = [(0, i) for i in range(1, 10)] + [(100, 100 + i) for i in range(1, 10)]
    assert _spark_cc(spark, edges) == _union_find(edges)
    bridged = edges + [(9, 109)]
    got = _spark_cc(spark, bridged)
    assert got == _union_find(bridged)
    assert len(set(got.values())) == 1


def test_cc_self_loops_and_duplicates(spark):
    edges = [(1, 1), (2, 3), (3, 2), (2, 3), (4, 4)]
    got = _spark_cc(spark, edges)
    # pure self-loop nodes carry no connectivity information; the
    # operator keeps them as singleton components
    assert got == {1: 1, 2: 2, 3: 2, 4: 4}


def test_cc_random_graphs_match_union_find(spark):
    rng = random.Random(42)
    for trial in range(3):
        n = 120
        edges = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(int(n * (0.6 + 0.4 * trial)))
        ]
        edges = [(a, b) for a, b in edges if a != b]
        assert _spark_cc(spark, edges) == _union_find(edges), f"trial {trial}"


def test_cc_empty(spark):
    df = spark.createDataFrame([], "src long, dst long")
    assert graph.connected_components(df).count() == 0


def test_dedup_keep_representatives(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(8)], "doc_id long, text string"
    )
    comp = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (5, 5), (6, 5)], "node long, component long"
    )
    kept = sorted(
        r["doc_id"]
        for r in graph.dedup_keep_representatives(docs, comp).collect()
    )
    # reps 1 and 5 stay; cluster members 2,3,6 drop; unpaired 0,4,7 stay
    assert kept == [0, 1, 4, 5, 7]
