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


def _brute_agreement(rows, key_idx, other_idx, kind):
    """All-pairs reference for label_agreement_report: enumerate every
    within-cluster pair and count the partner-label disagreements."""
    from collections import defaultdict

    clusters = defaultdict(list)
    for r in rows:
        clusters[r[key_idx]].append(r[other_idx])
    out = {}
    for comp, partners in clusters.items():
        n = len(partners)
        labels = len(set(partners))
        mism = sum(
            1
            for i in range(n)
            for j in range(i + 1, n)
            if partners[i] != partners[j]
        )
        if labels > 1:
            out[(kind, comp)] = (n, labels, mism)
    return out


def test_label_agreement_matches_bruteforce(spark):
    rng = random.Random(7)
    rows = [
        (i, rng.randrange(12), rng.randrange(9)) for i in range(300)
    ]
    lab = spark.createDataFrame(rows, "node long, img_c long, txt_c long")
    got = {
        (r["kind"], r["component"]): (
            r["n_members"], r["n_partner_labels"], r["n_mismatch_pairs"])
        for r in graph.label_agreement_report(
            lab, "img_c", "txt_c", "k").collect()
    }
    assert got == _brute_agreement(rows, 1, 2, "k")
    # swapped orientation too
    got_t = {
        (r["kind"], r["component"]): (
            r["n_members"], r["n_partner_labels"], r["n_mismatch_pairs"])
        for r in graph.label_agreement_report(
            lab, "txt_c", "img_c", "t").collect()
    }
    assert got_t == _brute_agreement(rows, 2, 1, "t")


def test_label_agreement_plan_is_linear(spark):
    # The round-3 verdict's quadratic residue: co-cluster comparison
    # must never materialize within-component pairs. The report is two
    # hash aggregates over the label frame — pin that its plan has no
    # join, no explode/posexplode, no collect_set expansion.
    lab = spark.createDataFrame(
        [(i, i % 3, i % 2) for i in range(10)],
        "node long, img_c long, txt_c long")
    plan = graph.label_agreement_report(
        lab, "img_c", "txt_c", "k")._jdf.queryExecution().optimizedPlan().toString()
    low = plan.lower()
    for bad in ("join", "explode", "collect_set", "cartesian"):
        assert bad not in low, f"quadratic-shaped node {bad!r} in plan:\n{plan}"


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
