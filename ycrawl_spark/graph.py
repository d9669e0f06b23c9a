"""Distributed connected components — the tail of the dedup pipeline.

Near-dup detection (simhash/minhash/ngram pair joins in textops.py,
phash in multimodal.py) emits *pairs*; deduplication needs *clusters*
(keep one representative per component, drop the rest). Pairs are not
transitively closed — A~B and B~C without A~C is the normal case — so
the cluster step is a connected-components computation over the pair
graph.

Algorithm: alternating large-star / small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) — converges in
O(log^2 n) rounds on any graph, each round a pair of groupBy shuffles,
no driver-side graph state. This is the published web-scale CC recipe
(the pair graph of a 10^10-document corpus does not fit on a driver;
label propagation alone needs O(diameter) rounds, which a long chain
makes linear).

Reference parity: the reference's dedup is the coordinator seen-set
(/root/reference/Coordinator/main.py:23,68) — exact-key only; component
clustering is the scale path its near-dup family needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def _canon(edges: DataFrame) -> DataFrame:
    """Canonical undirected edge set: (min, max), distinct, no loops."""
    return (
        edges.select(
            F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _sym(edges: DataFrame) -> DataFrame:
    return edges.union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))


def _large_star(edges: DataFrame) -> DataFrame:
    """For each node u: connect every strictly-larger neighbor to the
    minimum of u's closed neighborhood. One groupBy + one broadcast-free
    equi-join on u; emitted edges stay (big, small)."""
    sym = _sym(edges)
    m = sym.groupBy("src").agg(
        F.least(F.min("dst"), F.col("src")).alias("m")
    )
    return (
        sym.join(m, "src")
        .filter(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """For each node u over its smaller-or-equal neighbors S: connect
    S ∪ {u} to min(S). Edges arrive oriented (big → small) from
    large-star, so grouping by src sees exactly S."""
    oriented = edges.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    )
    m = oriented.groupBy("src").agg(F.min("dst").alias("m"))
    joined = oriented.join(m, "src")
    to_m = joined.select(F.col("dst").alias("src"), F.col("m").alias("dst"))
    self_edge = m.select(F.col("src"), F.col("m").alias("dst"))
    return (
        to_m.union(self_edge)
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _signature(edges: DataFrame) -> tuple[int, int]:
    """Cheap convergence check: (count, sum of per-edge hashes) — one
    map-side-combined aggregate, no driver edge list."""
    row = edges.agg(
        F.count("*").alias("n"),
        # decimal(38,0) sum: immune to ANSI long-overflow on big edge sets
        F.coalesce(
            F.sum(F.xxhash64("src", "dst").cast("decimal(38,0)")), F.lit(0)
        ).cast("string").alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def connected_components(edges: DataFrame, max_iter: int = 30) -> DataFrame:
    """(node, component) for every node appearing in ``edges``;
    ``component`` is the minimum node id of the node's component —
    a canonical labeling independent of edge order.

    Driver holds only the per-round signature (two longs); per round
    the data pays two groupBy shuffles + two equi-joins, lineage cut by
    ``localCheckpoint`` so plans stay bounded across rounds (same
    pattern as the crawl epoch loop, pipeline.py). ``max_iter`` is a
    backstop — the alternation provably converges in O(log^2 n)."""
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    cur = _canon(edges).localCheckpoint(eager=True)
    sig = _signature(cur)
    converged = sig[0] == 0
    for _ in range(max_iter):
        nxt = _small_star(_large_star(cur)).localCheckpoint(eager=True)
        nsig = _signature(nxt)
        cur = nxt
        if nsig == sig:
            converged = True
            break
        sig = nsig
    if not converged:
        # Never return silently-wrong labels: an unconverged labeling
        # under-merges clusters with no other signal. 30 alternations
        # cover any diameter below ~2^30; hitting this means the input
        # is degenerate or max_iter was lowered.
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
        )
    # Converged: every edge is (node, component-min). Roots map to
    # themselves; the groupBy-min is belt-and-braces canonicalization.
    labels = (
        cur.select(F.col("src").alias("node"), F.col("dst").alias("component"))
        .union(cur.select(F.col("dst").alias("node"), F.col("dst").alias("component")))
        .groupBy("node")
        .agg(F.min("component").alias("component"))
    )
    # Nodes that only ever appeared in self-loops vanish from the
    # canonical edge set but did appear in the input: singletons.
    return nodes.join(labels, "node", "left").select(
        "node", F.coalesce("component", "node").alias("component")
    )


def label_agreement_report(lab: DataFrame, key: str, other: str,
                           kind: str) -> DataFrame:
    """Linear cross-labeling disagreement report (round-3 VERDICT #2):
    given one row per node carrying two cluster labelings
    ``(node, key, other)``, flag every ``key``-cluster whose members
    straddle >1 ``other``-cluster — WITHOUT materializing co-cluster
    pairs (a 10^5-member template-farm component would emit 10^10
    pairs; this emits one row).

    The pair count survives as an exact aggregate: within a cluster of
    n members split into partner-label groups of sizes m_g, the number
    of member pairs whose partner labels DISAGREE is
    C(n,2) − Σ_g C(m_g,2) — two integer groupBys, zero joins, zero
    explodes. Output: (kind, component, n_members, n_partner_labels,
    n_mismatch_pairs), one row per disagreeing cluster."""
    g = lab.groupBy(
        F.col(key).alias("component"), F.col(other).alias("partner")
    ).agg(F.count("*").alias("m"))
    rep = g.groupBy("component").agg(
        F.sum("m").alias("n_members"),
        F.count("*").alias("n_partner_labels"),
        F.sum(F.expr("m * (m - 1) div 2")).alias("_same"),
    )
    return rep.filter(F.col("n_partner_labels") > 1).selectExpr(
        f"'{kind}' AS kind",
        "component",
        "n_members",
        "n_partner_labels",
        "n_members * (n_members - 1) div 2 - _same AS n_mismatch_pairs",
    )


def dedup_keep_representatives(df: DataFrame, components: DataFrame,
                               id_col: str = "doc_id") -> DataFrame:
    """Apply a component labeling as a dedup: keep the representative
    (the component-min) of every cluster plus every unpaired document.
    Broadcast-free left_anti on the non-representative set — the
    components frame is pair-graph-sized, not corpus-sized."""
    drop = components.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return df.join(drop, id_col, "left_anti")
